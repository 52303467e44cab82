"""Golden tests ported from the reference's FilterPartitionTest.java
(processing/src/test/java/org/apache/druid/segment/filter/, 9 @Test
methods) over DEFAULT_ROWS + four extra rows
(FilterPartitionTest.java:159-165).

8/9 ported. The reference splits every filter into a bitmap PRE-filter
and a value-matcher POST-filter (its NoBitmapSelectorDimFilter forces
the post path); in this engine both roles are served by one Catalyst
predicate, so the pre/post variants carry identical value contracts —
each is asserted through the same public path. The toCnf() class/size
assertions and testAnalyze pin the reference's CNF planner internals
(Catalyst owns boolean factoring here); only their row expectations are
ported. Skip bucket (1): testAnalyze (pre/post split introspection
only). JS 'super-' fn == stringFormat('super-%s') as in the sibling
ports (sqlCompatible branches).
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import types as T

from apache_druid_spark.plans.compiler import compile_query
from filtertest_fixture import ROWS as DEFAULT_ROWS, SCHEMA

TS = datetime(2000, 1, 1)

ROWS = DEFAULT_ROWS + [
    (TS, "6", "B453B411", ["c", "d", "e"], None, None, None, None),
    (TS, "7", "HELLO", ["foo"], None, None, None, None),
    (TS, "8", "abc", ["bar"], None, None, None, None),
    (TS, "9", "1", ["foo", "bar"], None, None, None, None),
]

ALL10 = [str(i) for i in range(10)]
SUPER_FN = {"type": "stringFormat", "format": "super-%s"}


@pytest.fixture(scope="session")
def parttest(spark):
    from apache_druid_spark.model.datasource import DatasourceRegistry

    reg = DatasourceRegistry(spark)
    reg.register("parttest", spark.createDataFrame(ROWS, SCHEMA).cache())
    return reg


def p_matches(reg, flt) -> list[str]:
    q = {"queryType": "scan", "dataSource": "parttest",
         "intervals": ["1970-01-01/2021-01-01"],
         "columns": ["dim0"], "filter": flt}
    return sorted(r["dim0"] for r in compile_query(q, reg).collect())


def sel(dim, value, efn=None):
    f = {"type": "selector", "dimension": dim, "value": value}
    if efn:
        f["extractionFn"] = efn
    return f


def jsel(dim, value):
    return sel(dim, value, SUPER_FN)


def or_(*fs):
    return {"type": "or", "fields": list(fs)}


def and_(*fs):
    return {"type": "and", "fields": list(fs)}


def test_single_pre_filter_with_nulls(spark, parttest):
    # testSinglePreFilterWithNulls (sqlCompatible)
    assert p_matches(parttest, sel("dim1", None)) == []
    assert p_matches(parttest, sel("dim1", "")) == ["0"]
    assert p_matches(parttest, sel("dim1", "10")) == ["1"]
    assert p_matches(parttest, sel("dim1", "2")) == ["2"]
    assert p_matches(parttest, sel("dim1", "1")) == ["3", "9"]
    assert p_matches(parttest, sel("dim1", "abdef")) == ["4"]
    assert p_matches(parttest, sel("dim1", "abc")) == ["5", "8"]
    assert p_matches(parttest, sel("dim1", "ab")) == []


def test_single_post_filter_with_nulls(spark, parttest):
    # testSinglePostFilterWithNulls (post == pre value contract here)
    assert p_matches(parttest, sel("dim1", None)) == []
    assert p_matches(parttest, sel("dim1", "")) == ["0"]
    assert p_matches(parttest, sel("dim1", "10")) == ["1"]
    assert p_matches(parttest, sel("dim1", "2")) == ["2"]
    assert p_matches(parttest, sel("dim1", "1")) == ["3", "9"]
    assert p_matches(parttest, sel("dim1", "abdef")) == ["4"]
    assert p_matches(parttest, sel("dim1", "abc")) == ["5", "8"]
    assert p_matches(parttest, sel("dim1", "ab")) == []
    assert p_matches(parttest, jsel("dim1", "super-")) == ["0"]
    assert p_matches(parttest, jsel("dim1", "super-10")) == ["1"]
    assert p_matches(parttest, jsel("dim1", "super-2")) == ["2"]
    assert p_matches(parttest, jsel("dim1", "super-1")) == ["3", "9"]
    assert p_matches(parttest, jsel("dim1", "super-abdef")) == ["4"]
    assert p_matches(parttest, jsel("dim1", "super-abc")) == ["5", "8"]
    assert p_matches(parttest, jsel("dim1", "super-ab")) == []


def test_basic_pre_and_post_filter_with_nulls(spark, parttest):
    # testBasicPreAndPostFilterWithNulls (sqlCompatible)
    assert p_matches(parttest, and_(sel("dim2", "a"), sel("dim1", None))) == []
    assert p_matches(parttest, and_(sel("dim1", "10"), sel("dim2", None))) == \
        ["1"]
    assert p_matches(parttest, and_(sel("dim1", "1"), sel("dim2", "foo"))) == \
        ["9"]
    assert p_matches(parttest,
                     and_(sel("dim1", "HELLO"), sel("dim2", "bar"))) == []
    assert p_matches(parttest,
                     and_(sel("dim2", "bar"), sel("dim1", "NOT_A_VALUE"))) == []
    assert p_matches(parttest,
                     and_(jsel("dim2", "super-a"), jsel("dim1", "super-"))) == \
        ["0"]
    assert p_matches(parttest,
                     and_(jsel("dim2", "super-a"),
                          jsel("dim1", "super-null"))) == []
    assert p_matches(parttest,
                     and_(jsel("dim1", "super-2"), jsel("dim2", "super-"))) == \
        ["2"]
    assert p_matches(parttest,
                     and_(jsel("dim1", "super-2"),
                          jsel("dim2", "super-null"))) == []
    assert p_matches(parttest,
                     and_(jsel("dim1", "super-10"),
                          jsel("dim2", "super-null"))) == ["1"]
    assert p_matches(parttest,
                     and_(jsel("dim1", "super-1"),
                          jsel("dim2", "super-foo"))) == ["9"]
    assert p_matches(parttest,
                     and_(jsel("dim1", "super-HELLO"),
                          jsel("dim2", "super-bar"))) == []


def test_or_post_filter_with_nulls(spark, parttest):
    # testOrPostFilterWithNulls (sqlCompatible)
    assert p_matches(parttest, or_(sel("dim2", "a"), sel("dim1", None))) == \
        ["0", "3"]
    assert p_matches(parttest, or_(sel("dim1", "abc"), sel("dim2", None))) == \
        ["1", "5", "8"]
    assert p_matches(parttest, or_(sel("dim1", "2"), sel("dim2", None))) == \
        ["1", "2", "5"]
    assert p_matches(parttest,
                     or_(jsel("dim2", "super-a"),
                         jsel("dim1", "super-null"))) == ["0", "3"]
    assert p_matches(parttest,
                     or_(jsel("dim1", "super-abc"),
                         jsel("dim2", "super-null"))) == ["1", "5", "8"]
    assert p_matches(parttest,
                     or_(jsel("dim1", "super-abc"),
                         jsel("dim2", "super-"))) == ["2", "5", "8"]
    assert p_matches(parttest,
                     or_(jsel("dim1", "super-2"),
                         jsel("dim2", "super-null"))) == ["1", "2", "5"]
    assert p_matches(parttest,
                     or_(jsel("dim1", "INVALID_VALUE"),
                         jsel("dim2", "super-foo"))) == ["7", "9"]
    assert p_matches(parttest,
                     or_(jsel("dim1", "super-HELLO"),
                         jsel("dim2", "super-bar"))) == ["7", "8", "9"]
    assert p_matches(parttest,
                     or_(jsel("dim1", "super-HELLO"),
                         sel("dim2", "NOT_A_VALUE"))) == ["7"]
    assert p_matches(parttest,
                     or_(jsel("dim1", "INVALID"),
                         jsel("dim2", "NOT_A_VALUE"))) == []


def test_missing_column_specified_in_dimension_list(spark, parttest):
    # testMissingColumnSpecifiedInDimensionList (sqlCompatible)
    assert p_matches(parttest, sel("dim3", None)) == ALL10
    assert p_matches(parttest, sel("dim3", "")) == []
    assert p_matches(parttest, sel("dim3", "a")) == []
    assert p_matches(parttest, sel("dim3", "b")) == []
    assert p_matches(parttest, sel("dim3", "c")) == []
    assert p_matches(parttest,
                     or_(sel("dim1", "abc"), sel("dim3", "NOTHERE"))) == \
        ["5", "8"]
    assert p_matches(parttest,
                     or_(sel("dim1", "abc"), sel("dim3", None))) == ALL10
    assert p_matches(parttest, jsel("dim3", "super-null")) == ALL10
    assert p_matches(parttest, jsel("dim3", "a")) == []
    assert p_matches(parttest, jsel("dim3", "b")) == []
    assert p_matches(parttest, jsel("dim3", "c")) == []
    assert p_matches(parttest,
                     or_(jsel("dim1", "super-abc"),
                         jsel("dim3", "NOTHERE"))) == ["5", "8"]
    assert p_matches(parttest,
                     or_(jsel("dim1", "abc"),
                         jsel("dim3", "super-null"))) == ALL10


def test_missing_column_not_specified_in_dimension_list(spark, parttest):
    # testMissingColumnNotSpecifiedInDimensionList (sqlCompatible; the
    # timeDim/d0/f0/l0 columns exist in this engine's fixture schema,
    # so 'dim4' plays the truly-absent column)
    assert p_matches(parttest, sel("dim4", None)) == ALL10
    assert p_matches(parttest, sel("dim4", "")) == []
    assert p_matches(parttest, sel("dim4", "a")) == []
    assert p_matches(parttest, sel("dim4", "b")) == []
    assert p_matches(parttest, sel("dim4", "c")) == []
    assert p_matches(parttest,
                     or_(sel("dim1", "abc"), sel("dim4", None))) == ALL10
    assert p_matches(parttest,
                     or_(sel("dim4", None), sel("dim1", "abc"))) == ALL10
    assert p_matches(parttest, jsel("dim4", "super-null")) == ALL10
    assert p_matches(parttest, jsel("dim4", "a")) == []
    assert p_matches(parttest, jsel("dim4", "b")) == []
    assert p_matches(parttest, jsel("dim4", "c")) == []
    assert p_matches(parttest,
                     or_(jsel("dim1", "super-abc"),
                         jsel("dim4", "super-null"))) == ALL10
    assert p_matches(parttest,
                     or_(jsel("dim4", "super-null"),
                         jsel("dim1", "super-abc"))) == ALL10


def test_distribute_or_cnf(spark, parttest):
    # testDistributeOrCNF (row expectations; CNF-ing is Catalyst's job)
    f1 = or_(sel("dim0", "6"),
             and_(sel("dim1", "abdef"), sel("dim2", "c")))
    assert p_matches(parttest, f1) == ["4", "6"]
    f2 = or_(sel("dim0", "2"), sel("dim0", "3"),
             and_(sel("dim1", "HELLO"), sel("dim2", "foo")))
    assert p_matches(parttest, f2) == ["2", "3", "7"]
    f3 = or_(f1, f2, and_(sel("dim1", "1"), sel("dim2", "foo")))
    assert p_matches(parttest, f3) == ["2", "3", "4", "6", "7", "9"]


def test_distribute_or_cnf_extraction_fn(spark, parttest):
    # testDistributeOrCNFExtractionFn
    f1 = or_(jsel("dim0", "super-6"),
             and_(jsel("dim1", "super-abdef"), jsel("dim2", "super-c")))
    assert p_matches(parttest, f1) == ["4", "6"]
    f2 = or_(jsel("dim0", "super-2"), jsel("dim0", "super-3"),
             and_(jsel("dim1", "super-HELLO"), jsel("dim2", "super-foo")))
    assert p_matches(parttest, f2) == ["2", "3", "7"]
    f3 = or_(f1, f2, and_(jsel("dim1", "super-1"), jsel("dim2", "super-foo")))
    assert p_matches(parttest, f3) == ["2", "3", "4", "6", "7", "9"]
