"""Golden tests ported from the reference's AndFilterTest.java (3
methods), OrFilterTest.java (12), NotFilterEvaluateTest.java (1), and
InvalidFilteringTest.java (1)
(processing/src/test/java/org/apache/druid/segment/filter/).

Accounting — And 2/3 (test_equals skipped), Or 11/12 (testEquals
skipped), NotFilterEvaluate 1/1, InvalidFiltering 1/1. Also accounted
here: DimensionPredicateFilterTest (2 methods), TrueFilterTest (1),
FalseFilterTest (1), NotFilterTest (1) and FiltersTest /
FilterCnfConversionTest — ALL of those are JVM Object.equals contracts
or CNF-planner internals with no row-matching semantics (this engine
hands boolean factoring to Catalyst); the true/false row semantics are
already pinned by the suite ports using them inside and/or trees.

InvalidFilteringTest filters on a COMPLEX (sketch-state) column, which
reads as NULL for every row (overrideIndexBuilderSchema builds a
hyperUnique metric 'hyperion'; InvalidFilteringTest.java:108-132).
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import types as T

from apache_druid_spark.plans.compiler import compile_query

TS = datetime(2000, 1, 1)
ALL6 = ["0", "1", "2", "3", "4", "5"]


@pytest.fixture(scope="session")
def andor(spark):
    from apache_druid_spark.model.datasource import DatasourceRegistry

    rows = [(TS, str(i), "0") for i in range(6)]
    schema = T.StructType([
        T.StructField("__time", T.TimestampType()),
        T.StructField("dim0", T.StringType()),
        T.StructField("dim1", T.StringType()),
    ])
    reg = DatasourceRegistry(spark)
    reg.register("andor", spark.createDataFrame(rows, schema).cache())

    inv_rows = [(TS, str(i + 1), bytes([i])) for i in range(6)]
    inv_schema = T.StructType([
        T.StructField("__time", T.TimestampType()),
        T.StructField("dim0", T.StringType()),
        T.StructField("hyperion", T.BinaryType()),
    ])
    reg.register("invalidtest",
                 spark.createDataFrame(inv_rows, inv_schema).cache())
    return reg


def matches(reg, flt, ds="andor") -> list[str]:
    q = {"queryType": "scan", "dataSource": ds,
         "intervals": ["1970-01-01/2021-01-01"],
         "columns": ["dim0"], "filter": flt}
    return sorted(r["dim0"] for r in compile_query(q, reg).collect())


def sel(dim, value):
    return {"type": "selector", "dimension": dim, "value": value}


def not_(f):
    return {"type": "not", "field": f}


def and_(*fs):
    return {"type": "and", "fields": list(fs)}


def or_(*fs):
    return {"type": "or", "fields": list(fs)}


def test_and(spark, andor):
    # AndFilterTest.testAnd
    assert matches(andor, and_(sel("dim0", "0"), sel("dim1", "0"))) == ["0"]
    assert matches(andor, and_(sel("dim0", "0"), sel("dim1", "1"))) == []
    assert matches(andor, and_(sel("dim0", "1"), sel("dim1", "0"))) == ["1"]
    assert matches(andor, and_(sel("dim0", "1"), sel("dim1", "1"))) == []
    assert matches(andor, and_(not_(sel("dim0", "1")),
                               not_(sel("dim1", "1")))) == \
        ["0", "2", "3", "4", "5"]
    assert matches(andor, and_(not_(sel("dim0", "0")),
                               not_(sel("dim1", "0")))) == []


def test_not_and(spark, andor):
    # AndFilterTest.testNotAnd
    assert matches(andor, not_(and_(sel("dim0", "0"), sel("dim1", "0")))) == \
        ["1", "2", "3", "4", "5"]
    assert matches(andor, not_(and_(sel("dim0", "0"), sel("dim1", "1")))) == ALL6
    assert matches(andor, not_(and_(sel("dim0", "1"), sel("dim1", "0")))) == \
        ["0", "2", "3", "4", "5"]
    assert matches(andor, not_(and_(sel("dim0", "1"), sel("dim1", "1")))) == ALL6
    assert matches(andor, not_(and_(not_(sel("dim0", "1")),
                                    not_(sel("dim1", "1"))))) == ["1"]
    assert matches(andor, not_(and_(not_(sel("dim0", "0")),
                                    not_(sel("dim1", "0"))))) == ALL6


def test_or_single_filters(spark, andor):
    # OrFilterTest testOneFilterMatchSome / testOneFilterMatchAll /
    # testOneFilterMatchNone
    assert matches(andor, or_(sel("dim0", "1"))) == ["1"]
    assert matches(andor, or_(sel("dim1", "0"))) == ALL6
    assert matches(andor, or_(sel("dim1", "7"))) == []


def test_or_two_filters(spark, andor):
    # OrFilterTest, all eight two-filter combinations in reference
    # order: testTwoFilterFirstMatchesAllSecondMatchesNone,
    # testTwoFilterFirstMatchesNoneSecondMatchesAll,
    # testTwoFilterFirstMatchesNoneSecondLiterallyTrue,
    # testTwoFilterFirstMatchesAllSecondMatchesAll,
    # testTwoFilterFirstLiterallyTrueSecondMatchesAll,
    # testTwoFilterFirstMatchesSomeSecondMatchesNone,
    # testTwoFilterFirstMatchesNoneSecondMatchesSome,
    # testTwoFilterFirstMatchesNoneSecondMatchesNone
    assert matches(andor, or_(sel("dim1", "0"), sel("dim0", "7"))) == ALL6
    assert matches(andor, or_(sel("dim0", "7"), sel("dim1", "0"))) == ALL6
    assert matches(andor, or_(sel("dim0", "7"), {"type": "true"})) == ALL6
    assert matches(andor, or_(sel("dim1", "0"),
                              not_(sel("dim0", "7")))) == ALL6
    assert matches(andor, or_({"type": "true"},
                              not_(sel("dim0", "7")))) == ALL6
    assert matches(andor, or_(sel("dim0", "3"), sel("dim1", "7"))) == ["3"]
    assert matches(andor, or_(sel("dim1", "7"), sel("dim0", "3"))) == ["3"]
    assert matches(andor, or_(sel("dim1", "7"), sel("dim0", "7"))) == []


def test_or_three_filters_with_literal_true(spark, andor):
    # testThreeFilterFirstMatchesSomeSecondLiterallyTrueThirdMatchesNone
    assert matches(andor, and_(
        {"type": "in", "dimension": "dim0",
         "values": ["0", "1", "2", "4", "5"]},
        or_(sel("dim0", "4"), {"type": "true"}, sel("dim0", "7")),
    )) == ["0", "1", "2", "4", "5"]


def test_not_selector(spark, andor):
    # NotFilterEvaluateTest.testNotSelector (native NOT is two-valued:
    # NOT(selector) matches every row the selector does not)
    assert matches(andor, not_(sel("dim0", None))) == ALL6
    assert matches(andor, not_(sel("dim0", ""))) == ALL6
    assert matches(andor, not_(sel("dim0", "0"))) == ["1", "2", "3", "4", "5"]
    assert matches(andor, not_(sel("dim0", "1"))) == ["0", "2", "3", "4", "5"]


def test_filter_the_unfilterable(spark, andor):
    # InvalidFilteringTest.testFilterTheUnfilterable: a COMPLEX column
    # reads NULL as a filter input
    all6 = ["1", "2", "3", "4", "5", "6"]
    assert matches(andor, sel("hyperion", "a string"), ds="invalidtest") == []
    assert matches(andor, sel("hyperion", None), ds="invalidtest") == all6
    assert matches(andor, {"type": "in", "dimension": "hyperion",
                           "values": ["hello", "world"]},
                   ds="invalidtest") == []
    assert matches(andor, {"type": "in", "dimension": "hyperion",
                           "values": ["hello", "world", None]},
                   ds="invalidtest") == all6
