"""Golden tests ported from the reference's ExpressionFilterTest.java
(processing/src/test/java/org/apache/druid/segment/filter/, 9 @Test
methods) over its own 10-row fixture (ExpressionFilterTest.java:78-90:
string dim0/dim3, LONG dim1, FLOAT dim2, multi-value dim4; rows 6-8
omit dim4, row 8 ingests 8L into dim3, row 9 ingests 1.234d into both
dim3 and dim4).

7/9 ported (the sqlCompatible / non-strict-boolean branches — the
suite runs under ExpressionProcessing.initializeForStrictBooleansTests
(false), matching this engine's truthiness casts). Skip bucket (2):
testGetRequiredColumn and testRequiredColumnRewrite pin planner
metadata objects; testEqualsContract folded into the same bucket (JVM
equals) — all three carry no row-matching semantics.

Pinned coercions: string-vs-number comparisons go numeric ('' and 'a'
never match); scalar expressions over a multi-value column map per
element with ANY-element truthiness; a scalar string column feeds
array functions as a one-element array; missing columns read as null
under SQL three-valued logic.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import types as T

from apache_druid_spark.plans.compiler import compile_query

TS = datetime(2000, 1, 1)

ROWS = [
    (TS, "0", 0, 0.0, "", ["1", "2"]),
    (TS, "1", 1, 1.0, "10", []),
    (TS, "2", 2, 2.0, "2", [""]),
    (TS, "3", 3, 3.0, "1", ["3"]),
    (TS, "4", 4, 4.0, "1", ["4", "5"]),
    (TS, "5", 5, 5.0, "5", ["4", "5"]),
    (TS, "6", 6, 6.0, "1", None),
    (TS, "7", 7, 7.0, "a", None),
    (TS, "8", 8, 8.0, "8", None),
    (TS, "9", 9, 9.0, "1.234", ["1.234"]),
]

SCHEMA = T.StructType([
    T.StructField("__time", T.TimestampType()),
    T.StructField("dim0", T.StringType()),
    T.StructField("dim1", T.LongType()),
    T.StructField("dim2", T.FloatType()),
    T.StructField("dim3", T.StringType()),
    T.StructField("dim4", T.ArrayType(T.StringType())),
])

ALL10 = [str(i) for i in range(10)]


@pytest.fixture(scope="session")
def exprtest(spark):
    from apache_druid_spark.model.datasource import DatasourceRegistry

    reg = DatasourceRegistry(spark)
    reg.register("exprtest", spark.createDataFrame(ROWS, SCHEMA).cache())
    return reg


def e_matches(reg, expression) -> list[str]:
    q = {"queryType": "scan", "dataSource": "exprtest",
         "intervals": ["1970-01-01/2021-01-01"],
         "columns": ["dim0"],
         "filter": {"type": "expression", "expression": expression}}
    return sorted(r["dim0"] for r in compile_query(q, reg).collect())


def test_one_single_valued_string_column(spark, exprtest):
    # testOneSingleValuedStringColumn (sqlCompatible)
    assert e_matches(exprtest, "dim3 == ''") == ["0"]
    assert e_matches(exprtest, "dim3 == '1'") == ["3", "4", "6"]
    assert e_matches(exprtest, "dim3 == 'a'") == ["7"]
    assert e_matches(exprtest, "dim3 == 1") == ["3", "4", "6"]
    assert e_matches(exprtest, "dim3 == 1.0") == ["3", "4", "6"]
    assert e_matches(exprtest, "dim3 == 1.234") == ["9"]
    assert e_matches(exprtest, "dim3 < '2'") == ["0", "1", "3", "4", "6", "9"]
    assert e_matches(exprtest, "dim3 < 2") == ["3", "4", "6", "9"]
    assert e_matches(exprtest, "dim3 < 2.0") == ["3", "4", "6", "9"]
    assert e_matches(exprtest, "like(dim3, '1%')") == \
        ["1", "3", "4", "6", "9"]
    assert e_matches(exprtest, "array_contains(dim3, '1')") == \
        ["3", "4", "6"]


def test_one_multi_valued_string_column(spark, exprtest):
    # testOneMultiValuedStringColumn (sqlCompatible)
    assert e_matches(exprtest, "dim4 == ''") == ["2"]
    assert e_matches(exprtest, "dim4 == null") == []
    assert e_matches(exprtest, "dim4 == '1'") == ["0"]
    assert e_matches(exprtest, "dim4 == '3'") == ["3"]
    assert e_matches(exprtest, "dim4 == '4'") == ["4", "5"]
    assert e_matches(exprtest, "concat(dim4, dim4) == '33'") == ["3"]
    assert e_matches(exprtest, "like(dim4, '4%')") == ["4", "5"]
    assert e_matches(exprtest, "array_contains(dim4, '5')") == ["4", "5"]
    assert e_matches(exprtest, "array_to_string(dim4, ':') == '4:5'") == \
        ["4", "5"]


def test_single_and_multi_valued_string_column(spark, exprtest):
    # testSingleAndMultiValuedStringColumn
    assert e_matches(exprtest, "array_contains(dim4, dim3)") == ["5", "9"]


def test_one_long_column(spark, exprtest):
    # testOneLongColumn (sqlCompatible)
    assert e_matches(exprtest, "dim1 == ''") == []
    assert e_matches(exprtest, "dim1 == '1'") == ["1"]
    assert e_matches(exprtest, "dim1 == 2") == ["2"]
    assert e_matches(exprtest, "dim1 < '2'") == ["0", "1"]
    assert e_matches(exprtest, "dim1 < 2") == ["0", "1"]
    assert e_matches(exprtest, "dim1 < 2.0") == ["0", "1"]
    assert e_matches(exprtest, "like(dim1, '1%')") == ["1"]


def test_one_float_column(spark, exprtest):
    # testOneFloatColumn (sqlCompatible)
    assert e_matches(exprtest, "dim2 == ''") == []
    assert e_matches(exprtest, "dim2 == '1'") == ["1"]
    assert e_matches(exprtest, "dim2 == 2") == ["2"]
    assert e_matches(exprtest, "dim2 < '2'") == ["0", "1"]
    assert e_matches(exprtest, "dim2 < 2") == ["0", "1"]
    assert e_matches(exprtest, "dim2 < 2.0") == ["0", "1"]
    assert e_matches(exprtest, "like(dim2, '1%')") == ["1"]


def test_constant_expression(spark, exprtest):
    # testConstantExpression
    assert e_matches(exprtest, "1 + 1") == ALL10
    assert e_matches(exprtest, "'true'") == ALL10
    assert e_matches(exprtest, "0 + 0") == []
    assert e_matches(exprtest, "'false'") == []


def test_compare_columns(spark, exprtest):
    # testCompareColumns (sqlCompatible)
    assert e_matches(exprtest, "dim0 == dim3") == ["2", "5", "8"]
    assert e_matches(exprtest, "dim1 == dim3") == ["2", "5", "8"]
    assert e_matches(exprtest, "dim2 == dim3") == ["2", "5", "8"]
    assert e_matches(exprtest, "dim0 == dim4") == ["3", "4", "5"]


def test_missing_column(spark, exprtest):
    # testMissingColumn (sqlCompatible: a missing column is null, and
    # null == null is not true)
    assert e_matches(exprtest, "missing == null") == []
    assert e_matches(exprtest, "missing == otherMissing") == []
    assert e_matches(exprtest, "missing == '1'") == []
    assert e_matches(exprtest, "missing == 2") == []
    assert e_matches(exprtest, "missing < '2'") == []
    assert e_matches(exprtest, "missing < 2") == []
    assert e_matches(exprtest, "missing < 2.0") == []
    assert e_matches(exprtest, "missing > '2'") == []
    assert e_matches(exprtest, "missing > 2") == []
    assert e_matches(exprtest, "missing > 2.0") == []
    assert e_matches(exprtest, "like(missing, '1%')") == []
