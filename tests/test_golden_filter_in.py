"""Golden tests ported from the reference's InFilterTest.java
(processing/src/test/java/org/apache/druid/segment/filter/, 9 @Test
methods) over its own 6-row fixture (InFilterTest.java:73-80; rows keyed
dim0 'a'..'f', dim2 multi-value, row 'f' omits dim2 entirely).

6/9 methods ported (sqlCompatible branches). Skip bucket (3):
testRequiredColumnRewrite pins the filter-rewrite planner object,
test_equals / test_equals_forInFilterDruidPredicateFactory are JVM
Object.equals contracts.

JS-fn substitutions (javascript is policy-walled): 'super-' + str ==
stringFormat('super-%s'); the null?YES:NO fn == cascade(stringFormat
'%s' -> map lookup {'null': 'YES'} with replaceMissingValueWith 'NO')
— String.format renders a null input as 'null', exactly like the JS
concat renders it in the reference's superFn expectations.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import types as T

from apache_druid_spark.plans.compiler import compile_query

TS = datetime(2000, 1, 1)

ROWS = [
    (TS, "a", "", ["a", "b"]),
    (TS, "b", "10", []),
    (TS, "c", "2", [""]),
    (TS, "d", "1", ["a"]),
    (TS, "e", "def", ["c"]),
    (TS, "f", "abc", None),
]

SCHEMA = T.StructType([
    T.StructField("__time", T.TimestampType()),
    T.StructField("dim0", T.StringType()),
    T.StructField("dim1", T.StringType()),
    T.StructField("dim2", T.ArrayType(T.StringType())),
])

ALL6 = ["a", "b", "c", "d", "e", "f"]

SUPER_FN = {"type": "stringFormat", "format": "super-%s"}
YES_NULL_FN = {"type": "cascade", "extractionFns": [
    {"type": "stringFormat", "format": "%s"},
    {"type": "lookup", "lookup": {"type": "map", "map": {"null": "YES"}},
     "retainMissingValue": False, "replaceMissingValueWith": "NO"},
]}


@pytest.fixture(scope="session")
def intest(spark):
    from apache_druid_spark.model.datasource import DatasourceRegistry

    reg = DatasourceRegistry(spark)
    reg.register("intest", spark.createDataFrame(ROWS, SCHEMA).cache())
    return reg


def in_matches(reg, dim, values, efn=None) -> list[str]:
    flt = {"type": "in", "dimension": dim, "values": values}
    if efn is not None:
        flt["extractionFn"] = efn
    q = {"queryType": "scan", "dataSource": "intest",
         "intervals": ["1970-01-01/2021-01-01"],
         "columns": ["dim0"], "filter": flt}
    return sorted(r["dim0"] for r in compile_query(q, reg).collect())


def test_single_value_string_column_without_nulls(spark, intest):
    # testSingleValueStringColumnWithoutNulls
    assert in_matches(intest, "dim0", []) == []
    assert in_matches(intest, "dim0", [None]) == []
    assert in_matches(intest, "dim0", ["", ""]) == []
    assert in_matches(intest, "dim0", ["a", "c"]) == ["a", "c"]
    assert in_matches(intest, "dim0", ["e", "x"]) == ["e"]


def test_single_value_string_column_with_nulls(spark, intest):
    # testSingleValueStringColumnWithNulls (sqlCompatible)
    assert in_matches(intest, "dim1", [None, ""]) == ["a"]
    assert in_matches(intest, "dim1", [""]) == ["a"]
    assert in_matches(intest, "dim1", [None, "10", "abc"]) == ["b", "f"]
    assert in_matches(intest, "dim1", ["-1", "ab", "de"]) == []


def test_multi_value_string_column(spark, intest):
    # testMultiValueStringColumn (sqlCompatible: [] and a missing key
    # both ingest as null rows; [''] holds a real empty string)
    assert in_matches(intest, "dim2", [None]) == ["b", "f"]
    assert in_matches(intest, "dim2", [None, "a"]) == ["a", "b", "d", "f"]
    assert in_matches(intest, "dim2", [None, "b"]) == ["a", "b", "f"]
    assert in_matches(intest, "dim2", [""]) == ["c"]
    assert in_matches(intest, "dim2", ["", None]) == ["b", "c", "f"]
    assert in_matches(intest, "dim2", ["c"]) == ["e"]
    assert in_matches(intest, "dim2", ["d"]) == []


def test_missing_column(spark, intest):
    # testMissingColumn: dim3 behaves as all-null STRING
    assert in_matches(intest, "dim3", [None, None]) == ALL6
    assert in_matches(intest, "dim3", [""]) == []
    assert in_matches(intest, "dim3", [None, "a"]) == ALL6
    assert in_matches(intest, "dim3", ["a"]) == []
    assert in_matches(intest, "dim3", ["b"]) == []
    assert in_matches(intest, "dim3", ["c"]) == []


def test_match_with_extraction_fn(spark, intest):
    # testMatchWithExtractionFn (sqlCompatible branches)
    assert in_matches(intest, "dim2",
                      ["super-null", "super-a", "super-b"],
                      SUPER_FN) == ["a", "b", "d", "f"]
    assert in_matches(intest, "dim1",
                      ["super-null", "super-10", "super-def"],
                      SUPER_FN) == ["b", "e"]
    assert in_matches(intest, "dim2", ["YES"], YES_NULL_FN) == ["b", "f"]
    assert in_matches(intest, "dim1", ["NO"], YES_NULL_FN) == ALL6
    assert in_matches(intest, "dim3", ["NO"], YES_NULL_FN) == []
    assert in_matches(intest, "dim3", ["YES"], YES_NULL_FN) == ALL6


def test_match_with_lookup_extraction_fn(spark, intest):
    # testMatchWithLookupExtractionFn
    fn = {"type": "lookup",
          "lookup": {"type": "map", "map": {
              "a": "HELLO", "10": "HELLO", "def": "HELLO", "c": "BYE"}},
          "retainMissingValue": False, "replaceMissingValueWith": "UNKNOWN",
          "optimize": True}
    assert in_matches(intest, "dim0", [None, "HELLO"], fn) == ["a"]
    assert in_matches(intest, "dim0", ["HELLO", "BYE"], fn) == ["a", "c"]
    assert in_matches(intest, "dim0", ["UNKNOWN"], fn) == ["b", "d", "e", "f"]
    assert in_matches(intest, "dim1", ["HELLO"], fn) == ["b", "e"]
    assert in_matches(intest, "dim1", ["N/A"], fn) == []
    assert in_matches(intest, "dim2", ["a"], fn) == []
    assert in_matches(intest, "dim2", ["HELLO"], fn) == ["a", "d"]
    assert in_matches(intest, "dim2", ["HELLO", "BYE", "UNKNOWN"], fn) == ALL6

    fn2 = {"type": "lookup",
           "lookup": {"type": "map", "map": {"a": "e"}},
           "retainMissingValue": True, "injective": True, "optimize": True}
    assert in_matches(intest, "dim0", [None, "e"], fn2) == ["a", "e"]
    assert in_matches(intest, "dim0", ["a"], fn2) == []

    fn3 = {"type": "lookup",
           "lookup": {"type": "map", "map": {"c": "500", "100": "e"}},
           "retainMissingValue": False, "optimize": True}
    assert in_matches(intest, "dim0", [None, "c"], fn3) == \
        ["a", "b", "d", "e", "f"]
    assert in_matches(intest, "dim0", ["e"], fn3) == []
