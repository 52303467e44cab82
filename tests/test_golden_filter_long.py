"""Golden tests ported from the reference's LongFilteringTest.java
(processing/src/test/java/org/apache/druid/segment/filter/, 4 @Test
methods, all ported) over its own 10-row fixture with a LONG metric
column (LongFilteringTest.java:85-96; values 1..6, 1e8, 1e8+1, -25,
-1e8-1).

Pins Druid's value-to-long coercion (BigDecimal.longValueExact): '3.0'
matches 3, '3.00000000000000000000001' and '1.999999999999999999'
match nothing, overflow literals match nothing; bounds parse as
numbers with unparseable bounds falling back to string comparison; and
non-numeric selector values never match a long column.

testMultithreaded's value contracts are asserted once (Druid's
16-thread x 2000-task harness exercises ITS matcher's thread safety —
concurrency in this engine belongs to Spark's executor model). The JS
predicates are substituted with or-of-selectors / IN over the same
lookup, as in the sibling ports.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import types as T

from apache_druid_spark.plans.compiler import compile_query

MS = lambda n: datetime.utcfromtimestamp(n / 1000.0)  # noqa: E731

ROWS = [
    (MS(1), "1", 1, "", ["a", "b"]),
    (MS(2), "2", 2, "10", []),
    (MS(3), "3", 3, "2", [""]),
    (MS(4), "4", 4, "1", ["a"]),
    (MS(5), "5", 5, "def", ["c"]),
    (MS(6), "6", 6, "abc", None),
    (MS(7), "7", 100000000, "xyz", None),
    (MS(8), "8", 100000001, "xyz", None),
    (MS(9), "9", -25, "ghi", None),
    (MS(10), "10", -100000001, "qqq", None),
]

SCHEMA = T.StructType([
    T.StructField("__time", T.TimestampType()),
    T.StructField("dim0", T.StringType()),
    T.StructField("lng", T.LongType()),
    T.StructField("dim1", T.StringType()),
    T.StructField("dim2", T.ArrayType(T.StringType())),
])

WEEKDAY_FN = {"type": "lookup",
              "lookup": {"type": "map", "map": {
                  "1": "Monday", "2": "Tuesday", "3": "Wednesday",
                  "4": "Thursday", "5": "Friday", "6": "Saturday"}},
              "retainMissingValue": False,
              "replaceMissingValueWith": "UNKNOWN", "optimize": True}


@pytest.fixture(scope="session")
def longtest(spark):
    from apache_druid_spark.model.datasource import DatasourceRegistry

    reg = DatasourceRegistry(spark)
    reg.register("longtest", spark.createDataFrame(ROWS, SCHEMA).cache())
    return reg


def l_matches(reg, flt) -> list[str]:
    q = {"queryType": "scan", "dataSource": "longtest",
         "intervals": ["1969-01-01/2021-01-01"],
         "columns": ["dim0"], "filter": flt}
    return sorted((r["dim0"] for r in compile_query(q, reg).collect()),
                  key=int)


def sel(value, efn=None):
    f = {"type": "selector", "dimension": "lng", "value": value}
    if efn:
        f["extractionFn"] = efn
    return f


def bound(lower, upper, ls=False, us=False, ordering="numeric", efn=None):
    f = {"type": "bound", "dimension": "lng", "ordering": ordering,
         "lowerStrict": ls, "upperStrict": us}
    if lower is not None:
        f["lower"] = lower
    if upper is not None:
        f["upper"] = upper
    if efn:
        f["extractionFn"] = efn
    return f


def in_(values, efn=None):
    f = {"type": "in", "dimension": "lng", "values": values}
    if efn:
        f["extractionFn"] = efn
    return f


def test_long_column_filtering(spark, longtest):
    # testLongColumnFiltering
    assert l_matches(longtest, sel("0")) == []
    assert l_matches(longtest, sel("3")) == ["3"]
    assert l_matches(longtest, sel("3.0")) == ["3"]
    assert l_matches(longtest, sel("3.00000000000000000000001")) == []
    assert l_matches(longtest, sel("100000001.0")) == ["8"]
    assert l_matches(longtest, sel("-100000001.0")) == ["10"]
    assert l_matches(longtest,
                     sel("111119223372036854775807.674398674398")) == []

    assert l_matches(longtest, bound("2", "5")) == ["2", "3", "4", "5"]
    assert l_matches(longtest, bound("1", "4", True, True)) == ["2", "3"]
    assert l_matches(longtest, bound("2.0", "5.0")) == ["2", "3", "4", "5"]
    assert l_matches(longtest, bound("2.0", "5.0", True, True)) == ["3", "4"]
    assert l_matches(longtest, bound("1.9", "5.9", True, True)) == \
        ["2", "3", "4", "5"]
    assert l_matches(longtest, bound("2.1", "5.9")) == ["3", "4", "5"]
    assert l_matches(longtest,
                     bound("111119223372036854775807.67", "5.9")) == []
    assert l_matches(longtest,
                     bound("-111119223372036854775807.67", "5.9")) == \
        ["1", "2", "3", "4", "5", "9", "10"]
    assert l_matches(longtest,
                     bound("2.1", "111119223372036854775807.67")) == \
        ["3", "4", "5", "6", "7", "8"]
    assert l_matches(longtest,
                     bound("2.1", "-111119223372036854775807.67")) == []
    assert l_matches(longtest,
                     bound("100000000.0", "100000001.0", True, True)) == []
    assert l_matches(longtest,
                     bound("100000000.0", "100000001.0")) == ["7", "8"]

    assert l_matches(longtest, in_(["2", "4", "8"])) == ["2", "4"]
    assert l_matches(longtest, in_(["1.999999999999999999",
                                    "4.00000000000000000000001"])) == []
    assert l_matches(longtest, in_(["100000001.0",
                                    "99999999.999999999"])) == ["8"]
    assert l_matches(longtest, in_(["-25.0",
                                    "-99999999.999999999"])) == ["9"]
    assert l_matches(longtest, in_([str(i * 2) for i in range(32)])) == \
        ["2", "4", "6"]

    # JS x===3||x===5 as or-of-selectors
    assert l_matches(longtest, {"type": "or", "fields": [sel("3"), sel("5")]}) \
        == ["3", "5"]

    assert l_matches(longtest, {"type": "regex", "dimension": "lng",
                                "pattern": "4"}) == ["4"]
    assert l_matches(longtest, {"type": "search", "dimension": "lng",
                                "query": {"type": "contains", "value": "2",
                                          "caseSensitive": True}}) == \
        ["2", "9"]


def test_long_column_filtering_with_non_numbers(spark, longtest):
    # testLongColumnFilteringWithNonNumbers
    assert l_matches(longtest, sel("")) == []
    assert l_matches(longtest, sel(None)) == []
    assert l_matches(longtest, sel("abc")) == []
    assert l_matches(longtest, bound("a", "b")) == []
    assert l_matches(longtest, bound(" ", "4")) == \
        ["1", "2", "3", "4", "9", "10"]
    assert l_matches(longtest, bound(" ", "4", ordering="lexicographic")) == \
        ["1", "2", "3", "4", "7", "8", "9", "10"]
    assert l_matches(longtest, bound(" ", "A")) == []
    assert l_matches(longtest, bound(" ", "A", ordering="lexicographic")) == \
        [str(i) for i in range(1, 11)]


def test_long_filter_with_extraction_fn(spark, longtest):
    # testLongFilterWithExtractionFn (extraction keys on the
    # stringified long)
    assert l_matches(longtest, sel("Monday", WEEKDAY_FN)) == ["1"]
    assert l_matches(longtest, sel("Notaday", WEEKDAY_FN)) == []
    assert l_matches(longtest,
                     bound("Fridax", "Fridaz", ordering="alphanumeric",
                           efn=WEEKDAY_FN)) == ["5"]
    assert l_matches(longtest,
                     bound("Friday", "Friday", True, True,
                           ordering="alphanumeric", efn=WEEKDAY_FN)) == []
    assert l_matches(longtest, in_(["Caturday", "Saturday", "Tuesday"],
                                   WEEKDAY_FN)) == ["2", "6"]
    big = ["Saturday", "Tuesday", "Caturday", "Xanaday", "Vojuday",
           "Gribaday", "Kipoday", "Dheferday", "Fakeday", "Qeearaday",
           "Hello", "World", "1", "2", "3", "4", "5", "6", "7"]
    assert l_matches(longtest, in_(big, WEEKDAY_FN)) == ["2", "6"]
    # JS weekday predicate as the equivalent IN set
    assert l_matches(longtest, in_(["Wednesday", "Thursday"],
                                   WEEKDAY_FN)) == ["3", "4"]
    assert l_matches(longtest, {"type": "regex", "dimension": "lng",
                                "pattern": ".*day",
                                "extractionFn": WEEKDAY_FN}) == \
        ["1", "2", "3", "4", "5", "6"]
    assert l_matches(longtest, {"type": "search", "dimension": "lng",
                                "query": {"type": "contains", "value": "s",
                                          "caseSensitive": True},
                                "extractionFn": WEEKDAY_FN}) == \
        ["2", "3", "4"]


def test_multithreaded_value_contracts(spark, longtest):
    # testMultithreaded: the same value contracts, asserted once (see
    # module docstring)
    assert l_matches(longtest, sel("3")) == ["3"]
    assert l_matches(longtest, in_(["2", "4", "8"])) == ["2", "4"]
    assert l_matches(longtest, in_([str(i * 2) for i in range(32)])) == \
        ["2", "4", "6"]
    assert l_matches(longtest, bound("2", "5")) == ["2", "3", "4", "5"]
