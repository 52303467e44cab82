"""Golden tests ported from the reference's TimeFilteringTest.java
(processing/src/test/java/org/apache/druid/segment/filter/, 5 @Test
methods, all ported) over its own 6-row fixture (__time = epoch millis
0..5, TimeFilteringTest.java:79-86).

Pins the __time filter contracts: bare value filters compare against
stringified epoch millis; non-time extraction fns receive the millis
long ('0'..'5' feed the weekday lookup); timeFormat consumes the
timestamp (EEEE in America/New_York renders epoch 0 as 'Wednesday');
interval filters on STRING dimensions parse the values as millis longs.

JS substitutions (javascript is policy-walled): the x===3||x===5 filter
== an expression filter; the weekday-name JS predicate over the lookup
== an IN filter over the same two names (same composition: extraction
then set membership); the +2h time booster inside testIntervalFilter ==
the equivalent expression filter (the extractionFn form has no
arithmetic non-JS fn to carry it).
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import types as T

from apache_druid_spark.plans.compiler import compile_query

MS = lambda n: datetime.utcfromtimestamp(n / 1000.0)  # noqa: E731

ROWS = [
    (MS(0), "0", "", ["a", "b"]),
    (MS(1), "1", "10", []),
    (MS(2), "2", "2", [""]),
    (MS(3), "3", "1", ["a"]),
    (MS(4), "4", "def", ["c"]),
    (MS(5), "5", "abc", None),
]

SCHEMA = T.StructType([
    T.StructField("__time", T.TimestampType()),
    T.StructField("dim0", T.StringType()),
    T.StructField("dim1", T.StringType()),
    T.StructField("dim2", T.ArrayType(T.StringType())),
])

ALL6 = ["0", "1", "2", "3", "4", "5"]

WEEKDAY_FN = {"type": "lookup",
              "lookup": {"type": "map", "map": {
                  "0": "Monday", "1": "Tuesday", "2": "Wednesday",
                  "3": "Thursday", "4": "Friday", "5": "Saturday"}},
              "retainMissingValue": False,
              "replaceMissingValueWith": "UNKNOWN", "optimize": True}


@pytest.fixture(scope="session")
def timetest(spark):
    from apache_druid_spark.model.datasource import DatasourceRegistry

    reg = DatasourceRegistry(spark)
    reg.register("timetest", spark.createDataFrame(ROWS, SCHEMA).cache())
    return reg


def t_matches(reg, flt) -> list[str]:
    q = {"queryType": "scan", "dataSource": "timetest",
         "intervals": ["1969-01-01/2021-01-01"],
         "columns": ["dim0"], "filter": flt}
    return sorted(r["dim0"] for r in compile_query(q, reg).collect())


def test_time_filter_as_long(spark, timetest):
    # testTimeFilterAsLong
    assert t_matches(timetest, {"type": "selector", "dimension": "__time",
                                "value": "0"}) == ["0"]
    assert t_matches(timetest, {"type": "selector", "dimension": "__time",
                                "value": "9000"}) == []
    assert t_matches(timetest, {"type": "bound", "dimension": "__time",
                                "lower": "0", "upper": "4",
                                "ordering": "numeric"}) == \
        ["0", "1", "2", "3", "4"]
    assert t_matches(timetest, {"type": "bound", "dimension": "__time",
                                "lower": "0", "upper": "4",
                                "lowerStrict": True, "upperStrict": True,
                                "ordering": "numeric"}) == ["1", "2", "3"]
    assert t_matches(timetest, {"type": "in", "dimension": "__time",
                                "values": ["2", "4", "8"]}) == ["2", "4"]
    # the 32-value hashset-threshold variant, filtering even millis
    assert t_matches(timetest, {"type": "in", "dimension": "__time",
                                "values": [str(i * 2) for i in range(32)]}) \
        == ["0", "2", "4"]
    # the JS x===3||x===5 predicate as the equivalent OR of selectors
    assert t_matches(timetest, {"type": "or", "fields": [
        {"type": "selector", "dimension": "__time", "value": "3"},
        {"type": "selector", "dimension": "__time", "value": "5"},
    ]}) == ["3", "5"]
    assert t_matches(timetest, {"type": "regex", "dimension": "__time",
                                "pattern": "4"}) == ["4"]
    assert t_matches(timetest, {"type": "search", "dimension": "__time",
                                "query": {"type": "contains", "value": "2",
                                          "caseSensitive": True}}) == ["2"]


def test_time_filter_with_extraction_fn(spark, timetest):
    # testTimeFilterWithExtractionFn: the lookup keys are the millis
    # longs stringified
    assert t_matches(timetest, {"type": "selector", "dimension": "__time",
                                "value": "Monday",
                                "extractionFn": WEEKDAY_FN}) == ["0"]
    assert t_matches(timetest, {"type": "selector", "dimension": "__time",
                                "value": "Notaday",
                                "extractionFn": WEEKDAY_FN}) == []
    assert t_matches(timetest, {"type": "bound", "dimension": "__time",
                                "lower": "Fridax", "upper": "Fridaz",
                                "ordering": "alphanumeric",
                                "extractionFn": WEEKDAY_FN}) == ["4"]
    assert t_matches(timetest, {"type": "bound", "dimension": "__time",
                                "lower": "Friday", "upper": "Friday",
                                "lowerStrict": True, "upperStrict": True,
                                "ordering": "alphanumeric",
                                "extractionFn": WEEKDAY_FN}) == []
    assert t_matches(timetest, {"type": "in", "dimension": "__time",
                                "values": ["Caturday", "Saturday",
                                           "Tuesday"],
                                "extractionFn": WEEKDAY_FN}) == ["1", "5"]
    big = ["Saturday", "Tuesday", "Caturday", "Xanaday", "Vojuday",
           "Gribaday", "Kipoday", "Dheferday", "Fakeday", "Qeearaday",
           "Hello", "World", "1", "2", "3", "4", "5", "6", "7"]
    assert t_matches(timetest, {"type": "in", "dimension": "__time",
                                "values": big,
                                "extractionFn": WEEKDAY_FN}) == ["1", "5"]
    # the JS 'Wednesday'||'Thursday' predicate as the equivalent IN set
    assert t_matches(timetest, {"type": "in", "dimension": "__time",
                                "values": ["Wednesday", "Thursday"],
                                "extractionFn": WEEKDAY_FN}) == ["2", "3"]
    assert t_matches(timetest, {"type": "regex", "dimension": "__time",
                                "pattern": ".*day",
                                "extractionFn": WEEKDAY_FN}) == ALL6
    assert t_matches(timetest, {"type": "search", "dimension": "__time",
                                "query": {"type": "contains", "value": "s",
                                          "caseSensitive": True},
                                "extractionFn": WEEKDAY_FN}) == \
        ["1", "2", "3"]


def test_time_filter_with_time_format_extraction_fn(spark, timetest):
    # testTimeFilterWithTimeFormatExtractionFn: epoch 0 in
    # America/New_York is Wednesday Dec 31 1969
    assert t_matches(timetest, {
        "type": "selector", "dimension": "__time", "value": "Wednesday",
        "extractionFn": {"type": "timeFormat", "format": "EEEE",
                         "timeZone": "America/New_York",
                         "locale": "en"}}) == ALL6


def test_interval_filter(spark, timetest):
    # testIntervalFilter
    assert t_matches(timetest, {
        "type": "interval", "dimension": "__time",
        "intervals": ["1970-01-01T00:00:00.001Z/1970-01-01T00:00:00.005Z"],
    }) == ["1", "2", "3", "4"]
    assert t_matches(timetest, {
        "type": "interval", "dimension": "__time",
        "intervals": ["1970-01-01T00:00:00.000Z/1970-01-01T00:00:00.003Z",
                      "1970-01-01T00:00:00.004Z/1970-01-01T00:00:00.006Z"],
    }) == ["0", "1", "2", "4", "5"]
    assert t_matches(timetest, {
        "type": "interval", "dimension": "__time",
        "intervals": ["1970-01-01T00:00:00.000Z/1970-01-01T00:00:00.001Z",
                      "1970-01-01T00:00:00.003Z/1970-01-01T00:00:00.006Z",
                      "1970-01-01T00:00:00.002Z/1970-01-01T00:00:00.005Z"],
    }) == ["0", "2", "3", "4", "5"]
    # the +2h JS time booster as a millis-shifting lookup, exercising
    # the same extractionFn-before-interval-compare path (the fn gets
    # the millis long, its output re-parses as millis)
    shift = {str(i): str(i + 7200000) for i in range(6)}
    assert t_matches(timetest, {
        "type": "interval", "dimension": "__time",
        "intervals": ["1970-01-01T02:00:00.001Z/1970-01-01T02:00:00.005Z"],
        "extractionFn": {"type": "lookup",
                         "lookup": {"type": "map", "map": shift},
                         "retainMissingValue": False},
    }) == ["1", "2", "3", "4"]


def test_interval_filter_on_string_dimension(spark, timetest):
    # testIntervalFilterOnStringDimension: string values parse as
    # epoch-millis longs
    assert t_matches(timetest, {
        "type": "interval", "dimension": "dim0",
        "intervals": ["1970-01-01T00:00:00.001Z/1970-01-01T00:00:00.005Z"],
    }) == ["1", "2", "3", "4"]
    assert t_matches(timetest, {
        "type": "interval", "dimension": "dim0",
        "intervals": ["1970-01-01T00:00:00.000Z/1970-01-01T00:00:00.003Z",
                      "1970-01-01T00:00:00.004Z/1970-01-01T00:00:00.006Z"],
    }) == ["0", "1", "2", "4", "5"]
    assert t_matches(timetest, {
        "type": "interval", "dimension": "dim0",
        "intervals": ["1970-01-01T00:00:00.000Z/1970-01-01T00:00:00.001Z",
                      "1970-01-01T00:00:00.003Z/1970-01-01T00:00:00.006Z",
                      "1970-01-01T00:00:00.002Z/1970-01-01T00:00:00.005Z"],
    }) == ["0", "2", "3", "4", "5"]
    assert t_matches(timetest, {
        "type": "interval", "dimension": "dim1",
        "intervals": ["1970-01-01T00:00:00.002Z/1970-01-01T00:00:00.011Z"],
    }) == ["1", "2"]
