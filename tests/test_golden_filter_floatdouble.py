"""Golden tests ported from the reference's
FloatAndDoubleFilteringTest.java (processing/src/test/java/org/apache/
druid/segment/filter/, 4 @Test methods, all ported) over its own 6-row
fixture with FLOAT and DOUBLE columns holding 1.0..6.0
(FloatAndDoubleFilteringTest.java:92-99). Every method runs the same
contracts against both columns.

Pins: '3' and '3.0' both select 3.0; bare-value regex/search/
lexicographic filters see the RENDERED form ('4.0', so lex upper '4'
excludes it but '4.0' includes it); extraction fns key on the rendered
'1.0'..'6.0'. JS predicates substituted as in the sibling ports;
testMultithreaded's value contracts asserted once.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import types as T

from apache_druid_spark.plans.compiler import compile_query

MS = lambda n: datetime.utcfromtimestamp(n / 1000.0)  # noqa: E731

ROWS = [(MS(i), str(i), float(i), float(i)) for i in range(1, 7)]

SCHEMA = T.StructType([
    T.StructField("__time", T.TimestampType()),
    T.StructField("dim0", T.StringType()),
    T.StructField("flt", T.FloatType()),
    T.StructField("dbl", T.DoubleType()),
])

COLS = ("flt", "dbl")
ALL6 = ["1", "2", "3", "4", "5", "6"]

WEEKDAY_FN = {"type": "lookup",
              "lookup": {"type": "map", "map": {
                  "1.0": "Monday", "2.0": "Tuesday", "3.0": "Wednesday",
                  "4.0": "Thursday", "5.0": "Friday", "6.0": "Saturday"}},
              "retainMissingValue": False,
              "replaceMissingValueWith": "UNKNOWN", "optimize": True}


@pytest.fixture(scope="session")
def fdtest(spark):
    from apache_druid_spark.model.datasource import DatasourceRegistry

    reg = DatasourceRegistry(spark)
    reg.register("fdtest", spark.createDataFrame(ROWS, SCHEMA).cache())
    return reg


def f_matches(reg, flt) -> list[str]:
    q = {"queryType": "scan", "dataSource": "fdtest",
         "intervals": ["1969-01-01/2021-01-01"],
         "columns": ["dim0"], "filter": flt}
    return sorted(r["dim0"] for r in compile_query(q, reg).collect())


def sel(col, value, efn=None):
    f = {"type": "selector", "dimension": col, "value": value}
    if efn:
        f["extractionFn"] = efn
    return f


def bound(col, lower, upper, ls=False, us=False, ordering="numeric",
          efn=None):
    f = {"type": "bound", "dimension": col, "ordering": ordering,
         "lowerStrict": ls, "upperStrict": us}
    if lower is not None:
        f["lower"] = lower
    if upper is not None:
        f["upper"] = upper
    if efn:
        f["extractionFn"] = efn
    return f


def in_(col, values, efn=None):
    f = {"type": "in", "dimension": col, "values": values}
    if efn:
        f["extractionFn"] = efn
    return f


def test_float_column_filtering(spark, fdtest):
    # testFloatColumnFiltering (doTestFloatColumnFiltering x both cols)
    for c in COLS:
        assert f_matches(fdtest, sel(c, "3")) == ["3"], c
        assert f_matches(fdtest, sel(c, "3.0")) == ["3"], c
        assert f_matches(fdtest, bound(c, "2", "5")) == ["2", "3", "4", "5"], c
        assert f_matches(fdtest, bound(c, "2.0", "5.0")) == \
            ["2", "3", "4", "5"], c
        assert f_matches(fdtest, bound(c, "1", "4", True, True)) == \
            ["2", "3"], c
        assert f_matches(fdtest, bound(c, "1.0", "4.0", True, True)) == \
            ["2", "3"], c
        assert f_matches(fdtest, in_(c, ["2", "4", "8"])) == ["2", "4"], c
        assert f_matches(fdtest, in_(c, ["2.0", "4.0", "8.0"])) == \
            ["2", "4"], c
        assert f_matches(fdtest, in_(c, [str(i * 2) for i in range(32)])) \
            == ["2", "4", "6"], c
        # JS x===3||x===5 (and the 3.0/5.0 variant) as or-of-selectors
        assert f_matches(fdtest, {"type": "or", "fields": [
            sel(c, "3"), sel(c, "5")]}) == ["3", "5"], c
        assert f_matches(fdtest, {"type": "or", "fields": [
            sel(c, "3.0"), sel(c, "5.0")]}) == ["3", "5"], c
        assert f_matches(fdtest, {"type": "regex", "dimension": c,
                                  "pattern": "4"}) == ["4"], c
        assert f_matches(fdtest, {"type": "regex", "dimension": c,
                                  "pattern": "4.0"}) == ["4"], c
        assert f_matches(fdtest, {"type": "search", "dimension": c,
                                  "query": {"type": "contains",
                                            "value": "2",
                                            "caseSensitive": True}}) == \
            ["2"], c


def test_float_column_filtering_with_non_numbers(spark, fdtest):
    # testFloatColumnFilteringWithNonNumbers
    for c in COLS:
        assert f_matches(fdtest, sel(c, "")) == [], c
        assert f_matches(fdtest, sel(c, None)) == [], c
        assert f_matches(fdtest, sel(c, "abc")) == [], c
        assert f_matches(fdtest, bound(c, "a", "b")) == [], c
        assert f_matches(fdtest, bound(c, " ", "4")) == \
            ["1", "2", "3", "4"], c
        assert f_matches(fdtest,
                         bound(c, " ", "4", ordering="lexicographic")) == \
            ["1", "2", "3"], c
        assert f_matches(fdtest,
                         bound(c, " ", "4.0", ordering="lexicographic")) == \
            ["1", "2", "3", "4"], c
        assert f_matches(fdtest, bound(c, " ", "A")) == [], c
        assert f_matches(fdtest,
                         bound(c, " ", "A", ordering="lexicographic")) == \
            ALL6, c


def test_float_filter_with_extraction_fn(spark, fdtest):
    # testFloatFilterWithExtractionFn (lookup keys are the rendered
    # '1.0'..'6.0')
    for c in COLS:
        assert f_matches(fdtest, sel(c, "Monday", WEEKDAY_FN)) == ["1"], c
        assert f_matches(fdtest, sel(c, "Notaday", WEEKDAY_FN)) == [], c
        assert f_matches(fdtest,
                         bound(c, "Fridax", "Fridaz",
                               ordering="alphanumeric",
                               efn=WEEKDAY_FN)) == ["5"], c
        assert f_matches(fdtest,
                         bound(c, "Friday", "Friday", True, True,
                               ordering="alphanumeric",
                               efn=WEEKDAY_FN)) == [], c
        assert f_matches(fdtest, in_(c, ["Caturday", "Saturday", "Tuesday"],
                                     WEEKDAY_FN)) == ["2", "6"], c
        big = ["Saturday", "Tuesday", "Caturday", "Xanaday", "Vojuday",
               "Gribaday", "Kipoday", "Dheferday", "Fakeday", "Qeearaday",
               "Hello", "World", "1", "2", "3", "4", "5", "6", "7"]
        assert f_matches(fdtest, in_(c, big, WEEKDAY_FN)) == ["2", "6"], c
        assert f_matches(fdtest, in_(c, ["Wednesday", "Thursday"],
                                     WEEKDAY_FN)) == ["3", "4"], c


def test_multithreaded_value_contracts(spark, fdtest):
    # testMultithreaded: the same value contracts, asserted once
    for c in COLS:
        assert f_matches(fdtest, sel(c, "3")) == ["3"], c
        assert f_matches(fdtest, in_(c, ["2", "4", "8"])) == ["2", "4"], c
        assert f_matches(fdtest, in_(c, [str(i * 2) for i in range(32)])) \
            == ["2", "4", "6"], c
        assert f_matches(fdtest, bound(c, "2", "5")) == \
            ["2", "3", "4", "5"], c
