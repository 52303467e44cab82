"""movingAverage query type: trailing-bucket averagers with zero-fill,
cycleSize stride, and NoNull variants, against hand-computed values."""

from __future__ import annotations

import pytest

from apache_druid_spark.model.datasource import DatasourceRegistry
from apache_druid_spark.plans.compiler import compile_query


@pytest.fixture(scope="module")
def reg(spark):
    r = DatasourceRegistry(spark)
    df = spark.createDataFrame(
        [("2024-01-01", "a", 10.0),
         ("2024-01-02", "a", 20.0),
         # 2024-01-03 missing for 'a' (empty bucket -> 0 in mean)
         ("2024-01-04", "a", 40.0)],
        "d string, k string, v double")
    from pyspark.sql import functions as F

    r.register("ts_small", df.withColumn("__time", F.to_timestamp("d")))
    return r


def _run(reg, averager):
    out = compile_query({
        "queryType": "movingAverage", "dataSource": "ts_small",
        "granularity": "day",
        "intervals": ["2024-01-01/2024-01-05"],
        "dimensions": ["k"],
        "aggregations": [{"type": "doubleSum", "name": "sv",
                          "fieldName": "v"}],
        "averagers": [averager],
    }, reg)
    return {r["__time"].day: r[averager["name"]] for r in out.collect()}


def test_mean_counts_empty_buckets_as_zero(reg):
    got = _run(reg, {"type": "doubleMean", "name": "m",
                     "fieldName": "sv", "buckets": 2})
    # day1: (0 + 10)/2; day2: (10+20)/2; day3: (20+0)/2; day4: (0+40)/2
    assert got == {1: 5.0, 2: 15.0, 3: 10.0, 4: 20.0}


def test_mean_no_null_skips_empty_buckets(reg):
    got = _run(reg, {"type": "doubleMeanNoNull", "name": "m",
                     "fieldName": "sv", "buckets": 2})
    # day3: only day2 is non-null in window -> 20; day4: only day4 -> 40
    assert got == {1: 10.0, 2: 15.0, 3: 20.0, 4: 40.0}


def test_cycle_size_strides_from_oldest(reg):
    got = _run(reg, {"type": "doubleSum", "name": "m",
                     "fieldName": "sv", "buckets": 4, "cycleSize": 2})
    # day4 window (oldest->newest): [d1=10, d2=20, d3=0, d4=40];
    # stride-2 from oldest selects d1, d3 -> 10
    assert got[4] == 10.0


def test_max_min_over_window(reg):
    got = _run(reg, {"type": "doubleMax", "name": "m",
                     "fieldName": "sv", "buckets": 3})
    assert got[4] == 40.0  # max(20, null, 40)
    got = _run(reg, {"type": "doubleMin", "name": "m",
                     "fieldName": "sv", "buckets": 3})
    assert got[4] == 20.0  # min over non-null {20, 40}
