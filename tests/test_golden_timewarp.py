"""Golden tests ported from the reference's TimewarpOperatorTest.java
(processing/src/test/java/org/apache/druid/query/, 5 @Test methods).

4/5 accounted: the three computeOffset/postProcess value methods port
below (the reference stubs its inner QueryRunner; here the inner query
runs for real over a fixture whose rows sit in the warped window, so
the contract asserted is strictly stronger); testPostProcessWithTime
zonesAndNoDstShift is the same shape as the DST method with a
zero-correction timezone (folded into the parametrized port);
testEmptyFutureInterval pins the now-clamping of the warped interval,
asserted here via the interval-rewrite helper directly.

Reference anchor: a P1W warp over dataInterval 2014-01-01/2014-01-15
aligned on Monday 2014-01-06 maps 2014-08-02 onto 2014-01-11
(TimewarpOperator.computeOffset), with a DST correction when the query
zone's offset differs between the two instants.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import types as T

from apache_druid_spark.plans.compiler import compile_query
from apache_druid_spark.plans.timewarp import TimewarpOperator, iso_millis

OP = TimewarpOperator("2014-01-01/2014-01-15", "P1W", "2014-01-06")

D = datetime


def test_compute_offset(spark):
    # testComputeOffset
    t = iso_millis("2014-01-23")
    assert t + OP.compute_offset(t, "UTC") == iso_millis("2014-01-09")
    t = iso_millis("2014-08-02")
    assert t + OP.compute_offset(t, "UTC") == iso_millis("2014-01-11")
    # across the DST boundary in America/Los_Angeles: -07 now vs -08
    # in January
    t = iso_millis("2014-08-02T00:00:00-07:00")
    assert t + OP.compute_offset(t, "America/Los_Angeles") == \
        iso_millis("2014-01-11T00:00:00-08:00")


def test_empty_future_interval_clamps_at_now(spark):
    # testEmptyFutureInterval: an all-future query interval warps to
    # the empty instant at now + offset
    now = iso_millis("2014-08-02")
    warped, offset = OP.warp_intervals(["2014-08-06/2014-08-08"], now)
    s, e = warped[0].split("/")
    assert iso_millis(s) == iso_millis(e) == now + offset


@pytest.fixture(scope="session")
def warp_reg(spark):
    from apache_druid_spark.model.datasource import DatasourceRegistry

    rows = [(D(2014, 1, 9), 2), (D(2014, 1, 11), 3)]
    schema = T.StructType([
        T.StructField("__time", T.TimestampType()),
        T.StructField("metric", T.LongType()),
    ])
    reg = DatasourceRegistry(spark)
    reg.register("warped", spark.createDataFrame(rows, schema).cache())
    # the DST fixture holds the same points at LA wall-clock midnight
    # (UTC-8 in January)
    dst_rows = [(D(2014, 1, 9, 8), 2), (D(2014, 1, 11, 8), 3)]
    reg.register("warpdst", spark.createDataFrame(dst_rows, schema).cache())
    return reg


def test_post_process(spark, warp_reg):
    # testPostProcess: a query over 2014-07-31/2014-08-05 at
    # now=2014-08-02T01 reads the golden window and reports the rows
    # under the current dates (01-09 -> 07-31, 01-11 -> 08-02); now is
    # an hour in so the warped window's exclusive end keeps the
    # 01-11T00 row (the reference's stub fabricated it at the end)
    q = {"queryType": "timeseries", "dataSource": "warped",
         "granularity": "day",
         "intervals": ["2014-07-31/2014-08-05"],
         "aggregations": [{"type": "longSum", "name": "metric",
                           "fieldName": "metric"}],
         "context": {"timewarpNow": iso_millis("2014-08-02T01:00:00Z")},
         "postProcessing": [{"type": "timewarp",
                             "dataInterval": "2014-01-01/2014-01-15",
                             "period": "P1W", "origin": "2014-01-06"}]}
    rows = [(r["__time"], r["metric"])
            for r in compile_query(q, warp_reg).collect()]
    assert rows == [(D(2014, 7, 31), 2), (D(2014, 8, 2), 3)]


def test_post_process_timeboundary_clamps_max_at_now(spark, warp_reg):
    # testPostProcess's timeBoundary leg: maxTime warps back and clamps
    # at now (2014-01-11 + offset would pass it)
    q = {"queryType": "timeBoundary", "dataSource": "warped",
         "bound": "maxTime",
         "context": {"timewarpNow": iso_millis("2014-08-02")},
         "postProcessing": [{"type": "timewarp",
                             "dataInterval": "2014-01-01/2014-01-15",
                             "period": "P1W", "origin": "2014-01-06"}]}
    rows = compile_query(q, warp_reg).collect()
    assert len(rows) == 1
    assert rows[0]["maxTime"] == D(2014, 8, 2)


@pytest.mark.parametrize("tz,ds,expected", [
    # testPostProcessWithTimezonesAndDstShift: LA is -07 at now, the
    # golden window is -08 — the correction keeps wall-clock alignment
    ("America/Los_Angeles", "warpdst",
     [(D(2014, 7, 31, 7), 2), (D(2014, 8, 2, 7), 3)]),
    # testPostProcessWithTimezonesAndNoDstShift: a fixed-offset zone
    # has no correction
    ("UTC", "warped", [(D(2014, 7, 31), 2), (D(2014, 8, 2), 3)]),
])
def test_post_process_with_timezones(spark, warp_reg, tz, ds, expected):
    # now sits an hour into the day so the warped window's exclusive
    # end (now + offset) still contains the 2014-01-11 golden row (the
    # reference's stub runner fabricated that row AT the interval end)
    now = (iso_millis("2014-08-02T01:00:00-07:00")
           if tz.startswith("America") else iso_millis("2014-08-02T01:00:00Z"))
    start = "2014-07-31T00:00:00-07:00" if tz.startswith("America") \
        else "2014-07-31"
    end = "2014-08-05T00:00:00-07:00" if tz.startswith("America") \
        else "2014-08-05"
    q = {"queryType": "timeseries", "dataSource": ds,
         "granularity": {"type": "period", "period": "P1D",
                         "timeZone": tz},
         "intervals": [f"{start}/{end}"],
         "aggregations": [{"type": "longSum", "name": "metric",
                           "fieldName": "metric"}],
         "context": {"timewarpNow": now},
         "postProcessing": [{"type": "timewarp",
                             "dataInterval": "2014-01-01/2014-01-15",
                             "period": "P1W", "origin": "2014-01-06"}]}
    rows = [(r["__time"], r["metric"])
            for r in compile_query(q, warp_reg).collect()]
    assert rows == expected
