"""Chunk-stitched trailing windows (operators/windows.py).

The scale fix for dimension-less moving averages: no single-partition
WindowExec, same results as a global ORDER BY window.
"""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from apache_druid_spark.operators.windows import (
    bucket_index, chunked_trailing_window, finalize_chunked,
)

DAY_MS = 86_400_000


def _grid(spark, days, start=datetime(2024, 1, 1)):
    rows = [(start + timedelta(days=i), float(i)) for i in range(days)]
    return spark.createDataFrame(rows, "t timestamp, v double")


def _reference(spark, df, n):
    w = Window.orderBy("t").rowsBetween(-(n - 1), 0)
    return {r["t"]: r["ma"] for r in
            df.select("t", F.avg("v").over(w).alias("ma")).collect()}


@pytest.mark.parametrize("days,n,chunk", [
    (50, 7, 16),    # several chunks, window crosses every boundary
    (33, 5, 8),     # non-multiple chunk count
    (10, 1, 4),     # n=1: no helpers at all
    (20, 20, 16),   # chunk smaller than n -> clamped to 2n
])
def test_chunked_matches_global_window(spark, days, n, chunk):
    df = _grid(spark, days)
    expected = _reference(spark, df, n)
    stitched, w = chunked_trailing_window(df, "t", n, millis=DAY_MS,
                                          chunk=chunk)
    out = finalize_chunked(
        stitched.withColumn("ma", F.avg("v").over(w)))
    got = {r["t"]: r["ma"] for r in out.collect()}
    assert got == pytest.approx(expected)


def test_chunked_month_spacing(spark):
    rows = [(datetime(2023, m, 1), float(m)) for m in range(1, 13)]
    rows += [(datetime(2024, m, 1), float(12 + m)) for m in range(1, 13)]
    df = spark.createDataFrame(rows, "t timestamp, v double")
    expected = _reference(spark, df, 3)
    stitched, w = chunked_trailing_window(df, "t", 3, months=1, chunk=8)
    out = finalize_chunked(stitched.withColumn("ma", F.avg("v").over(w)))
    got = {r["t"]: r["ma"] for r in out.collect()}
    assert got == pytest.approx(expected)


def test_bucket_index_increments_by_one(spark):
    df = _grid(spark, 40)
    idx = [r["i"] for r in df.select(
        bucket_index("t", 0, DAY_MS).alias("i")).orderBy("i").collect()]
    assert idx == list(range(idx[0], idx[0] + 40))


def test_no_unpartitioned_window_in_plan(spark):
    df = _grid(spark, 30)
    stitched, w = chunked_trailing_window(df, "t", 7, millis=DAY_MS)
    out = finalize_chunked(stitched.withColumn("ma", F.avg("v").over(w)))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every Window node must partition by __chunk
    for line in plan.splitlines():
        if "Window " in line or line.strip().startswith("Window"):
            assert "__chunk" in line, f"unpartitioned window: {line}"


def test_moving_average_dimensionless_partitioned(spark, registry):
    """plans/moving_average.py dimension-less path goes through the
    chunked window and still matches the dims=[] semantics."""
    from apache_druid_spark.plans.moving_average import (
        compile_moving_average,
    )

    q = {
        "queryType": "movingAverage", "dataSource": "orders",
        "granularity": "month",
        "intervals": ["1995-01-01/1996-01-01"],
        "aggregations": [{"type": "doubleSum", "name": "rev",
                          "fieldName": "o_totalprice"}],
        "averagers": [{"type": "doubleMean", "name": "rev_ma3",
                       "buckets": 3, "fieldName": "rev"}],
    }
    out = compile_moving_average(q, registry)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__chunk" in plan
    rows = out.collect()
    assert len(rows) == 12
    got = {r["__time"].month: r["rev_ma3"] for r in rows}
    # reference: monthly sums over the extended interval, 0-filled,
    # global trailing-3 window
    monthly = {(r["y"], r["m"]): r["rev"]
               for r in registry.table("orders").select(
                   F.year("o_orderdate").alias("y"),
                   F.month("o_orderdate").alias("m"), "o_totalprice")
               .groupBy("y", "m").agg(F.sum("o_totalprice").alias("rev"))
               .collect()}
    seq = [(1994, 11), (1994, 12)] + [(1995, m) for m in range(1, 13)]
    vals = [monthly.get(ym, 0.0) for ym in seq]
    for i, m in enumerate(range(1, 13)):
        expect = sum(vals[i:i + 3]) / 3
        assert got[m] == pytest.approx(expect), f"month {m}"
