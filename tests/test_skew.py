"""Salted two-phase aggregation equals the direct aggregation."""

from __future__ import annotations

import pyspark.sql.functions as F

from apache_druid_spark.operators.skew import salted_groupby


def test_salted_groupby_matches_direct(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    metrics = [("cnt", "count", None), ("total", "sum", "l_extendedprice"),
               ("lo", "min", "l_quantity"), ("hi", "max", "l_quantity")]
    salted = {r["l_returnflag"]: (r["cnt"], round(r["total"], 2),
                                  r["lo"], r["hi"])
              for r in salted_groupby(df, ["l_returnflag"], metrics,
                                      salt_buckets=8).collect()}
    direct = {r["l_returnflag"]: (r["cnt"], round(r["total"], 2),
                                  r["lo"], r["hi"])
              for r in df.groupBy("l_returnflag").agg(
                  F.count(F.lit(1)).alias("cnt"),
                  F.sum("l_extendedprice").alias("total"),
                  F.min("l_quantity").alias("lo"),
                  F.max("l_quantity").alias("hi")).collect()}
    assert salted == direct


def test_salted_groupby_rejects_non_combinable(spark):
    import pytest

    df = spark.range(5)
    with pytest.raises(ValueError):
        salted_groupby(df, ["id"], [("a", "avg", "id")])
