"""Regression tests for the round-10 advisor findings (ADVICE.md r10).

1. medium — _footer_extent returned naive-UTC datetimes; F.lit embeds
   naive values in the driver's LOCAL tz, so the footer path and the
   scan fallback would embed different instants on a non-UTC driver.
   Now tz-aware UTC (exact via utctimetuple).
2. low — the non-finalized raw-values sketch path hardcoded lgK=12,
   ignoring the spec's lgK; an outer hll_union_agg over mixed-lgK
   states fails (allowDifferentLgConfigK=false).
3. low — _mark_integral_rounds shadow detection matched CAST target
   type names and the self-alias ``ROUND(longcol, 1) AS longcol``,
   regressing the r8 integral-ROUND fix for the self-alias shape.
4. low — LOOKUP() correlated-subquery arms raised "more than one row"
   on lookups registered with duplicate keys; the view now dedups.
5. low — an all-null time-column row group (no min/max stats) aborted
   the whole footer answer instead of contributing nothing.
"""

from __future__ import annotations

from datetime import timezone as _tz

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from apache_druid_spark.model.datasource import (
    DatasourceRegistry, register_testdata)
from apache_druid_spark.operators.aggregations import compile_aggregator
from apache_druid_spark.plans.compiler import _footer_extent
from apache_druid_spark.sql.dialect import druid_sql

SF_DIR = "/root/testdata/sf0.001"


# -- 1: footer extent embeds tz-aware UTC instants -------------------------

def test_footer_extent_is_tz_aware_utc(spark):
    r = DatasourceRegistry(spark)
    register_testdata(r, SF_DIR)
    ext = _footer_extent(r.table("orders"), "o_orderdate", ())
    assert ext is not None
    assert ext[0].tzinfo is _tz.utc and ext[1].tzinfo is _tz.utc
    # same instant as the scan fallback's collected (naive local)
    # timestamps — .astimezone attaches the driver-local zone, so the
    # comparison is tz-robust
    row = r.table("orders").agg(
        F.min("__time"), F.max("__time")).head()
    assert ext == (row[0].astimezone(_tz.utc),
                   row[1].astimezone(_tz.utc))


# -- 2: non-finalized raw-value sketch honors the spec's lgK ---------------

def test_subquery_sketch_state_honors_lgk(spark):
    df = spark.range(100).select(
        F.concat(F.lit("u"), F.col("id")).alias("user"))
    spec = {"type": "HLLSketchBuild", "name": "st",
            "fieldName": "user", "lgK": 14}
    state = df.agg(compile_aggregator(spec, df=df, finalize=False))
    # ingest-style state at the same lgK: union must not throw
    # (allowDifferentLgConfigK defaults to false — the old hardcoded
    # 12 made this raise on any non-default lgK)
    from apache_druid_spark.ingest.batch import _hll_input

    other = df.agg(F.hll_sketch_agg(
        _hll_input(F.col("user")), 14).alias("st"))
    merged = (state.unionByName(other)
              .agg(F.hll_sketch_estimate(
                  F.hll_union_agg("st")).alias("est")).first())
    assert merged["est"] == pytest.approx(100, rel=0.05)


# -- 3: integral ROUND self-alias + CAST type names -------------------------

@pytest.fixture()
def long_table(spark):
    r = DatasourceRegistry(spark)
    df = spark.range(3).select(
        (F.col("id") * 10).alias("lcol"),
        F.lit("2024-01-01").cast("timestamp").alias("__time"))
    r.register("advr11", df)
    return r


def test_round_self_alias_stays_long(spark, long_table):
    # ROUND(lcol, 1) AS lcol — the alias IS the integral column being
    # rounded; shadow detection must not kick it off the fast path
    out = druid_sql(
        spark, "SELECT ROUND(lcol, 1) AS lcol FROM advr11 "
               "ORDER BY lcol LIMIT 1", long_table)
    assert out.schema["lcol"].dataType.simpleString() == "bigint"
    assert out.first()["lcol"] == 0


def test_round_with_cast_type_name_stays_long(spark, long_table):
    # CAST(... AS BIGINT) must not shadow anything — type names are
    # not aliases
    out = druid_sql(
        spark, "SELECT ROUND(lcol) AS rl, CAST(lcol AS BIGINT) AS c "
               "FROM advr11 ORDER BY rl LIMIT 1", long_table)
    assert out.schema["rl"].dataType.simpleString() == "bigint"


def test_round_genuine_shadow_still_conservative(spark, long_table):
    # a DOUBLE expression aliased to a DIFFERENT integral column name
    # must keep the generic NaN edge rewrite (the r9 contract holds)
    out = druid_sql(spark, """
        SELECT ROUND(lcol, 1) AS rc FROM (
            SELECT CAST('NaN' AS DOUBLE) AS lcol FROM advr11 LIMIT 1
        ) q
    """, long_table).first()
    assert out["rc"] == 0.0


# -- 4: LOOKUP over duplicate keys ------------------------------------------

def test_lookup_duplicate_keys_does_not_raise(spark):
    r = DatasourceRegistry(spark)
    df = spark.range(1).select(
        F.lit("x").alias("s"),
        F.lit("2024-01-01").cast("timestamp").alias("__time"))
    r.register("advr11lk", df)
    dup = spark.createDataFrame(
        [("a", "v1"), ("a", "v2"), ("b", "w")], "k string, v string")
    r.register_lookup("duppy", dup)
    out = druid_sql(
        spark, "SELECT LOOKUP('a', 'duppy') AS la, "
               "LOOKUP('b', 'duppy') AS lb FROM advr11lk", r).first()
    assert out["la"] == "v2"  # deterministic max
    assert out["lb"] == "w"


# -- 6 (VERDICT r10 task #6): metadata-only timeBoundary --------------------

def test_time_boundary_is_metadata_only(spark, monkeypatch):
    from pyspark.sql import DataFrame
    from apache_druid_spark.plans.compiler import compile_query

    r = DatasourceRegistry(spark)
    register_testdata(r, SF_DIR)
    q = {"queryType": "timeBoundary", "dataSource": "orders"}
    expected = r.table("orders").agg(
        F.min("__time").alias("minTime"),
        F.max("__time").alias("maxTime")).first()

    def _boom(self, *a, **k):  # pragma: no cover - must not run
        raise AssertionError("timeBoundary planned a Spark scan")

    monkeypatch.setattr(DataFrame, "head", _boom)
    out = compile_query(q, r)
    monkeypatch.undo()
    row = out.first()
    assert row["minTime"] == expected["minTime"]
    assert row["maxTime"] == expected["maxTime"]
    # bound variants take the same path
    monkeypatch.setattr(DataFrame, "head", _boom)
    mx = compile_query({"queryType": "timeBoundary",
                        "dataSource": "orders",
                        "bound": "maxTime"}, r)
    monkeypatch.undo()
    assert mx.columns == ["maxTime"]
    assert mx.first()["maxTime"] == expected["maxTime"]


def test_time_boundary_filtered_still_scans(spark):
    from apache_druid_spark.plans.compiler import compile_query

    r = DatasourceRegistry(spark)
    register_testdata(r, SF_DIR)
    q = {"queryType": "timeBoundary", "dataSource": "orders",
         "filter": {"type": "selector", "dimension": "o_orderstatus",
                    "value": "F"}}
    row = compile_query(q, r).first()
    exp = (r.table("orders")
           .filter(F.col("o_orderstatus") == "F")
           .agg(F.min("__time"), F.max("__time")).first())
    assert (row["minTime"], row["maxTime"]) == (exp[0], exp[1])


# -- 5: all-null row group skipped, not fatal --------------------------------

def test_footer_extent_skips_all_null_row_group(spark, tmp_path):
    p = str(tmp_path / "nulls.parquet")
    t1 = pa.table({"ts": pa.array(
        [1_700_000_000_000_000, 1_700_000_500_000_000],
        type=pa.timestamp("us")),
        "v": pa.array([1, 2])})
    t2 = pa.table({"ts": pa.array(
        [None, None], type=pa.timestamp("us")),
        "v": pa.array([3, 4])})
    with pq.ParquetWriter(p, t1.schema) as w:
        w.write_table(t1)   # row group 1: real extent
        w.write_table(t2)   # row group 2: all-null ts
    r = DatasourceRegistry(spark)
    r.register_parquet("advr11n", p, "ts")
    ext = _footer_extent(r.table("advr11n"), "ts", ())
    assert ext is not None  # all-null group skipped, not fatal
    row = r.table("advr11n").agg(
        F.min("__time"), F.max("__time")).head()
    assert ext == (row[0].astimezone(_tz.utc),
                   row[1].astimezone(_tz.utc))
