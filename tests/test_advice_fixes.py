"""Regression tests for round-1 advisor findings (ADVICE.md round 1).

Each test cites the reference behavior being matched.
"""

import pytest
from pyspark.sql import functions as F

from apache_druid_spark.operators.aggregations import compile_aggregator
from apache_druid_spark.operators.expressions import compile_expression
from apache_druid_spark.operators.filters import compile_filter


def _one(spark, expr_text):
    return spark.range(1).select(
        compile_expression(expr_text).alias("v")).collect()[0]["v"]


# --- timestamp_extract dow/epoch (TimestampExtractExprMacro.java:130-133) ---

def test_dow_is_joda_monday_one(spark):
    # 2024-01-01 is a Monday -> 1; 2024-01-07 is a Sunday -> 7
    assert _one(spark,
                "timestamp_extract(timestamp_parse('2024-01-01 12:00:00'), 'DOW')") == 1
    assert _one(spark,
                "timestamp_extract(timestamp_parse('2024-01-07 12:00:00'), 'DOW')") == 7
    # DOW and ISODOW agree in the reference
    assert _one(
        spark,
        "timestamp_extract(timestamp_parse('2024-01-03 00:00:00'), 'DOW')") == _one(
        spark,
        "timestamp_extract(timestamp_parse('2024-01-03 00:00:00'), 'ISODOW')")


def test_epoch_ignores_timezone_shift(spark):
    base = "timestamp_extract(timestamp_parse('2024-06-01 00:00:00'), 'EPOCH')"
    shifted = ("timestamp_extract(timestamp_parse('2024-06-01 00:00:00'), 'EPOCH', "
               "'America/Los_Angeles')")
    assert _one(spark, base) == _one(spark, shifted)
    # but wall-clock units DO shift
    h = ("timestamp_extract(timestamp_parse('2024-06-01 00:00:00'), 'HOUR', "
         "'America/Los_Angeles')")
    assert _one(spark, h) == 17


def test_bit_convert_exact(spark):
    # formerly a pinned exclusion; now exact arithmetic reinterpretation
    # (struct-verified round trip in test_expressions.py)
    assert _one(spark, "bitwiseConvertDoubleToLongBits(1.5)") \
        == 4609434218613702656
    assert _one(spark, "bitwiseConvertLongBitsToDouble(42)") == 2.08e-322


# --- filtered aggregator inner-type routing (FilteredAggregatorFactory) ---

@pytest.fixture(scope="module")
def vals(spark):
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0), ("b", 20.0)]
    return spark.createDataFrame(rows, "k string, v double")


def _filtered_spec(inner):
    return {"type": "filtered", "name": "out",
            "filter": {"type": "selector", "dimension": "k", "value": "a"},
            "aggregator": inner}


def test_filtered_variance_real(vals):
    col = compile_aggregator(_filtered_spec(
        {"type": "variance", "name": "out", "fieldName": "v"}), vals)
    out = vals.agg(col).collect()[0]["out"]
    assert out == pytest.approx(1.0)  # var_samp(1,2,3)


def test_filtered_stddev_population(vals):
    col = compile_aggregator(_filtered_spec(
        {"type": "stddev", "name": "out", "fieldName": "v",
         "estimator": "population"}), vals)
    out = vals.agg(col).collect()[0]["out"]
    assert out == pytest.approx((2.0 / 3) ** 0.5)


def test_filtered_theta_exact_distinct(vals):
    col = compile_aggregator(_filtered_spec(
        {"type": "thetaSketch", "name": "out", "fieldName": "v"}), vals)
    assert vals.agg(col).collect()[0]["out"] == 3


def test_filtered_cardinality_fields(vals):
    col = compile_aggregator(_filtered_spec(
        {"type": "cardinality", "name": "out", "fields": ["v"]}), vals)
    assert vals.agg(col).collect()[0]["out"] == 3


def test_filtered_percentile(vals):
    col = compile_aggregator(_filtered_spec(
        {"type": "tDigestSketch", "name": "out", "fieldName": "v",
         "fractions": [0.5]}), vals)
    assert vals.agg(col).collect()[0]["out"] == pytest.approx(2.0)


def test_filtered_unsupported_raises(vals):
    with pytest.raises(NotImplementedError):
        compile_aggregator(_filtered_spec(
            {"type": "histogram", "name": "out", "fieldName": "v",
             "breaks": [0, 1]}), vals)


# --- bloom payload validation (BloomKFilter wire format mismatch) ---

def test_bloom_rejects_base64_payload():
    from apache_druid_spark.functions.bloom import (
        bloom_build, bloom_test_column, validate_serialized,
    )
    good = bloom_build(["x", "y"], 256)
    assert validate_serialized(good) == good
    with pytest.raises(ValueError):
        bloom_test_column(F.lit("x"), "AAAAEg==")  # base64, not hex words
    with pytest.raises(ValueError):
        validate_serialized("0123456789abcdef0")  # not a multiple of 8


# --- interval filter on LONG dims = epoch millis (DimFilterUtils) ---

def test_interval_filter_long_dim_millis(spark):
    rows = [(1, 1704067200000), (2, 1704067200)]  # millis vs (wrong) secs
    df = spark.createDataFrame(rows, "id long, t long")
    pred = compile_filter(
        {"type": "interval", "dimension": "t",
         "intervals": ["2024-01-01/2024-01-02"]}, df)
    got = [r["id"] for r in df.filter(pred).collect()]
    assert got == [1]  # millis row matches; seconds row is 1970, excluded


def test_interval_filter_string_dim_unchanged(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 06:00:00"), (2, "2025-01-01 00:00:00")],
        "id long, t string")
    pred = compile_filter(
        {"type": "interval", "dimension": "t",
         "intervals": ["2024-01-01/2024-01-02"]}, df)
    assert [r["id"] for r in df.filter(pred).collect()] == [1]


# --- INSERT appends, REPLACE dynamic-overwrites (DruidSqlInsert) ---

def test_insert_appends_replace_overwrites_partition(spark, tmp_path):
    from apache_druid_spark.model.datasource import DatasourceRegistry
    from apache_druid_spark.sql.insert import druid_sql_insert

    reg = DatasourceRegistry(spark)
    base = str(tmp_path)
    ins = """INSERT INTO tgt
        SELECT CAST('2024-01-0{d} 01:00:00' AS TIMESTAMP) AS __time,
               'p{d}' AS page, {n} AS views
        PARTITIONED BY day"""
    druid_sql_insert(spark, ins.format(d=1, n=10), reg, base)
    out = druid_sql_insert(spark, ins.format(d=2, n=20), reg, base)
    # second INSERT appended — day-1 data still present
    assert out.count() == 2
    # REPLACE for day 2 only: day-1 partition untouched
    rep = """REPLACE INTO tgt OVERWRITE ALL
        SELECT CAST('2024-01-02 01:00:00' AS TIMESTAMP) AS __time,
               'p2b' AS page, 99 AS views
        PARTITIONED BY day"""
    out = druid_sql_insert(spark, rep, reg, base)
    rows = {(r["page"], r["views"]) for r in out.collect()}
    assert rows == {("p1", 10), ("p2b", 99)}


# --- round-2 advisor findings (ADVICE.md round 2) ---

def test_sql_view_refresh_on_reregister(spark):
    """Re-registering an existing datasource name must refresh the SQL
    temp view (ADVICE r2: stale (id, names) marker served old data)."""
    from apache_druid_spark import DatasourceRegistry
    from apache_druid_spark.sql.dialect import druid_sql

    reg = DatasourceRegistry(spark)
    reg.register("advice_t", spark.createDataFrame([(1,)], "x long"))
    r1 = druid_sql(spark, "SELECT SUM(x) AS s FROM advice_t", reg).collect()
    assert r1[0]["s"] == 1
    # same name, new frame — names() unchanged, epoch must catch it
    reg.register("advice_t", spark.createDataFrame([(5,), (6,)], "x long"))
    r2 = druid_sql(spark, "SELECT SUM(x) AS s FROM advice_t", reg).collect()
    assert r2[0]["s"] == 11


def test_parse_mem_suffixes():
    from apache_druid_spark.sql.catalog import _parse_mem

    assert _parse_mem("512m") == 512 * (1 << 20)
    assert _parse_mem("2048k") == 2048 * (1 << 10)
    assert _parse_mem("1g") == 1 << 30
    assert _parse_mem("1gb") == 1 << 30
    assert _parse_mem("3") == 3 * (1 << 20)  # bare = MiB (Spark docs)
    assert _parse_mem("weird", default=7) == 7  # fallback, not raise


def test_filtered_cardinality_empty_and_byvalue(spark):
    df = spark.createDataFrame(
        [("a", "x", "y"), ("a", "y", "z"), ("b", "x", "x")],
        "k string, d1 string, d2 string")
    sel = {"type": "selector", "dimension": "k", "value": "a"}
    # empty fields: 0, not IndexError
    agg = compile_aggregator(
        {"type": "filtered", "name": "c", "filter": sel,
         "aggregator": {"type": "cardinality", "name": "c", "fields": []}},
        df)
    assert df.agg(agg).collect()[0]["c"] == 0
    # byRow=false multi-dim: union of value sets over filtered rows
    # rows with k='a': d1 {x,y}, d2 {y,z} -> union {x,y,z} = 3
    # (distinct tuples would give 2 — the old wrong answer)
    agg = compile_aggregator(
        {"type": "filtered", "name": "c", "filter": sel,
         "aggregator": {"type": "cardinality", "name": "c",
                        "fields": ["d1", "d2"], "byRow": False}},
        df)
    assert df.agg(agg).collect()[0]["c"] == 3
    # unfiltered empty-fields guard too
    agg = compile_aggregator(
        {"type": "cardinality", "name": "c", "fields": []}, df)
    assert df.agg(agg).collect()[0]["c"] == 0


def test_http_staging_requires_shared_dir_when_not_local(spark, monkeypatch):
    from apache_druid_spark.ingest.batch import _fetch_http

    class FakeConf:
        def get(self, k, d=None):
            if k == "spark.master":
                return "spark://cluster:7077"
            return d

    class FakeSpark:
        conf = FakeConf()

    with pytest.raises(ValueError, match="stagingDir"):
        _fetch_http(FakeSpark(), {"uris": ["http://x/y.csv"]})
