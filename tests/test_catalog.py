"""sys + INFORMATION_SCHEMA catalogs (sql/catalog.py).

Column sets mirror SystemSchema.java:134-199 and
InformationSchema.java:78-112.
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from apache_druid_spark.model.datasource import DatasourceRegistry
from apache_druid_spark.sql.catalog import (
    information_schema_columns, information_schema_schemata,
    information_schema_tables, sys_segments, sys_servers,
)
from apache_druid_spark.sql.dialect import druid_sql, translate


def _publish(spark, reg, tmp_path, name="pub"):
    from apache_druid_spark.ingest import write_segments

    rows = [(datetime(2024, 1, d, h), "k", 1.0)
            for d in (1, 2) for h in (3, 9)]
    df = spark.createDataFrame(rows, "__time timestamp, k string, v double")
    path = str(tmp_path / name)
    write_segments(df, path, segment_granularity="day")
    reg.register(name, spark.read.parquet(path).drop("__segment"))
    reg.record_segments(name, path, "day")
    return path


def test_sys_segments_columns_and_rows(spark, tmp_path):
    reg = DatasourceRegistry(spark)
    _publish(spark, reg, tmp_path)
    seg = sys_segments(reg)
    assert seg.columns == [
        "segment_id", "datasource", "start", "end", "size", "version",
        "partition_num", "num_replicas", "num_rows", "is_published",
        "is_available", "is_realtime", "is_overshadowed", "shard_spec",
        "dimensions", "metrics", "last_compaction_state"]
    rows = {r["start"]: r for r in seg.collect()}
    assert set(rows) == {"2024-01-01T00:00:00.000Z",
                         "2024-01-02T00:00:00.000Z"}
    r = rows["2024-01-01T00:00:00.000Z"]
    assert r["end"] == "2024-01-02T00:00:00.000Z"
    assert r["num_rows"] == 2 and r["size"] > 0
    assert r["is_published"] == 1 and r["is_realtime"] == 0


def test_sys_catalog_sql_spelling(spark, tmp_path):
    reg = DatasourceRegistry(spark)
    _publish(spark, reg, tmp_path, name="pub2")
    out = druid_sql(spark, """
        SELECT datasource, num_rows FROM sys.segments
        WHERE datasource = 'pub2' ORDER BY start
    """, reg)
    assert [r["num_rows"] for r in out.collect()] == [2, 2]


def test_information_schema_tables_and_columns(spark, registry):
    t = information_schema_tables(registry)
    names = {(r["TABLE_SCHEMA"], r["TABLE_NAME"]) for r in t.collect()}
    assert ("druid", "nation") in names
    assert ("sys", "segments") in names
    assert ("INFORMATION_SCHEMA", "COLUMNS") in names
    c = information_schema_columns(registry)
    got = {r["COLUMN_NAME"]: r["DATA_TYPE"] for r in
           c.filter(F.col("TABLE_NAME") == "region").collect()}
    assert got["r_name"] == "VARCHAR"


def test_catalog_rewrite_skips_strings():
    out = translate("SELECT 'sys.segments' AS s FROM sys.segments")
    assert "'sys.segments'" in out
    assert "FROM sys_segments" in out


def test_sys_servers_shape(spark):
    reg = DatasourceRegistry(spark)
    rows = sys_servers(reg).collect()
    assert len(rows) == 1 and rows[0]["server_type"] == "historical"


def test_contrib_aggregators(spark):
    from apache_druid_spark.operators.aggregations import (
        compile_aggregator,
    )

    rows = [(datetime(2024, 1, 1, 5), "a"), (datetime(2024, 1, 2, 7), "b"),
            (datetime(2024, 1, 3, 9), "a")]
    df = spark.createDataFrame(rows, "__time timestamp, u string")
    out = df.agg(
        compile_aggregator({"type": "distinctCount", "name": "dc",
                            "fieldName": "u"}),
        compile_aggregator({"type": "timeMin", "name": "tmin"}),
        compile_aggregator({"type": "timeMax", "name": "tmax"}),
    ).collect()[0]
    assert out["dc"] == 2
    assert out["tmin"] == int(datetime(2024, 1, 1, 5).timestamp() * 1000)
    assert out["tmax"] == int(datetime(2024, 1, 3, 9).timestamp() * 1000)


def test_lookup_schema_in_catalog(spark):
    # registered lookups surface as (k, v) VARCHAR tables in the
    # `lookup` schema (sql/.../schema/LookupSchema.java
    # LOOKUP_SIGNATURE), queryable through INFORMATION_SCHEMA
    reg = DatasourceRegistry(spark)
    reg.register_lookup("country_name", {"1": "x", "2": "y"})
    t = information_schema_tables(reg)
    assert ("lookup", "country_name") in {
        (r["TABLE_SCHEMA"], r["TABLE_NAME"]) for r in t.collect()}
    c = information_schema_columns(reg)
    got = {(r["COLUMN_NAME"], r["DATA_TYPE"]) for r in
           c.filter((F.col("TABLE_SCHEMA") == "lookup")
                    & (F.col("TABLE_NAME") == "country_name")).collect()}
    assert got == {("k", "VARCHAR"), ("v", "VARCHAR")}
    s = information_schema_schemata(reg)
    assert "lookup" in {r["SCHEMA_NAME"] for r in s.collect()}
