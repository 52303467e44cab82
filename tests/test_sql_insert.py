"""INSERT INTO ... SELECT ... FROM TABLE(EXTERN(...)) PARTITIONED BY."""

from __future__ import annotations

import pytest

from apache_druid_spark.model.datasource import DatasourceRegistry
from apache_druid_spark.sql.insert import druid_sql_insert, parse_insert


def test_parse_insert_shapes():
    spec = parse_insert(
        "INSERT INTO wiki SELECT * FROM src PARTITIONED BY day")
    assert spec["verb"] == "INSERT" and spec["target"] == "wiki"
    assert spec["granularity"] == "day"
    spec = parse_insert(
        "REPLACE INTO wiki OVERWRITE ALL SELECT * FROM src "
        "PARTITIONED BY hour CLUSTERED BY page, user")
    assert spec["verb"] == "REPLACE"
    assert spec["clustered_by"] == ["page", "user"]
    assert parse_insert("SELECT 1") is None


def test_insert_extern_end_to_end(spark, tmp_path):
    reg = DatasourceRegistry(spark)
    inline = (
        '{"type": "inline", "data": "ts,page,views\\n'
        '2024-01-01T01:00:00,home,3\\n'
        '2024-01-02T05:00:00,docs,7\\n'
        '2024-01-02T06:00:00,home,2\\n"}'
    )
    fmt = '{"type": "csv", "findColumnsFromHeader": true}'
    sig = ('[{"name": "ts", "type": "string"}, '
           '{"name": "page", "type": "string"}, '
           '{"name": "views", "type": "long"}]')
    sql = f"""INSERT INTO pageviews
        SELECT CAST(ts AS TIMESTAMP) AS __time, page, views
        FROM TABLE(EXTERN('{inline}', '{fmt}', '{sig}'))
        PARTITIONED BY day"""
    out = druid_sql_insert(spark, sql, reg, str(tmp_path))
    rows = out.orderBy("__time").collect()
    assert [r["page"] for r in rows] == ["home", "docs", "home"]
    assert [r["views"] for r in rows] == [3, 7, 2]
    # registered as a queryable datasource; day-partitioned on disk
    assert reg.table("pageviews").count() == 3
    import os

    parts = [p for p in os.listdir(f"{tmp_path}/pageviews")
             if p.startswith("__segment=")]
    assert len(parts) == 2


def test_insert_into_system_table_rejected(spark, tmp_path):
    """CalciteInsertDmlTest testInsertIntoSystemTable/IntoView/
    IntoNonexistentSchema: only the druid schema is writable."""
    reg = DatasourceRegistry(spark)
    for target in ("sys.segments", "INFORMATION_SCHEMA.COLUMNS",
                   "view.aview", "nonexistent.dst"):
        with pytest.raises(ValueError,
                           match="not a Druid datasource"):
            druid_sql_insert(
                spark,
                f"INSERT INTO {target} SELECT CAST('2024-01-01' AS "
                f"TIMESTAMP) AS __time PARTITIONED BY day",
                reg, str(tmp_path))


def test_insert_into_qualified_druid_table(spark, tmp_path):
    """testInsertIntoQualifiedTable: druid.dst equals dst."""
    reg = DatasourceRegistry(spark)
    out = druid_sql_insert(
        spark,
        "INSERT INTO druid.qualified_dst SELECT CAST('2024-01-01' AS "
        "TIMESTAMP) AS __time, 5 AS v PARTITIONED BY day",
        reg, str(tmp_path))
    assert out.count() == 1
    assert reg.table("qualified_dst").count() == 1


def _extern_xyz():
    # the reference's externalDataSource: columns x(string), y(string),
    # z(long) over an inline source (CalciteInsertDmlTest:96-110)
    inline = ('{"type": "inline", "data": "x,y,z\\n'
              'a,aa,1\\nb,bb,2\\na,aa,3\\n"}')
    fmt = '{"type": "csv", "findColumnsFromHeader": true}'
    sig = ('[{"name": "x", "type": "string"}, '
           '{"name": "y", "type": "string"}, '
           '{"name": "z", "type": "long"}]')
    return f"TABLE(EXTERN('{inline}', '{fmt}', '{sig}'))"


def test_insert_from_external(spark, tmp_path):
    # testInsertFromExternal: SELECT * from the EXTERN source under
    # PARTITIONED BY ALL TIME (no __time in the source — epoch 0)
    reg = DatasourceRegistry(spark)
    out = druid_sql_insert(
        spark, f"INSERT INTO dst SELECT * FROM {_extern_xyz()} "
               "PARTITIONED BY ALL TIME", reg, str(tmp_path))
    assert sorted((r["x"], r["y"], r["z"]) for r in out.collect()) == [
        ("a", "aa", 1), ("a", "aa", 3), ("b", "bb", 2)]


def test_insert_from_external_project_sort(spark, tmp_path):
    # testInsertFromExternalProjectSort: projection + CLUSTERED BY
    # ordinals over the EXTERN source
    reg = DatasourceRegistry(spark)
    out = druid_sql_insert(
        spark, f"INSERT INTO dst SELECT x || y AS xy, z FROM "
               f"{_extern_xyz()} PARTITIONED BY ALL TIME "
               "CLUSTERED BY 1, 2", reg, str(tmp_path))
    assert sorted((r["xy"], r["z"]) for r in out.collect()) == [
        ("aaa", 1), ("aaa", 3), ("bbb", 2)]


def test_insert_from_external_aggregate(spark, tmp_path):
    # testInsertFromExternalAggregate (rollup) and
    # testInsertFromExternalAggregateAll (the GROUP BY () variant)
    reg = DatasourceRegistry(spark)
    out = druid_sql_insert(
        spark, f"INSERT INTO dst SELECT x, SUM(z) AS sum_z, "
               f"COUNT(*) AS cnt FROM {_extern_xyz()} GROUP BY 1 "
               "PARTITIONED BY ALL TIME", reg, str(tmp_path))
    assert sorted((r["x"], r["sum_z"], r["cnt"])
                  for r in out.collect()) == [("a", 4, 2), ("b", 2, 1)]
    out2 = druid_sql_insert(
        spark, f"INSERT INTO dst2 SELECT COUNT(*) AS cnt FROM "
               f"{_extern_xyz()} PARTITIONED BY ALL TIME",
        reg, str(tmp_path))
    assert [r["cnt"] for r in out2.collect()] == [3]
