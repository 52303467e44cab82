"""CalciteInsertDmlTest validation contracts (sql/src/test/java/org/
apache/druid/sql/calcite/CalciteInsertDmlTest.java, 29 methods): the
rejection semantics of INSERT/REPLACE — missing PARTITIONED BY,
unsupported UPSERT / column lists, invalid datasource names and
schemas, invalid granularities, ORDER BY (VERDICT r6 task #7 / r7
task #5)."""

from __future__ import annotations

from datetime import datetime

import pytest

from apache_druid_spark.model.datasource import DatasourceRegistry
from apache_druid_spark.sql.insert import (druid_sql_insert, parse_insert,
                                           validate_insert)


@pytest.fixture(scope="module")
def ins_reg(spark):
    r = DatasourceRegistry(spark)
    r.register("foo", spark.createDataFrame(
        [(datetime(2000, 1, 1), "xy", 1.0),
         (datetime(2000, 1, 2), "ab", 2.0)],
        "__time timestamp, dim1 string, m1 double"))
    r.register_view(
        "aview",
        "SELECT SUBSTRING(dim1, 1, 1) AS dim1_firstchar FROM foo "
        "WHERE dim1 = 'ab'")
    return r


def _run(spark, reg, tmp_path, sql):
    return druid_sql_insert(spark, sql, reg, str(tmp_path))


def test_insert_without_partitioned_by(spark, ins_reg, tmp_path):
    # testInsertWithoutPartitionedBy
    with pytest.raises(ValueError,
                       match="must specify PARTITIONED BY clause"):
        _run(spark, ins_reg, tmp_path, "INSERT INTO dst SELECT * FROM foo")


def test_upsert_not_supported(spark, ins_reg, tmp_path):
    # testUpsert
    with pytest.raises(ValueError, match="UPSERT is not supported"):
        _run(spark, ins_reg, tmp_path,
             "UPSERT INTO dst SELECT * FROM foo PARTITIONED BY ALL TIME")


def test_insert_with_column_list(spark, ins_reg, tmp_path):
    # testInsertUsingColumnList
    with pytest.raises(ValueError, match="target column list"):
        _run(spark, ins_reg, tmp_path,
             "INSERT INTO dst (foo, bar) SELECT dim1, m1 FROM foo "
             "PARTITIONED BY ALL TIME")


def test_insert_invalid_datasource_name(spark, ins_reg, tmp_path):
    # testInsertIntoInvalidDataSourceName
    with pytest.raises(ValueError, match="cannot contain the '/'"):
        _run(spark, ins_reg, tmp_path,
             'INSERT INTO "in/valid" SELECT dim1 FROM foo '
             "PARTITIONED BY ALL TIME")


@pytest.mark.parametrize("target", [
    "INFORMATION_SCHEMA.COLUMNS",   # testInsertIntoSystemTable
    "view.aview",                   # testInsertIntoView
    "nonexistent.dst",              # testInsertIntoNonexistentSchema
])
def test_insert_into_non_druid_schema(spark, ins_reg, tmp_path, target):
    with pytest.raises(ValueError,
                       match="not a Druid datasource"):
        _run(spark, ins_reg, tmp_path,
             f"INSERT INTO {target} SELECT * FROM foo "
             f"PARTITIONED BY ALL TIME")


def test_insert_invalid_granularity(spark, ins_reg, tmp_path):
    # testInsertWithPartitionedByContainingInvalidGranularity
    with pytest.raises(ValueError,
                       match="after PARTITIONED BY. Expected HOUR, DAY"):
        _run(spark, ins_reg, tmp_path,
             "INSERT INTO dst SELECT * FROM foo "
             "PARTITIONED BY 'invalid_granularity'")


def test_insert_with_order_by(spark, ins_reg, tmp_path):
    # testInsertWithOrderBy / testInsertWithClusteredByAndOrderBy
    with pytest.raises(ValueError,
                       match="Cannot have ORDER BY on an INSERT"):
        _run(spark, ins_reg, tmp_path,
             "INSERT INTO dst SELECT * FROM foo ORDER BY 2 "
             "PARTITIONED BY ALL TIME")


def test_partitioned_by_supported_clauses():
    # testPartitionedBySupportedClauses — every accepted spelling
    # parses to its granularity
    cases = {
        "HOUR": "hour", "DAY": "day", "MONTH": "month", "YEAR": "year",
        "ALL": "all", "ALL TIME": "all",
        "FLOOR(__time TO QUARTER)": "quarter",
        "TIME_FLOOR(__time, 'PT1H')": "hour",
    }
    for clause, gran in cases.items():
        spec = parse_insert(
            f"INSERT INTO druid.dst SELECT __time, dim1 FROM foo "
            f"PARTITIONED BY {clause}")
        assert spec is not None, clause
        assert spec["granularity"] == gran, clause
        validate_insert(
            f"INSERT INTO druid.dst SELECT __time, dim1 FROM foo "
            f"PARTITIONED BY {clause}")


def test_insert_happy_path_still_works(spark, ins_reg, tmp_path):
    # testInsertFromTable — the happy path is untouched by the new
    # validation
    out = _run(spark, ins_reg, tmp_path,
               "INSERT INTO dst SELECT * FROM foo PARTITIONED BY DAY")
    assert out.count() == 2


def test_insert_with_limit_offset_allowed(spark, ins_reg, tmp_path):
    # testInsertWithPartitionedByAndLimitOffset — LIMIT/OFFSET are
    # legal on INSERT (only ORDER BY is rejected)
    out = _run(spark, ins_reg, tmp_path,
               "INSERT INTO dst2 SELECT __time, dim1 FROM foo "
               "LIMIT 10 PARTITIONED BY DAY")
    assert out.count() == 2


def test_validate_noop_for_select():
    # non-INSERT text passes through untouched
    validate_insert("SELECT * FROM foo ORDER BY 1")


def test_insert_from_view(spark, ins_reg, tmp_path):
    # testInsertFromView: the SELECT reads a registered view and has
    # NO __time — legal under PARTITIONED BY ALL TIME (the target
    # signature in the reference is just dim1_firstchar; the missing
    # timestamp defaults to epoch 0)
    out = _run(spark, ins_reg, tmp_path,
               "INSERT INTO dst_v SELECT * FROM view.aview "
               "PARTITIONED BY ALL TIME")
    rows = out.collect()
    assert [(r["dim1_firstchar"]) for r in rows] == ["a"]
    assert rows[0]["__time"] == datetime(1970, 1, 1)


def test_insert_into_existing_table(spark, ins_reg, tmp_path):
    # testInsertIntoExistingTable: INSERT appends to a datasource that
    # already exists (here: the registered source itself)
    first = _run(spark, ins_reg, tmp_path,
                 "INSERT INTO dst_e SELECT * FROM foo "
                 "PARTITIONED BY ALL TIME")
    assert first.count() == 2
    again = _run(spark, ins_reg, tmp_path,
                 "INSERT INTO dst_e SELECT * FROM foo "
                 "PARTITIONED BY ALL TIME")
    assert again.count() == 4    # INSERT semantics append


def test_insert_with_partitioned_by_only(spark, ins_reg, tmp_path):
    # testInsertWithPartitionedBy (r14): only the PARTITIONED BY
    # clause — TIME_FLOOR(__time, 'PT1H') granularity, projected
    # floor_m1, no clustering
    out = _run(spark, ins_reg, tmp_path,
               "INSERT INTO dst_p SELECT __time, FLOOR(m1) AS"
               " floor_m1, dim1 FROM foo"
               " PARTITIONED BY TIME_FLOOR(__time, 'PT1H')")
    got = sorted((float(r["floor_m1"]), r["dim1"])
                 for r in out.collect())
    assert got == [(1.0, "xy"), (2.0, "ab")]
    assert set(out.columns) >= {"__time", "floor_m1", "dim1"}


def test_insert_with_clustered_by_only(spark, ins_reg, tmp_path):
    # testInsertWithClusteredBy (r14): CLUSTERED BY mixes an ordinal
    # (2 -> floor_m1), a DESC name, and an expression duplicated from
    # the projection (CEIL(m2) -> the auto-named 4th column)
    reg = ins_reg
    reg.register("foo2", spark.createDataFrame(
        [(datetime(2000, 1, 1), "xy", 1.0, 1.2),
         (datetime(2000, 1, 2), "ab", 2.0, 2.7)],
        "__time timestamp, dim1 string, m1 double, m2 double"))
    out = _run(spark, reg, tmp_path,
               "INSERT INTO dst_cl SELECT __time, FLOOR(m1) AS"
               " floor_m1, dim1, CEIL(m2) AS ceil_m2 FROM foo2"
               " PARTITIONED BY FLOOR(__time TO DAY)"
               " CLUSTERED BY 2, dim1 DESC, ceil_m2")
    got = sorted((float(r["floor_m1"]), r["dim1"], float(r["ceil_m2"]))
                 for r in out.collect())
    assert got == [(1.0, "xy", 2.0), (2.0, "ab", 3.0)]


def test_insert_with_partitioned_by_and_clustered_by(spark, ins_reg,
                                                     tmp_path):
    # testInsertWithPartitionedByAndClusteredBy: CLUSTERED BY resolves
    # output-column ORDINALS (2 -> floor_m1) alongside names
    out = _run(spark, ins_reg, tmp_path,
               "INSERT INTO dst_c SELECT __time, FLOOR(m1) AS floor_m1,"
               " dim1 FROM foo PARTITIONED BY DAY CLUSTERED BY 2, dim1")
    got = sorted((float(r["floor_m1"]), r["dim1"])
                 for r in out.collect())
    assert got == [(1.0, "xy"), (2.0, "ab")]


# Enumerated remainder of CalciteInsertDmlTest (6 methods, with
# reason — 23/29 ported across this module and tests/test_sql_insert.py;
# r14 closed testInsertWithPartitionedBy and testInsertWithClusteredBy,
# whose DESC direction token drove the CLUSTERED BY ordering fix in
# sql/insert.py):
# - testInsertFromUnauthorizedDataSource,
#   testInsertIntoUnauthorizedDataSource, testInsertFromExternalUnauthorized,
#   testExplainInsertFromExternalUnauthorized: authorization-layer
#   contracts (Druid's Resource/Action ACLs) — out of scope per
#   SURVEY, same bucket as testSelectStarOnForbiddenTable.
# - testInsertWithInvalidSelectStatement pins Calcite's parser
#   rejecting `added as count` (COUNT is reserved in Calcite); Spark's
#   parser accepts `count` as an alias, so there is no equivalent
#   parse failure to pin — documented lenient divergence.
# - testExplainInsertFromExternal pins the native-plan JSON of an
#   EXPLAIN on INSERT, same bucket as testExplainSelectStar.
# testInsertFromExternal{,ProjectSort,Aggregate,AggregateAll} are
# pinned in tests/test_sql_insert.py (the EXTERN end-to-end family).
