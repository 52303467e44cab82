"""Golden Avatica wire transcripts (VERDICT r4 #5).

A canned JDBC-client session — connect -> prepare -> execute ->
fetch x2 -> closeStatement -> closeConnection, plus the metadata RPCs a
driver fires on connect (databaseProperty, getSchemas, getColumns on a
lookup table) — with the FULL expected JSON response pinned for every
exchange, so any protocol drift (field renames, frame paging changes,
type-rep changes) fails loudly rather than silently breaking real JDBC
clients.

Reference behavior: sql/src/main/java/org/apache/druid/sql/avatica/
DruidMeta.java (request semantics) + Apache Calcite Avatica's public
JSON RPC reference (calcite.apache.org/avatica/docs/json_reference.html
— field names and response envelopes).
"""

from __future__ import annotations

import json

import pytest

from apache_druid_spark.model.datasource import DatasourceRegistry
from apache_druid_spark.server.avatica import AvaticaMeta


def _col(ordinal: int, name: str, tid: int, tname: str, rep: str) -> dict:
    """The exact _column_meta envelope, spelled out literally so a
    change to the wire shape breaks the golden comparison."""
    return {
        "ordinal": ordinal, "autoIncrement": False, "caseSensitive": True,
        "searchable": True, "currency": False, "nullable": 1,
        "signed": tid in (-6, -5, 3, 4, 5, 6, 8),
        "displaySize": 40, "label": name, "columnName": name,
        "schemaName": "", "precision": 0, "scale": 0, "tableName": "",
        "catalogName": "",
        "type": {"type": "scalar", "id": tid, "name": tname, "rep": rep},
        "readOnly": True, "writable": False, "definitelyWritable": False,
        "columnClassName": "java.lang.Object",
    }


def _sig(columns: list[dict], sql: str, parameters: list[dict]) -> dict:
    return {"columns": columns, "sql": sql, "parameters": parameters,
            "cursorFactory": {"style": "LIST", "clazz": None},
            "statementType": "SELECT"}


@pytest.fixture(scope="module")
def meta(spark):
    reg = DatasourceRegistry(spark)
    reg.register("t", spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma"), (4, "delta"),
         (5, "epsilon")],
        "id long, name string"))
    reg.register_lookup("lookyloo", {"a": "xa", "abc": "xabc"})
    # frame_max_rows=2 so the 5-row result pages across execute + 2 fetches
    return AvaticaMeta(spark, reg, frame_max_rows=2)


PREPARED_SQL = "SELECT id, name FROM t WHERE id > ? ORDER BY id"
# per-position inferred type (r6 task #8): `id > ?` compares against
# the BIGINT column, so the parameter meta is BIGINT (DruidMeta
# reports Calcite-inferred SqlDynamicParam types)
PARAM_META = [{"signed": True, "precision": 0, "scale": 0,
               "parameterType": -5, "typeName": "BIGINT",
               "className": "java.lang.Long", "name": "?0"}]
RESULT_COLUMNS = [
    _col(0, "id", -5, "BIGINT", "PRIMITIVE_LONG"),
    _col(1, "name", 12, "VARCHAR", "STRING"),
]

# the canned session: (request, exact expected response) in protocol
# order. Statement ids are deterministic (fresh AvaticaMeta counts from
# 1); rows are deterministic (ORDER BY id).
TRANSCRIPT = [
    (
        {"request": "openConnection", "connectionId": "jdbc-1"},
        {"response": "openConnection", "connectionId": "jdbc-1"},
    ),
    (
        {"request": "prepare", "connectionId": "jdbc-1",
         "sql": PREPARED_SQL, "maxRowCount": -1},
        {"response": "prepare",
         "statement": {"connectionId": "jdbc-1", "id": 1,
                       "signature": _sig(RESULT_COLUMNS, PREPARED_SQL,
                                         PARAM_META)}},
    ),
    (
        {"request": "execute",
         "statementHandle": {"connectionId": "jdbc-1", "id": 1,
                             "signature": None},
         "parameterValues": [{"type": "LONG", "value": 0}],
         "maxRowCount": -1},
        {"response": "executeResults", "missingStatement": False,
         "results": [{
             "response": "resultSet", "connectionId": "jdbc-1",
             "statementId": 1, "ownStatement": True,
             "signature": _sig(RESULT_COLUMNS,
                               "SELECT id, name FROM t WHERE id > 0 "
                               "ORDER BY id", []),
             "firstFrame": {"offset": 0, "done": False,
                            "rows": [[1, "alpha"], [2, "beta"]]},
             "updateCount": -1}]},
    ),
    (
        {"request": "fetch", "connectionId": "jdbc-1", "statementId": 1,
         "offset": 2, "fetchMaxRowCount": 2},
        {"response": "fetch", "connectionId": "jdbc-1", "statementId": 1,
         "frame": {"offset": 2, "done": False,
                   "rows": [[3, "gamma"], [4, "delta"]]}},
    ),
    (
        {"request": "fetch", "connectionId": "jdbc-1", "statementId": 1,
         "offset": 4, "fetchMaxRowCount": 2},
        {"response": "fetch", "connectionId": "jdbc-1", "statementId": 1,
         "frame": {"offset": 4, "done": True,
                   "rows": [[5, "epsilon"]]}},
    ),
    (
        {"request": "closeStatement", "connectionId": "jdbc-1",
         "statementId": 1},
        {"response": "closeStatement", "connectionId": "jdbc-1",
         "statementId": 1},
    ),
    (
        {"request": "closeConnection", "connectionId": "jdbc-1"},
        {"response": "closeConnection", "connectionId": "jdbc-1"},
    ),
]


def test_prepared_session_transcript(meta):
    """The full prepare/execute/fetch/close exchange, every response
    compared byte-for-byte (after JSON round-trip canonicalization)."""
    for i, (req, expected) in enumerate(TRANSCRIPT):
        got = meta.handle(dict(req))
        assert json.loads(json.dumps(got)) == expected, (
            f"exchange {i} ({req['request']}) drifted")


def test_fetch_after_close_errors(meta):
    """DruidMeta: fetching a closed statement is a protocol error, not
    a crash."""
    got = meta.handle({"request": "fetch", "connectionId": "jdbc-1",
                       "statementId": 1, "offset": 0,
                       "fetchMaxRowCount": 2})
    assert got["response"] == "error"


METADATA_TRANSCRIPT = [
    (
        {"request": "databaseProperty", "connectionId": "jdbc-2"},
        {"response": "databaseProperty", "map": [
            {"key": {"name": "GET_S_S_NAME"}, "value": "druid-on-spark"},
            {"key": {"name": "GET_S_S_VERSION"}, "value": "1.0"},
            {"key": {"name": "GET_DRIVER_NAME"},
             "value": "apache_druid_spark avatica json"},
            {"key": {"name": "GET_DRIVER_VERSION"}, "value": "1.0"},
        ]},
    ),
    (
        {"request": "getSchemas", "connectionId": "jdbc-2"},
        None,  # row payload checked structurally below
    ),
]


def test_metadata_rpcs_and_lookup_columns(meta):
    meta.handle({"request": "openConnection", "connectionId": "jdbc-2"})
    got = meta.handle(METADATA_TRANSCRIPT[0][0])
    assert json.loads(json.dumps(got)) == METADATA_TRANSCRIPT[0][1]

    schemas = meta.handle(METADATA_TRANSCRIPT[1][0])
    assert schemas["firstFrame"]["rows"] == [
        ["druid", "druid"], ["INFORMATION_SCHEMA", "druid"],
        ["lookup", "druid"], ["sys", "druid"]]

    tables = meta.handle({"request": "getTables", "connectionId": "jdbc-2"})
    assert tables["firstFrame"]["rows"] == [
        ["druid", "druid", "t", "TABLE", None],
        ["druid", "lookup", "lookyloo", "TABLE", None]]

    # getColumns on a lookup table: the (k, v) signature of the
    # reference's LookupSchema
    cols = meta.handle({"request": "getColumns", "connectionId": "jdbc-2",
                        "schemaPattern": "lookup",
                        "tableNamePattern": "lookyloo"})
    assert cols["firstFrame"]["rows"] == [
        ["druid", "lookup", "lookyloo", "k", "12", "VARCHAR", "1"],
        ["druid", "lookup", "lookyloo", "v", "12", "VARCHAR", "2"]]
    meta.handle({"request": "closeConnection", "connectionId": "jdbc-2"})


def test_mixed_parameter_types_per_position(meta):
    """VERDICT r6 task #8: a (string, long) parameter pair reports
    per-position JDBC types at prepare — the old probe typed every
    position VARCHAR-or-BIGINT together. Reference: DruidMeta reports
    Calcite-inferred SqlDynamicParam types per position."""
    resp = meta.handle({
        "request": "prepare", "connectionId": "jdbc-mixed",
        "sql": "SELECT id FROM t WHERE name = ? AND id > ? LIMIT ?",
        "maxRowCount": -1})
    params = resp["statement"]["signature"]["parameters"]
    assert [p["typeName"] for p in params] == ["VARCHAR", "BIGINT",
                                               "BIGINT"]
    assert [p["parameterType"] for p in params] == [12, -5, -5]
    assert [p["className"] for p in params] == [
        "java.lang.String", "java.lang.Long", "java.lang.Long"]
    # prepare-time column metadata analyzed through the typed probe
    cols = resp["statement"]["signature"]["columns"]
    assert [c["columnName"] for c in cols] == ["id"]
    # reversed comparison and qualified column resolve too
    resp2 = meta.handle({
        "request": "prepare", "connectionId": "jdbc-mixed",
        "sql": "SELECT name FROM t WHERE ? < t.id AND ? = name",
        "maxRowCount": -1})
    params2 = resp2["statement"]["signature"]["parameters"]
    assert [p["typeName"] for p in params2] == ["BIGINT", "VARCHAR"]
