"""Golden tests ported from the reference's CalciteJoinQueryTest.java
(sql/src/test/java/org/apache/druid/sql/calcite/) — joins between the
`foo` fixture (CalciteTests DATASOURCE1) and the `lookyloo` lookup
through the SQL `lookup` schema. Expected rows are the SQL-compatible
null mode branch.

`foo` is registered in post-ingest presentation: dim2's single-value
MV rows read as scalar strings and the empty MV row reads as null
(CalciteTests.java:417-464 RAW_ROWS1; multi-value-dimensions.md single
value presents as scalar).
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import types as T

from apache_druid_spark.model.datasource import DatasourceRegistry
from apache_druid_spark.sql.dialect import druid_sql

SCHEMA = T.StructType([
    T.StructField("__time", T.TimestampType()),
    T.StructField("dim1", T.StringType()),
    T.StructField("dim2", T.StringType()),
    T.StructField("cnt", T.LongType()),
    T.StructField("m1", T.FloatType()),
])

ROWS = [
    (datetime(2000, 1, 1), "", "a", 1, 1.0),
    (datetime(2000, 1, 2), "10.1", None, 1, 2.0),
    (datetime(2000, 1, 3), "2", "", 1, 3.0),
    (datetime(2001, 1, 1), "1", "a", 1, 4.0),
    (datetime(2001, 1, 2), "def", "abc", 1, 5.0),
    (datetime(2001, 1, 3), "abc", None, 1, 6.0),
]

LOOKYLOO = {"a": "xa", "abc": "xabc", "nosuchkey": "mysteryvalue",
            "6": "x6"}


@pytest.fixture(scope="module")
def reg(spark):
    r = DatasourceRegistry(spark)
    r.register("foo", spark.createDataFrame(ROWS, SCHEMA))
    r.register_lookup("lookyloo", LOOKYLOO)
    return r


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_filter_and_group_by_lookup_join(spark, reg):
    # testFilterAndGroupByLookupUsingJoinOperator
    out = druid_sql(spark, """
        SELECT lookyloo.k AS k, COUNT(*) AS n
        FROM foo LEFT JOIN lookup.lookyloo ON foo.dim2 = lookyloo.k
        WHERE lookyloo.v = 'xa'
        GROUP BY lookyloo.k
    """, reg).collect()
    assert [(r.k, r.n) for r in out] == [("a", 2)]


def test_post_aggregation_lookup_join(spark, reg):
    # testFilterAndGroupByLookupUsingPostAggregationJoinOperator —
    # join applied AFTER the inner aggregation
    out = druid_sql(spark, """
        SELECT base.dim2 AS dim2, lookyloo.v AS v, base.cnt AS cnt
        FROM (
          SELECT dim2, COUNT(*) cnt FROM foo GROUP BY dim2
        ) base
        LEFT JOIN lookup.lookyloo ON base.dim2 = lookyloo.k
        WHERE lookyloo.v <> 'xa' OR lookyloo.v IS NULL
    """, reg)
    assert _rows(out.selectExpr(
        "coalesce(dim2, '<null>') AS dim2", "v", "cnt")) == sorted([
            ("<null>", None, 2), ("", None, 1), ("abc", "xabc", 1)])


def test_group_by_inner_join_lookup(spark, reg):
    # testGroupByInnerJoinOnLookupUsingJoinOperator
    out = druid_sql(spark, """
        SELECT lookyloo.v AS v, COUNT(*) AS n
        FROM foo INNER JOIN lookup.lookyloo ON foo.dim1 = lookyloo.k
        GROUP BY lookyloo.v
    """, reg).collect()
    assert [(r.v, r.n) for r in out] == [("xabc", 1)]


def test_select_inner_join_lookup(spark, reg):
    # testSelectOnLookupUsingInnerJoinOperator — qualified star
    out = druid_sql(spark, """
        SELECT dim2, lookyloo.*
        FROM foo INNER JOIN lookup.lookyloo ON foo.dim2 = lookyloo.k
    """, reg)
    assert _rows(out) == sorted([
        ("a", "a", "xa"), ("a", "a", "xa"), ("abc", "abc", "xabc")])


def test_left_join_two_lookups(spark, reg):
    # testLeftJoinTwoLookupsUsingJoinOperator — same lookup joined
    # twice under different aliases
    out = druid_sql(spark, """
        SELECT dim1, dim2, l1.v AS v1, l2.v AS v2
        FROM foo
        LEFT JOIN lookup.lookyloo l1 ON foo.dim1 = l1.k
        LEFT JOIN lookup.lookyloo l2 ON foo.dim2 = l2.k
    """, reg)
    assert _rows(out.selectExpr("dim1", "coalesce(dim2,'<n>') dim2",
                                "v1", "v2")) == sorted([
        ("", "a", None, "xa"),
        ("10.1", "<n>", None, None),
        ("2", "", None, None),
        ("1", "a", None, "xa"),
        ("def", "abc", None, "xabc"),
        ("abc", "<n>", "xabc", None)])


def test_select_left_join_lookup(spark, reg):
    # testSelectOnLookupUsingLeftJoinOperator
    out = druid_sql(spark, """
        SELECT dim1, lookyloo.*
        FROM foo LEFT JOIN lookup.lookyloo ON foo.dim1 = lookyloo.k
        WHERE lookyloo.v <> 'xxx' OR lookyloo.v IS NULL
    """, reg)
    assert _rows(out) == sorted([
        ("", None, None), ("10.1", None, None), ("2", None, None),
        ("1", None, None), ("def", None, None), ("abc", "abc", "xabc")])


def test_select_right_join_lookup(spark, reg):
    # testSelectOnLookupUsingRightJoinOperator — unmatched lookup rows
    # survive with null left side
    out = druid_sql(spark, """
        SELECT dim1, lookyloo.*
        FROM foo RIGHT JOIN lookup.lookyloo ON foo.dim1 = lookyloo.k
        WHERE lookyloo.v <> 'xxx' OR lookyloo.v IS NULL
    """, reg)
    assert _rows(out.selectExpr("coalesce(dim1,'<n>') dim1", "k", "v")
                 ) == sorted([
        ("abc", "abc", "xabc"), ("<n>", "a", "xa"),
        ("<n>", "nosuchkey", "mysteryvalue"), ("<n>", "6", "x6")])


def test_select_full_join_lookup(spark, reg):
    # testSelectOnLookupUsingFullJoinOperator
    out = druid_sql(spark, """
        SELECT dim1, m1, cnt, lookyloo.*
        FROM foo FULL JOIN lookup.lookyloo ON foo.dim1 = lookyloo.k
        WHERE lookyloo.v <> 'xxx' OR lookyloo.v IS NULL
    """, reg)
    got = _rows(out.selectExpr("coalesce(dim1,'<n>') dim1", "m1", "cnt",
                               "k", "v"))
    assert got == sorted([
        ("", 1.0, 1, None, None), ("10.1", 2.0, 1, None, None),
        ("2", 3.0, 1, None, None), ("1", 4.0, 1, None, None),
        ("def", 5.0, 1, None, None), ("abc", 6.0, 1, "abc", "xabc"),
        ("<n>", None, None, "a", "xa"),
        ("<n>", None, None, "nosuchkey", "mysteryvalue"),
        ("<n>", None, None, "6", "x6")])


def test_in_aggregation_subquery(spark, reg):
    # testInAggregationSubquery — IN over an aggregate subquery plans
    # as a join against the single-row aggregate
    out = druid_sql(spark, """
        SELECT DISTINCT __time FROM foo
        WHERE __time IN (SELECT MAX(__time) FROM foo)
    """, reg).collect()
    assert [r["__time"] for r in out] == [datetime(2001, 1, 3)]


def test_not_in_aggregation_subquery(spark, reg):
    # testNotInAggregationSubquery
    out = druid_sql(spark, """
        SELECT DISTINCT __time FROM foo
        WHERE __time NOT IN (SELECT MAX(__time) FROM foo)
    """, reg)
    assert sorted(r["__time"] for r in out.collect()) == [
        datetime(2000, 1, 1), datetime(2000, 1, 2), datetime(2000, 1, 3),
        datetime(2001, 1, 1), datetime(2001, 1, 2)]


def test_lookup_schema_qualified_column_ref(spark, reg):
    # lookup.lookyloo.v — fully-qualified column through the schema
    out = druid_sql(spark, """
        SELECT lookup.lookyloo.v AS v
        FROM foo INNER JOIN lookup.lookyloo
          ON foo.dim1 = lookup.lookyloo.k
    """, reg).collect()
    assert [r.v for r in out] == ["xabc"]


def test_inner_join_cast_left(spark, reg):
    # testInnerJoinCastLeft — CAST(6.0f AS VARCHAR) is '6.0', never
    # equal to the lookup key '6': empty result
    out = druid_sql(spark, """
        SELECT foo.m1, l.k, l.v
        FROM foo INNER JOIN lookup.lookyloo l
          ON CAST(foo.m1 AS VARCHAR) = l.k
    """, reg).collect()
    assert out == []


def test_inner_join_cast_right(spark, reg):
    # testInnerJoinCastRight — casting the lookup key to FLOAT nulls
    # the non-numeric keys (never throws) and matches m1 = 6.0
    out = druid_sql(spark, """
        SELECT foo.m1, l.k, l.v
        FROM foo INNER JOIN lookup.lookyloo l
          ON foo.m1 = CAST(l.k AS FLOAT)
    """, reg).collect()
    assert [(r.m1, r.k, r.v) for r in out] == [(6.0, "6", "x6")]


def test_non_equi_lookup_join_superset(spark, reg):
    """The reference REJECTS joins with a NOT_EQUALS condition
    (CalciteJoinQueryTest asserts 'SQL requires a join with NOT_EQUALS
    condition that is not supported'); this engine supports them as a
    documented superset (broadcast nested-loop). 13 pairs: the two 'a'
    rows and the 'abc' row each mismatch 3 keys, the '' row all 4;
    null dim2 rows never match a <> condition."""
    out = druid_sql(spark, """
        SELECT COUNT(*) AS n
        FROM foo INNER JOIN lookup.lookyloo l ON foo.dim2 <> l.k
    """, reg).first()
    assert out["n"] == 13
