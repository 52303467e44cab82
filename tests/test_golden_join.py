"""Golden tests ported from the reference's CalciteJoinQueryTest.java
(sql/src/test/java/org/apache/druid/sql/calcite/) — joins between the
`foo` fixture (CalciteTests DATASOURCE1) and the `lookyloo` lookup
through the SQL `lookup` schema. Expected rows are the SQL-compatible
null mode branch.

`foo` is registered in post-ingest presentation: dim2's single-value
MV rows read as scalar strings and the empty MV row reads as null
(CalciteTests.java:417-464 RAW_ROWS1; multi-value-dimensions.md single
value presents as scalar). dim3 keeps its MV (array) form.

Coverage after r15: 86/88 methods ported, remainder 2 — every name
enumerated with reasons at the "r13 closures" section below:
testInnerJoinOnMultiValueColumn is @Ignore upstream, and
testInnerJoinQueryOfLookup (found unaccounted in the r14 recount —
the earlier "85" overcounted by one) pins LATEST-over-a-time-less-
lookup native cursor-order semantics. The two AllColumns twins were
UN-SKIPPED in r15: ingest/hllc.py reproduces the reference
HyperLogLogCollector's pinned base64 wire bytes from first principles
(bit-exact collector replica, see tests/test_hllc.py).
Grep-verifiable: 86 + 2 = 88.
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
    T.StructField("dim3", T.ArrayType(T.StringType())),
    T.StructField("cnt", T.LongType()),
    T.StructField("m1", T.FloatType()),
    T.StructField("m2", T.DoubleType()),
])

# dim3 per RAW_ROWS1 (CalciteTests.java:424-456): ["a","b"], ["b","c"],
# ["d"], [""], then empty-MV and absent — both present as null
ROWS = [
    (datetime(2000, 1, 1), "", "a", ["a", "b"], 1, 1.0, 1.0),
    (datetime(2000, 1, 2), "10.1", None, ["b", "c"], 1, 2.0, 2.0),
    (datetime(2000, 1, 3), "2", "", ["d"], 1, 3.0, 3.0),
    (datetime(2001, 1, 1), "1", "a", [""], 1, 4.0, 4.0),
    (datetime(2001, 1, 2), "def", "abc", None, 1, 5.0, 5.0),
    (datetime(2001, 1, 3), "abc", None, None, 1, 6.0, 6.0),
]

# numfoo (DATASOURCE3, CalciteTests RAW_ROWS1_WITH_NUMERIC_DIMS): same
# six rows/times as foo plus dim4/dim5 string dims and nullable
# numeric dims (the columns this tranche touches)
NUMFOO_SCHEMA = T.StructType([
    T.StructField("__time", T.TimestampType()),
    T.StructField("dim1", T.StringType()),
    T.StructField("dim2", T.StringType()),
    T.StructField("dim3", T.ArrayType(T.StringType())),
    T.StructField("dim4", T.StringType()),
    T.StructField("dim5", T.StringType()),
    T.StructField("cnt", T.LongType()),
    T.StructField("m1", T.FloatType()),
    T.StructField("d1", T.DoubleType()),
    T.StructField("l1", T.LongType()),
])

NUMFOO_ROWS = [
    (datetime(2000, 1, 1), "", "a", ["a", "b"], "a", "aa",
     1, 1.0, 1.0, 7),
    (datetime(2000, 1, 2), "10.1", None, ["b", "c"], "a", "ab",
     1, 2.0, 1.7, 325323),
    (datetime(2000, 1, 3), "2", "", ["d"], "a", "ba",
     1, 3.0, 0.0, 0),
    (datetime(2001, 1, 1), "1", "a", [""], "b", "ad",
     1, 4.0, None, None),
    (datetime(2001, 1, 2), "def", "abc", None, "b", "aa",
     1, 5.0, None, None),
    (datetime(2001, 1, 3), "abc", None, None, "b", "ab",
     1, 6.0, None, None),
]

LOOKYLOO = {"a": "xa", "abc": "xabc", "nosuchkey": "mysteryvalue",
            "6": "x6"}


@pytest.fixture(scope="module")
def reg(spark):
    r = DatasourceRegistry(spark)
    r.register("foo", spark.createDataFrame(ROWS, SCHEMA))
    numfoo = spark.createDataFrame(NUMFOO_ROWS, NUMFOO_SCHEMA)
    r.register("numfoo", numfoo)
    # BROADCAST_DATASOURCE: the same numfoo rows registered as a
    # global/broadcast table (CalciteTests.BROADCAST_DATASOURCE)
    r.register("broadcast", numfoo)
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


# ---------------------------------------------------------------------------
# Round-5 tranche (VERDICT r4 #2): join-on-lookup-miss,
# left-join-null-propagation, and join-over-subquery-limit families.
#
# Null-semantics note, recorded once for the whole tranche: several
# reference cases filter a LEFT-joined lookup value with a bare
# `v <> 'xa'` and still expect the NULL group — the legacy native
# NotDimFilter matches nulls even in SQL-compatible null handling.
# This engine (like later reference versions with ANSI three-valued
# logic) drops NULLs under bare `<>`; those cases are ported with the
# explicit `OR v IS NULL` disjunct the reference's own "AllowNulls"
# variant uses, preserving the intended rows under ANSI semantics.
# ---------------------------------------------------------------------------


def test_lookup_value_filter_pushdown_matches_nothing(spark, reg):
    # testFilterAndGroupByLookupUsingJoinOperatorWithValueFilterPushdownMatchesNothig
    out = druid_sql(spark, """
        SELECT lookyloo.k AS k, COUNT(*) AS n
        FROM foo LEFT JOIN lookup.lookyloo ON foo.dim2 = lookyloo.k
        WHERE lookyloo.v = '123'
        GROUP BY lookyloo.k
    """, reg).collect()
    assert out == []


def test_lookup_filter_allow_nulls(spark, reg):
    # testFilterAndGroupByLookupUsingJoinOperatorAllowNulls
    out = druid_sql(spark, """
        SELECT lookyloo.v AS v, COUNT(*) AS n
        FROM foo LEFT JOIN lookup.lookyloo ON foo.dim2 = lookyloo.k
        WHERE lookyloo.v <> 'xa' OR lookyloo.v IS NULL
        GROUP BY lookyloo.v
    """, reg)
    assert _rows(out.selectExpr("coalesce(v,'<n>') v", "n")) == sorted(
        [("<n>", 3), ("xabc", 1)])


def test_lookup_filter_backwards_right_join(spark, reg):
    # testFilterAndGroupByLookupUsingJoinOperatorBackwards — lookup on
    # the left, RIGHT JOIN back onto foo (see tranche null note)
    out = druid_sql(spark, """
        SELECT lookyloo.v AS v, COUNT(*) AS n
        FROM lookup.lookyloo RIGHT JOIN foo ON foo.dim2 = lookyloo.k
        WHERE lookyloo.v <> 'xa' OR lookyloo.v IS NULL
        GROUP BY lookyloo.v
    """, reg)
    assert _rows(out.selectExpr("coalesce(v,'<n>') v", "n")) == sorted(
        [("<n>", 3), ("xabc", 1)])


def test_join_union_tables_on_lookup(spark, reg):
    # testJoinUnionTablesOnLookup — UNION ALL of two datasources as the
    # join's left side (see tranche null note)
    out = druid_sql(spark, """
        SELECT lookyloo.v AS v, COUNT(*) AS n
        FROM
          (SELECT dim2 FROM foo UNION ALL SELECT dim2 FROM numfoo) u
          LEFT JOIN lookup.lookyloo ON u.dim2 = lookyloo.k
        WHERE lookyloo.v <> 'xa' OR lookyloo.v IS NULL
        GROUP BY lookyloo.v
    """, reg)
    assert _rows(out.selectExpr("coalesce(v,'<n>') v", "n")) == sorted(
        [("<n>", 6), ("xabc", 2)])


def test_table_lookup_lookup_filter_outer_limit(spark, reg):
    # testInnerJoinTableLookupLookupWithFilterWithOuterLimit
    out = druid_sql(spark, """
        SELECT dim1
        FROM foo
        INNER JOIN lookup.lookyloo l ON foo.dim2 = l.k
        INNER JOIN lookup.lookyloo l2 ON foo.dim2 = l2.k
        WHERE l.v = 'xa'
        LIMIT 100
    """, reg)
    assert _rows(out) == sorted([("",), ("1",)])


def test_table_lookup_lookup_filter_no_limit(spark, reg):
    # testInnerJoinTableLookupLookupWithFilterWithoutLimit
    out = druid_sql(spark, """
        SELECT dim1
        FROM foo
        INNER JOIN lookup.lookyloo l ON foo.dim2 = l.k
        INNER JOIN lookup.lookyloo l2 ON foo.dim2 = l2.k
        WHERE l.v = 'xa'
    """, reg)
    assert _rows(out) == sorted([("",), ("1",)])


@pytest.fixture(scope="module")
def reg_hllc(spark, reg):
    """foo with its `unique_dim1` COMPLEX metric — the per-row
    ingest-time hyperUnique collector of dim1 that CalciteTests
    DATASOURCE1 carries. Stored in scan PRESENTATION form: the
    reference's scan serializes a HyperLogLogCollector via its
    @JsonValue base64, so the cell value is the JSON-quoted base64
    string (the AllColumns tests pin exactly that rendering). The
    bytes are REAL legacy wire state from ingest/hllc.py — bit-exact
    against the reference collector (tests/test_hllc.py replicates
    HyperLogLogCollectorTest.testEstimation's 13 pinned doubles)."""
    import base64

    from apache_druid_spark.ingest.hllc import collector_of

    rows = [r + ('"' + base64.b64encode(
        collector_of([r[1]]).to_bytes()).decode() + '"',)
        for r in ROWS]
    schema = T.StructType(
        SCHEMA.fields + [T.StructField("unique_dim1", T.StringType())])
    reg.register("foo_hllc", spark.createDataFrame(rows, schema))
    return reg


_ALL_COLUMNS_SQL = """
    SELECT CAST(__time AS BIGINT) AS t, cnt, dim1, dim2, dim3, m1, m2,
           unique_dim1
    FROM foo_hllc
    INNER JOIN lookup.lookyloo l ON foo_hllc.dim2 = l.k
    INNER JOIN lookup.lookyloo l2 ON foo_hllc.dim2 = l2.k
    WHERE l.v = 'xa'
"""

# the reference's expected rows (CalciteJoinQueryTest.java:1126,1168);
# dim3 in this suite's MV presentation (reference prints the strings)
_ALL_COLUMNS_EXPECTED = sorted([
    (946684800000, 1, "", "a", ("a", "b"), 1.0, 1.0, '"AQAAAEAAAA=="'),
    (978307200000, 1, "1", "a", ("",), 4.0, 4.0, '"AQAAAQAAAAFREA=="'),
])


def _all_columns_rows(out):
    return sorted(
        tuple(tuple(v) if isinstance(v, list) else v for v in r)
        for r in out.collect())


def test_table_lookup_lookup_filter_outer_limit_all_columns(
        spark, reg_hllc):
    # testInnerJoinTableLookupLookupWithFilterWithOuterLimitWithAllColumns
    # — un-skipped in r15: the pinned unique_dim1 wire literals
    # ("AQAAAEAAAA==" for dim1='', "AQAAAQAAAAFREA==" for dim1='1')
    # are now REPRODUCED by the legacy HyperLogLogCollector
    # implementation instead of being unmatchable DataSketches state
    out = druid_sql(spark, _ALL_COLUMNS_SQL + "    LIMIT 100\n",
                    reg_hllc)
    assert _all_columns_rows(out) == _ALL_COLUMNS_EXPECTED


def test_table_lookup_lookup_filter_no_limit_all_columns(
        spark, reg_hllc):
    # testInnerJoinTableLookupLookupWithFilterWithoutLimitWithAllColumns
    out = druid_sql(spark, _ALL_COLUMNS_SQL, reg_hllc)
    assert _all_columns_rows(out) == _ALL_COLUMNS_EXPECTED


def test_many_many_inner_join_on_lookup(spark, reg):
    # testManyManyInnerJoinOnManyManyLookup — a 19-deep left-deep
    # lookup join tree; every join is a broadcast hash join on the
    # unique key so the row set never fans out
    joins = "\n".join(
        f"INNER JOIN lookup.lookyloo l{i} ON foo.dim2 = l{i}.k"
        for i in range(1, 20))
    out = druid_sql(spark, f"""
        SELECT dim1
        FROM foo
        INNER JOIN lookup.lookyloo l ON foo.dim2 = l.k
        {joins}
        WHERE l.v = 'xa'
    """, reg)
    assert _rows(out) == sorted([("",), ("1",)])


def test_inner_join_query_of_lookup_removable(spark, reg):
    # testInnerJoinQueryOfLookupRemovable — subquery over the lookup
    # with a projected SUBSTRING, removable by the planner
    out = druid_sql(spark, """
        SELECT dim1, dim2, t1.sk
        FROM foo
        INNER JOIN
          (SELECT k, SUBSTRING(v, 1, 3) sk FROM lookup.lookyloo) t1
          ON foo.dim2 = t1.k
    """, reg)
    assert _rows(out) == sorted([
        ("", "a", "xa"), ("1", "a", "xa"), ("def", "abc", "xab")])


def test_two_lookups_to_table_numeric_column(spark, reg):
    # testInnerJoinTwoLookupsToTableUsingNumericColumn — the lookup key
    # casts to double to meet m1; only k='6' survives the cast
    out = druid_sql(spark, """
        SELECT COUNT(*) AS n
        FROM foo
        INNER JOIN lookup.lookyloo l1 ON l1.k = foo.m1
        INNER JOIN lookup.lookyloo l2 ON l2.k = l1.k
    """, reg).first()
    assert out["n"] == 1


def test_two_lookups_to_table_numeric_column_reverse(spark, reg):
    # testInnerJoinTwoLookupsToTableUsingNumericColumnInReverse
    out = druid_sql(spark, """
        SELECT COUNT(*) AS n
        FROM lookup.lookyloo l1
        INNER JOIN lookup.lookyloo l2 ON l1.k = l2.k
        INNER JOIN foo on l2.k = foo.m1
    """, reg).first()
    assert out["n"] == 1


def test_inner_join_lookup_table_table(spark, reg):
    # testInnerJoinLookupTableTable
    out = druid_sql(spark, """
        SELECT l.k AS k, l.v AS v, SUM(f.m1) AS s1, SUM(nf.m1) AS s2
        FROM lookup.lookyloo l
        INNER JOIN druid.foo f on f.dim1 = l.k
        INNER JOIN druid.numfoo nf on nf.dim1 = l.k
        GROUP BY 1, 2 ORDER BY 2
    """, reg).collect()
    assert [tuple(r) for r in out] == [("abc", "xabc", 6.0, 6.0)]


def test_inner_join_lookup_table_table_chained(spark, reg):
    # testInnerJoinLookupTableTableChained — second table joins the
    # FIRST table's column, not the lookup key
    out = druid_sql(spark, """
        SELECT l.k AS k, l.v AS v, SUM(f.m1) AS s1, SUM(nf.m1) AS s2
        FROM lookup.lookyloo l
        INNER JOIN druid.foo f on f.dim1 = l.k
        INNER JOIN druid.numfoo nf on nf.dim1 = f.dim1
        GROUP BY 1, 2 ORDER BY 2
    """, reg).collect()
    assert [tuple(r) for r in out] == [("abc", "xabc", 6.0, 6.0)]


def test_where_in_select_null_from_lookup(spark, reg):
    # testWhereInSelectNullFromLookup — IN over an all-NULL subquery
    # matches nothing
    out = druid_sql(spark, """
        SELECT * FROM foo
        where dim1 IN (SELECT NULL FROM lookup.lookyloo)
    """, reg).collect()
    assert out == []


def test_comma_join_left_function(spark, reg):
    # testCommaJoinLeftFunction — comma join + function-valued equi
    # condition in WHERE
    out = druid_sql(spark, """
        SELECT foo.dim1, foo.dim2, l.k, l.v
        FROM foo, lookup.lookyloo l
        WHERE SUBSTRING(foo.dim2, 1, 1) = l.k
    """, reg)
    assert _rows(out) == sorted([
        ("", "a", "a", "xa"), ("1", "a", "a", "xa"),
        ("def", "abc", "a", "xa")])


def test_comma_join_mismatched_types_count_zero(spark, reg):
    # testCommaJoinTableLookupTableMismatchedTypes — cnt (long) never
    # matches a lookup key
    out = druid_sql(spark, """
        SELECT COUNT(*) AS n
        FROM foo, lookup.lookyloo l, numfoo
        WHERE foo.cnt = l.k AND l.k = numfoo.cnt
    """, reg).first()
    assert out["n"] == 0


def test_join_mismatched_types_without_comma(spark, reg):
    # testJoinTableLookupTableMismatchedTypesWithoutComma
    out = druid_sql(spark, """
        SELECT COUNT(*) AS n
        FROM foo
        INNER JOIN lookup.lookyloo l ON foo.cnt = l.k
        INNER JOIN numfoo ON l.k = numfoo.cnt
    """, reg).first()
    assert out["n"] == 0


def test_inner_join_mismatched_types(spark, reg):
    # testInnerJoinMismatchedTypes — float column vs string key
    out = druid_sql(spark, """
        SELECT foo.m1, l.k, l.v
        FROM foo
        INNER JOIN lookup.lookyloo l ON foo.m1 = l.k
    """, reg).collect()
    assert [tuple(r) for r in out] == [(6.0, "6", "x6")]


def test_inner_join_left_function(spark, reg):
    # testInnerJoinLeftFunction
    out = druid_sql(spark, """
        SELECT foo.dim1, foo.dim2, l.k, l.v
        FROM foo
        INNER JOIN lookup.lookyloo l ON SUBSTRING(foo.dim2, 1, 1) = l.k
    """, reg)
    assert _rows(out) == sorted([
        ("", "a", "a", "xa"), ("1", "a", "a", "xa"),
        ("def", "abc", "a", "xa")])


def test_inner_join_right_function(spark, reg):
    # testInnerJoinRightFunction — the function sits on the LOOKUP side
    out = druid_sql(spark, """
        SELECT foo.dim1, foo.dim2, l.k, l.v
        FROM foo
        INNER JOIN lookup.lookyloo l ON foo.dim2 = SUBSTRING(l.k, 1, 2)
    """, reg)
    assert _rows(out) == sorted([
        ("", "a", "a", "xa"), ("1", "a", "a", "xa")])


def test_left_join_lookup_onto_lookup(spark, reg):
    # testLeftJoinLookupOntoLookupUsingJoinOperator — the second join
    # keys on the FIRST lookup's key, so misses propagate nulls
    out = druid_sql(spark, """
        SELECT dim2, l1.v AS v1, l2.v AS v2
        FROM foo
        LEFT JOIN lookup.lookyloo l1 ON foo.dim2 = l1.k
        LEFT JOIN lookup.lookyloo l2 ON l1.k = l2.k
    """, reg)
    assert _rows(out.selectExpr("coalesce(dim2,'<n>') dim2", "v1", "v2")
                 ) == sorted([
        ("a", "xa", "xa"), ("<n>", None, None), ("", None, None),
        ("a", "xa", "xa"), ("abc", "xabc", "xabc"), ("<n>", None, None)])


def test_left_join_three_lookups(spark, reg):
    # testLeftJoinThreeLookupsUsingJoinOperator — the third join keys
    # on the SECOND lookup's key
    out = druid_sql(spark, """
        SELECT dim1, dim2, l1.v AS v1, l2.v AS v2, l3.v AS v3
        FROM foo
        LEFT JOIN lookup.lookyloo l1 ON foo.dim1 = l1.k
        LEFT JOIN lookup.lookyloo l2 ON foo.dim2 = l2.k
        LEFT JOIN lookup.lookyloo l3 ON l2.k = l3.k
    """, reg)
    assert _rows(out.selectExpr("dim1", "coalesce(dim2,'<n>') dim2",
                                "v1", "v2", "v3")) == sorted([
        ("", "a", None, "xa", "xa"),
        ("10.1", "<n>", None, None, None),
        ("2", "", None, None, None),
        ("1", "a", None, "xa", "xa"),
        ("def", "abc", None, "xabc", "xabc"),
        ("abc", "<n>", "xabc", None, None)])


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


# -- join-over-subquery-limit family ----------------------------------------


def test_join_outer_group_by_subquery_has_limit(spark, reg):
    # testJoinOuterGroupByAndSubqueryHasLimit (sqlCompatible branch).
    # Adaptation: Calcite's star expansion renames the second dim2 to
    # dim20 so the outer GROUP BY binds t1's column; Spark keeps the
    # duplicate ambiguous, so the port selects t1.* explicitly (same
    # native plan: left columns + join-key only from the right).
    out = druid_sql(spark, """
        SELECT dim2, AVG(m2) AS a FROM
          (SELECT t1.* FROM foo AS t1 INNER JOIN foo AS t2 ON t1.m1 = t2.m1
           LIMIT 10) AS t3
        GROUP BY dim2
    """, reg)
    assert _rows(out.selectExpr("coalesce(dim2,'<n>') dim2", "a")
                 ) == sorted([
        ("<n>", 4.0), ("", 3.0), ("a", 2.5), ("abc", 5.0)])


def test_join_outer_group_by_subquery_no_limit(spark, reg):
    # testJoinOuterGroupByAndSubqueryNoLimit
    # (same t1.* adaptation as the HasLimit variant above)
    out = druid_sql(spark, """
        SELECT dim2, AVG(m2) AS a FROM
          (SELECT t1.* FROM foo AS t1 INNER JOIN foo AS t2 ON t1.m1 = t2.m1)
          AS t3
        GROUP BY dim2
    """, reg)
    assert _rows(out.selectExpr("coalesce(dim2,'<n>') dim2", "a")
                 ) == sorted([
        ("<n>", 4.0), ("", 3.0), ("a", 2.5), ("abc", 5.0)])


def test_join_with_limit_before_joining(spark, reg):
    # testJoinWithLimitBeforeJoining — the LIMIT sits on the join INPUT
    out = druid_sql(spark, """
        SELECT t1.dim2, AVG(t1.m2) AS a
        FROM (SELECT * FROM foo LIMIT 10) AS t1
        INNER JOIN foo AS t2 ON t1.m1 = t2.m1
        GROUP BY t1.dim2
    """, reg)
    assert _rows(out.selectExpr("coalesce(dim2,'<n>') dim2", "a")
                 ) == sorted([
        ("<n>", 4.0), ("", 3.0), ("a", 2.5), ("abc", 5.0)])


def test_inner_join_with_limit_and_alias(spark, reg):
    # testInnerJoinWithLimitAndAlias — both sides are grouped
    # subqueries over different datasources
    out = druid_sql(spark, """
        select t1.b1 from
          (select __time as b1 from numfoo group by 1 order by 1) as t1
        inner join (
          select __time as b2 from foo group by 1 order by 1
        ) as t2 on t1.b1 = t2.b2
    """, reg)
    assert sorted(r["b1"] for r in out.collect()) == [
        datetime(2000, 1, 1), datetime(2000, 1, 2), datetime(2000, 1, 3),
        datetime(2001, 1, 1), datetime(2001, 1, 2), datetime(2001, 1, 3)]


def test_exact_topn_on_inner_join_with_limit(spark, reg):
    # testExactTopNOnInnerJoinWithLimit (exact topN mode — this
    # engine's only mode)
    out = druid_sql(spark, """
        select f1.dim4 AS dim4, sum(m1) AS s from numfoo f1 inner join (
          select dim4 from numfoo where dim4 <> 'a' group by 1
        ) f2 on f1.dim4 = f2.dim4 group by 1 limit 1
    """, reg).collect()
    assert [tuple(r) for r in out] == [("b", 15.0)]


def test_topn_filter_join(spark, reg):
    # testTopNFilterJoin — filter to the top-2 dim2 groups via join
    out = druid_sql(spark, """
        SELECT t1.dim1 AS dim1, SUM(t1.cnt) AS s
        FROM druid.foo t1
          INNER JOIN (
          SELECT SUM(cnt) AS sum_cnt, dim2 FROM druid.foo
          GROUP BY dim2 ORDER BY 1 DESC LIMIT 2
        ) t2 ON (t1.dim2 = t2.dim2)
        GROUP BY t1.dim1
        ORDER BY 1
    """, reg).collect()
    assert [tuple(r) for r in out] == [("", 1), ("1", 1)]


def test_removable_left_join(spark, reg):
    # testRemovableLeftJoin — same shape but LEFT: the join cannot
    # drop rows, so the right side is removable
    out = druid_sql(spark, """
        SELECT t1.dim1 AS dim1, SUM(t1.cnt) AS s
        FROM druid.foo t1
          LEFT JOIN (
          SELECT SUM(cnt) AS sum_cnt, dim2 FROM druid.foo
          GROUP BY dim2 ORDER BY 1 DESC LIMIT 2
        ) t2 ON (t1.dim2 = t2.dim2)
        GROUP BY t1.dim1
        ORDER BY 1
    """, reg).collect()
    assert [tuple(r) for r in out] == [
        ("", 1), ("1", 1), ("10.1", 1), ("2", 1), ("abc", 1), ("def", 1)]


# -- left-join null-propagation family ---------------------------------------


def test_using_subquery_with_extraction_fns(spark, reg):
    # testUsingSubqueryWithExtractionFns
    out = druid_sql(spark, """
        SELECT dim2, COUNT(*) AS n FROM druid.foo
        WHERE substring(dim2, 1, 1) IN
          (SELECT substring(dim1, 1, 1) FROM druid.foo WHERE dim1 <> '')
        group by dim2
    """, reg)
    assert _rows(out) == sorted([("a", 2), ("abc", 1)])


def test_inner_join_with_is_null_filter(spark, reg):
    # testInnerJoinWithIsNullFilter
    out = druid_sql(spark, """
        SELECT dim1, l.v from druid.foo f
        inner join lookup.lookyloo l on f.dim1 = l.k
        where f.dim2 is null
    """, reg).collect()
    assert [tuple(r) for r in out] == [("abc", "xabc")]


def test_left_join_right_table_can_be_empty(spark, reg):
    # testLeftJoinRightTableCanBeEmpty (sqlCompatible branch): m2 is
    # never null, so the right side is empty and every left row
    # survives with its own dim2 group
    out = druid_sql(spark, """
        SELECT v1.dim2, count(1) AS n
        FROM (SELECT * FROM foo where m1 > 2) v1
        LEFT OUTER JOIN (
          select dim2 from (select * from foo where m2 is null)
        ) sm ON v1.dim2 = sm.dim2
        group by 1
    """, reg)
    assert _rows(out.selectExpr("coalesce(dim2,'<n>') dim2", "n")
                 ) == sorted([
        ("<n>", 1), ("", 1), ("a", 1), ("abc", 1)])


def test_left_join_subquery_with_null_key_filter(spark, reg):
    # testLeftJoinSubqueryWithNullKeyFilter (sqlCompatible branch) —
    # IS NOT NULL over the grouped lookup key
    out = druid_sql(spark, """
        SELECT dim1, l1.k
        FROM foo
        LEFT JOIN (select k || '' as k from lookup.lookyloo group by 1)
          l1 ON foo.dim1 = l1.k
        WHERE l1.k IS NOT NULL
    """, reg).collect()
    assert [tuple(r) for r in out] == [("abc", "abc")]


def test_left_join_subquery_with_selector_filter(spark, reg):
    # testLeftJoinSubqueryWithSelectorFilter
    out = druid_sql(spark, """
        SELECT dim1, l1.k
        FROM foo
        LEFT JOIN (select k || '' as k from lookup.lookyloo group by 1)
          l1 ON foo.dim1 = l1.k
        WHERE l1.k = 'abc'
    """, reg).collect()
    assert [tuple(r) for r in out] == [("abc", "abc")]


def test_left_join_with_not_null_filter_in_condition(spark, reg):
    # testLeftJoinWithNotNullFilter — IS NOT NULL inside the join
    # condition (dim1 is never null, so all 6 rows self-match)
    out = druid_sql(spark, """
        SELECT s.dim1 AS a, t.dim1 AS b
        FROM foo as s
        LEFT JOIN foo as t ON s.dim1 = t.dim1 and s.dim1 IS NOT NULL
    """, reg)
    assert _rows(out) == sorted([
        ("", ""), ("10.1", "10.1"), ("2", "2"), ("1", "1"),
        ("def", "def"), ("abc", "abc")])


def test_inner_join_subquery_with_selector_filter(spark, reg):
    # testInnerJoinSubqueryWithSelectorFilter — the selector rides the
    # join condition itself
    out = druid_sql(spark, """
        SELECT dim1, l1.k
        FROM foo INNER JOIN
          (select k || '' as k from lookup.lookyloo group by 1) l1
        ON foo.dim1 = l1.k and l1.k = 'abc'
    """, reg).collect()
    assert [tuple(r) for r in out] == [("abc", "abc")]


def test_count_distinct_of_lookup_join(spark, reg):
    # testCountDistinctOfLookupUsingJoinOperator (sqlCompatible: NULL
    # misses don't count toward DISTINCT)
    out = druid_sql(spark, """
        SELECT COUNT(DISTINCT lookyloo.v) AS n
        FROM foo LEFT JOIN lookup.lookyloo ON foo.dim1 = lookyloo.k
    """, reg).first()
    assert out["n"] == 1


# -- semi/anti-join family ----------------------------------------------------


def test_semi_join_with_outer_time_extract_scan(spark, reg):
    # testSemiJoinWithOuterTimeExtractScan
    out = druid_sql(spark, """
        SELECT dim1, EXTRACT(MONTH FROM __time) AS m FROM druid.foo
         WHERE dim2 IN (
           SELECT dim2 FROM druid.foo WHERE dim1 = 'def'
         ) AND dim1 <> ''
    """, reg).collect()
    assert [tuple(r) for r in out] == [("def", 1)]


def test_two_semi_joins_simultaneously(spark, reg):
    # testTwoSemiJoinsSimultaneously
    out = druid_sql(spark, """
        SELECT dim1, COUNT(*) AS n FROM foo
        WHERE dim1 IN ('abc', 'def')
        AND __time IN (SELECT MAX(__time) FROM foo WHERE cnt = 1)
        AND __time IN (SELECT MAX(__time) FROM foo WHERE cnt <> 2)
        GROUP BY 1
    """, reg).collect()
    assert [tuple(r) for r in out] == [("abc", 1)]


def test_semi_and_anti_join_where_in_subquery(spark, reg):
    # testSemiAndAntiJoinSimultaneouslyUsingWhereInSubquery
    out = druid_sql(spark, """
        SELECT dim1, COUNT(*) AS n FROM foo
        WHERE dim1 IN ('abc', 'def')
        AND __time IN (SELECT MAX(__time) FROM foo)
        AND __time NOT IN (SELECT MIN(__time) FROM foo)
        GROUP BY 1
    """, reg).collect()
    assert [tuple(r) for r in out] == [("abc", 1)]


def test_semi_and_anti_join_explicit_joins(spark, reg):
    # testSemiAndAntiJoinSimultaneouslyUsingExplicitJoins
    out = druid_sql(spark, """
        SELECT dim1, COUNT(*) AS n FROM
        foo
        INNER JOIN (SELECT MAX(__time) t FROM foo) t0
          on t0.t = foo.__time
        LEFT JOIN (SELECT MIN(__time) t FROM foo) t1
          on t1.t = foo.__time
        WHERE dim1 IN ('abc', 'def') AND t1.t is null
        GROUP BY 1
    """, reg).collect()
    assert [tuple(r) for r in out] == [("abc", 1)]


def test_semi_join_outer_time_extract_aggregate_order_by(spark, reg):
    # testSemiJoinWithOuterTimeExtractAggregateWithOrderBy
    out = druid_sql(spark, """
        SELECT COUNT(DISTINCT dim1) AS n,
               EXTRACT(MONTH FROM __time) AS m FROM druid.foo
         WHERE dim2 IN (
           SELECT dim2 FROM druid.foo WHERE dim1 = 'def'
         ) AND dim1 <> ''
        GROUP BY EXTRACT(MONTH FROM __time)
        ORDER BY EXTRACT(MONTH FROM __time)
    """, reg).collect()
    assert [tuple(r) for r in out] == [(1, 1)]


def test_count_on_semi_join_single_column(spark, reg):
    # testCountOnSemiJoinSingleColumn
    out = druid_sql(spark, """
        SELECT dim1 FROM foo
        WHERE dim1 IN (SELECT dim1 FROM foo WHERE dim1 = '10.1')
    """, reg).collect()
    assert [r["dim1"] for r in out] == ["10.1"]


def test_using_subquery_as_part_of_and_filter(spark, reg):
    # testUsingSubqueryAsPartOfAndFilter
    out = druid_sql(spark, """
        SELECT dim1, dim2, COUNT(*) AS n FROM druid.foo
        WHERE dim2 IN (SELECT dim1 FROM druid.foo WHERE dim1 <> '')
        AND dim1 <> 'xxx'
        group by dim1, dim2 ORDER BY dim2
    """, reg).collect()
    assert [tuple(r) for r in out] == [("def", "abc", 1)]


def test_using_subquery_as_part_of_or_filter(spark, reg):
    # testUsingSubqueryAsPartOfOrFilter — the subquery rides one arm
    # of a disjunction
    out = druid_sql(spark, """
        SELECT dim1, dim2, COUNT(*) AS n FROM druid.foo
        WHERE dim1 = 'xxx' OR dim2 IN
          (SELECT dim1 FROM druid.foo WHERE dim1 LIKE '%bc')
        group by dim1, dim2 ORDER BY dim2
    """, reg).collect()
    assert [tuple(r) for r in out] == [("def", "abc", 1)]


# -- inline-datasource (CTE self-join) family ---------------------------------


def test_left_join_two_inline_datasources_time_filter(spark, reg):
    # testLeftJoinOnTwoInlineDataSourcesWithTimeFilter
    out = druid_sql(spark, """
        with abc as
        (
          SELECT dim1, "__time", m1 from foo
          WHERE "dim1" = '10.1' AND "__time" >= '1999'
        )
        SELECT t1.dim1, t1."__time" from abc as t1
        LEFT JOIN abc as t2 on t1.dim1 = t2.dim1
        WHERE t1.dim1 = '10.1'
    """, reg).collect()
    assert [tuple(r) for r in out] == [("10.1", datetime(2000, 1, 2))]


def test_left_join_two_inline_datasources_outer_where(spark, reg):
    # testLeftJoinOnTwoInlineDataSourcesWithOuterWhere
    out = druid_sql(spark, """
        with abc as
        ( SELECT dim1, "__time", m1 from foo WHERE "dim1" = '10.1' )
        SELECT t1.dim1, t1."__time" from abc as t1
        LEFT JOIN abc as t2 on t1.dim1 = t2.dim1
        WHERE t1.dim1 = '10.1'
    """, reg).collect()
    assert [tuple(r) for r in out] == [("10.1", datetime(2000, 1, 2))]


def test_left_join_two_inline_datasources(spark, reg):
    # testLeftJoinOnTwoInlineDataSources
    out = druid_sql(spark, """
        with abc as
        ( SELECT dim1, "__time", m1 from foo WHERE "dim1" = '10.1' )
        SELECT t1.dim1, t1."__time" from abc as t1
        LEFT JOIN abc as t2 on t1.dim1 = t2.dim1
    """, reg).collect()
    assert [tuple(r) for r in out] == [("10.1", datetime(2000, 1, 2))]


def test_inner_join_two_inline_datasources_outer_where(spark, reg):
    # testInnerJoinOnTwoInlineDataSourcesWithOuterWhere
    out = druid_sql(spark, """
        with abc as
        ( SELECT dim1, "__time", m1 from foo WHERE "dim1" = '10.1' )
        SELECT t1.dim1, t1."__time" from abc as t1
        INNER JOIN abc as t2 on t1.dim1 = t2.dim1
        WHERE t1.dim1 = '10.1'
    """, reg).collect()
    assert [tuple(r) for r in out] == [("10.1", datetime(2000, 1, 2))]


def test_inner_join_two_inline_datasources(spark, reg):
    # testInnerJoinOnTwoInlineDataSources
    out = druid_sql(spark, """
        with abc as
        ( SELECT dim1, "__time", m1 from foo WHERE "dim1" = '10.1' )
        SELECT t1.dim1, t1."__time" from abc as t1
        INNER JOIN abc as t2 on t1.dim1 = t2.dim1
    """, reg).collect()
    assert [tuple(r) for r in out] == [("10.1", datetime(2000, 1, 2))]


def test_nested_group_by_on_inline_datasource_with_filter(spark, reg):
    # testNestedGroupByOnInlineDataSourceWithFilter
    out = druid_sql(spark, """
        with abc as
        ( SELECT dim1, m2 from druid.foo where "__time" >= '2001-01-02' )
        , def as
        ( SELECT t1.dim1, SUM(t2.m2) as "metricSum"
          from abc as t1 inner join abc as t2 on t1.dim1 = t2.dim1
          where t1.dim1='def'
          group by 1 )
        SELECT count(*) AS n from def
    """, reg).first()
    assert out["n"] == 1


# -- UNION ALL over joins ------------------------------------------------------


def test_union_all_left_query_is_join(spark, reg):
    # testUnionAllTwoQueriesLeftQueryIsJoin
    out = druid_sql(spark, """
        (SELECT COUNT(*) AS n FROM foo INNER JOIN lookup.lookyloo
         ON foo.dim1 = lookyloo.k)
        UNION ALL SELECT SUM(cnt) AS n FROM foo
    """, reg)
    assert sorted(r["n"] for r in out.collect()) == [1, 6]


def test_union_all_right_query_is_join(spark, reg):
    # testUnionAllTwoQueriesRightQueryIsJoin
    out = druid_sql(spark, """
        (SELECT SUM(cnt) AS n FROM foo UNION ALL
         SELECT COUNT(*) AS n FROM foo INNER JOIN lookup.lookyloo
         ON foo.dim1 = lookyloo.k)
    """, reg)
    assert sorted(r["n"] for r in out.collect()) == [1, 6]


def test_union_all_both_queries_are_join(spark, reg):
    # testUnionAllTwoQueriesBothQueriesAreJoin
    out = druid_sql(spark, """
        (
        SELECT COUNT(*) AS n FROM foo LEFT JOIN lookup.lookyloo
          ON foo.dim1 = lookyloo.k
        UNION ALL
        SELECT COUNT(*) AS n FROM foo INNER JOIN lookup.lookyloo
          ON foo.dim1 = lookyloo.k
        )
    """, reg)
    assert sorted(r["n"] for r in out.collect()) == [1, 6]


# -- filter-pushdown stress ----------------------------------------------------


def test_filter_pushdown_many_filters_empty(spark, reg):
    # testInnerJoinWithFilterPushdownAndManyFiltersEmptyResults — a
    # 19-pair row-constructor IN that matches nothing
    out = druid_sql(spark, """
        SELECT f1.m1, f2.m1
        FROM foo f1
        INNER JOIN foo f2 ON f1.m1 = f2.m1 where (f1.dim1, f1.dim2) in
        (('A', 'B'), ('C', 'D'), ('A', 'C'), ('C', 'E'), ('D', 'H'),
         ('A', 'D'), ('B', 'C'), ('H', 'E'), ('I', 'J'), ('I', 'K'),
         ('J', 'I'), ('Q', 'R'), ('Q', 'S'), ('S', 'Q'), ('X', 'Y'),
         ('Z', 'U'), ('U', 'Z'), ('P', 'Q'), ('X', 'A'))
    """, reg).collect()
    assert out == []


def test_filter_pushdown_many_filters_nonempty(spark, reg):
    # testInnerJoinWithFilterPushdownAndManyFiltersNonEmptyResults —
    # same shape with one matching pair ('1','a')
    out = druid_sql(spark, """
        SELECT f1.m1, f2.m1
        FROM foo f1
        INNER JOIN foo f2 ON f1.m1 = f2.m1 where (f1.dim1, f1.dim2) in
        (('1', 'a'), ('C', 'D'), ('A', 'C'), ('C', 'E'), ('D', 'H'),
         ('A', 'D'), ('B', 'C'), ('H', 'E'), ('I', 'J'), ('I', 'K'),
         ('J', 'I'), ('Q', 'R'), ('Q', 'S'), ('S', 'Q'), ('X', 'Y'),
         ('Z', 'U'), ('U', 'Z'), ('P', 'Q'), ('X', 'A'))
    """, reg).collect()
    assert [tuple(r) for r in out] == [(4.0, 4.0)]


@pytest.fixture(scope="module")
def reg_mv3(spark):
    """numfoo WITH the MV dim3 column (the shared join fixture's
    numfoo is the scalar-dims variant)."""
    from test_golden_mv import ROWS as MV_ROWS, SCHEMA as MV_SCHEMA
    r = DatasourceRegistry(spark)
    r.register("numfoo", spark.createDataFrame(MV_ROWS, MV_SCHEMA))
    r.register_lookup("lookyloo", LOOKYLOO)
    return r


def test_virtual_column_on_mv_filter_join_expression(spark, reg_mv3):
    # testVirtualColumnOnMVFilterJoinExpression: list-filtered MV
    # virtual columns as the join key — only the ['a','b'] row carries
    # an 'a' element on both sides
    out = druid_sql(spark, """
        SELECT foo1.dim3 AS a, foo2.dim3 AS b
        FROM druid.numfoo as foo1 INNER JOIN druid.numfoo as foo2
        ON MV_FILTER_ONLY(foo1.dim3, ARRAY['a'])
         = MV_FILTER_ONLY(foo2.dim3, ARRAY['a'])
    """, reg_mv3).collect()
    assert [(r.a, r.b) for r in out] == [(["a", "b"], ["a", "b"])]


def test_join_on_multi_valued_column_superset(spark, reg_mv3):
    # testJoinOnMultiValuedColumnShouldThrowException: the reference's
    # DruidJoinRule rejects a raw MV join key. DOCUMENTED DIVERGENCE
    # (superset, r8): this engine executes it as the any-element join
    # (array_contains, broadcast right side) — the same semantics
    # testViewAndJoin relies on for its MV-keyed view join — so the
    # ['a','b'] row matches the lookup key 'a' instead of failing.
    out = druid_sql(spark, """
        SELECT dim3, l.v FROM druid.numfoo f
        INNER JOIN lookup.lookyloo l ON f.dim3 = l.k
    """, reg_mv3).collect()
    assert sorted((tuple(r[0]) if r[0] else None, r[1])
                  for r in out) == [(("a", "b"), "xa")]


def test_join_on_timeseries_with_floor_on_time(spark, reg_mv3):
    # testJoinOnTimeseriesWithFloorOnTime: row-constructor IN against
    # an hourly-floored MIN subquery; CAST(__time AS BIGINT) is epoch
    # MILLIS (Druid time is a millis long)
    out = druid_sql(spark, """
        SELECT CAST(__time AS BIGINT) AS t, m1, ANY_VALUE(dim3) AS d
        FROM numfoo WHERE (TIME_FLOOR(__time, 'PT1H'), m1) IN
           (
             SELECT TIME_FLOOR(__time, 'PT1H') AS t1, MIN(m1) AS t2
             FROM numfoo WHERE dim3 = 'b'
                 AND __time BETWEEN '1994-04-29 00:00:00'
                               AND '2020-01-11 00:00:00' GROUP BY 1
            )
        GROUP BY 1, 2 ORDER BY 1
    """, reg_mv3).collect()
    assert [(r.t, r.m1, r.d) for r in out] == [
        (946684800000, 1.0, ["a", "b"]), (946771200000, 2.0, ["b", "c"])]


# ---------------------------------------------------------------------
# Round 8: the remaining CalciteJoinQueryTest methods (closure map in
# PARITY.md round-8)
# ---------------------------------------------------------------------


def test_filter_and_group_by_lookup_join_with_not_filter(spark, reg):
    # testFilterAndGroupByLookupUsingJoinOperatorWithNotFilter: the
    # reference's v <> 'xa' plans as not(selector) matching the NULL
    # v of unmatched LEFT JOIN rows; three-valued <> needs the
    # explicit IS NULL arm (corpus-standard spelling)
    out = druid_sql(spark, """
        SELECT lookyloo.v AS v, COUNT(*) AS c
        FROM foo LEFT JOIN lookup.lookyloo ON foo.dim2 = lookyloo.k
        WHERE lookyloo.v <> 'xa' OR lookyloo.v IS NULL
        GROUP BY lookyloo.v
    """, reg).collect()
    assert sorted(((r.v, r.c) for r in out), key=str) \
        == sorted([(None, 3), ("xabc", 1)], key=str)


def test_inner_join_two_inline_datasources_left_direct_access(spark,
                                                              reg):
    # testInnerJoinOnTwoInlineDataSources_withLeftDirectAccess (the
    # context flag only changes the reference's physical plan)
    out = druid_sql(spark, """
        with abc as
        (SELECT dim1, "__time", m1 from foo WHERE "dim1" = '10.1')
        SELECT t1.dim1, t1."__time" from abc as t1
        INNER JOIN abc as t2 on t1.dim1 = t2.dim1
    """, reg).collect()
    assert [(r[0], r[1]) for r in out] \
        == [("10.1", datetime(2000, 1, 2))]


def test_topn_filter_join_with_projection(spark, reg):
    # testTopNFilterJoinWithProjection (sql-compatible: SUBSTRING('')
    # is null)
    out = druid_sql(spark, """
        SELECT SUBSTRING(t1.dim1, 1, 10) AS s, SUM(t1.cnt) AS c
        FROM druid.foo t1
          INNER JOIN (
          SELECT SUM(cnt) AS sum_cnt, dim2 FROM druid.foo
          GROUP BY dim2 ORDER BY 1 DESC LIMIT 2
        ) t2 ON (t1.dim2 = t2.dim2)
        GROUP BY SUBSTRING(t1.dim1, 1, 10)
    """, reg).collect()
    assert sorted(((r.s, r.c) for r in out), key=str) \
        == sorted([(None, 1), ("1", 1)], key=str)


def test_join_on_constant_superset(spark, reg):
    # testJoinOnConstantShouldFail is UNPLANNABLE in the reference
    # (unsupported operand types). DOCUMENTED DIVERGENCE (superset):
    # Spark plans the constant condition as a cross-filter
    out = druid_sql(spark, """
        SELECT t1.dim1 from foo as t1
        LEFT JOIN foo as t2 on t1.dim1 = '10.1'
    """, reg).collect()
    # the '10.1' row matches all 6 right rows; other rows join null
    assert len(out) == 5 + 6


def test_topn_on_broadcast_string_dictionary(spark, reg_broadcast):
    # testTopNOnStringWithNonSortedOrUniqueDictionary (+ OrderByDim
    # variant): join against the broadcast datasource on dim4
    out = druid_sql(spark, """
        SELECT broadcast.dim4 AS d, COUNT(*) AS c
        FROM druid.numfoo
        INNER JOIN druid.broadcast ON numfoo.dim4 = broadcast.dim4
        GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 4
    """, reg_broadcast).collect()
    assert [(r.d, r.c) for r in out] == [("a", 9), ("b", 9)]
    out2 = druid_sql(spark, """
        SELECT broadcast.dim4 AS d, COUNT(*) AS c
        FROM druid.numfoo
        INNER JOIN druid.broadcast ON numfoo.dim4 = broadcast.dim4
        GROUP BY 1 ORDER BY 1 DESC LIMIT 4
    """, reg_broadcast).collect()
    assert [(r.d, r.c) for r in out2] == [("b", 9), ("a", 9)]


def test_in_filter_more_than_subquery_threshold(spark, reg):
    # testPlanWithInFilterMoreThanInSubQueryThreshold — a >threshold
    # IN list plans as a join in the reference; value semantics only
    out = druid_sql(spark, """
        SELECT l1 FROM numfoo
        WHERE l1 IN (4842, 4844, 4845, 14905, 4853, 29064, 7, 0)
    """, reg).collect()
    assert sorted(r.l1 for r in out) == [0, 7]


@pytest.fixture(scope="module")
def reg_broadcast(spark):
    """numfoo + the broadcast datasource (CalciteTests
    BROADCAST_DATASOURCE shares numfoo's rows)."""
    r = DatasourceRegistry(spark)
    r.register("numfoo", spark.createDataFrame(NUMFOO_ROWS,
                                               NUMFOO_SCHEMA))
    r.register("broadcast", spark.createDataFrame(NUMFOO_ROWS,
                                                  NUMFOO_SCHEMA))
    return r


# -- the withLeftDirectAccess twins (round 12): the context flag only
# changes the REFERENCE's asserted native plan (left table scanned
# directly instead of wrapped in a query datasource); the SQL and the
# expected row are identical to the base methods, so each twin pins
# the same values with the context passed through.

@pytest.mark.parametrize("sql_body", [
    # testLeftJoinOnTwoInlineDataSourcesWithTimeFilter_withLeftDirectAccess
    """with abc as
       ( SELECT dim1, "__time", m1 from foo
         WHERE "dim1" = '10.1' AND "__time" >= '1999' )
       SELECT t1.dim1, t1."__time" from abc as t1
       LEFT JOIN abc as t2 on t1.dim1 = t2.dim1
       WHERE t1.dim1 = '10.1'""",
    # testLeftJoinOnTwoInlineDataSourcesWithOuterWhere_withLeftDirectAccess
    """with abc as
       ( SELECT dim1, "__time", m1 from foo WHERE "dim1" = '10.1' )
       SELECT t1.dim1, t1."__time" from abc as t1
       LEFT JOIN abc as t2 on t1.dim1 = t2.dim1
       WHERE t1.dim1 = '10.1'""",
    # testLeftJoinOnTwoInlineDataSources_withLeftDirectAccess
    """with abc as
       ( SELECT dim1, "__time", m1 from foo WHERE "dim1" = '10.1' )
       SELECT t1.dim1, t1."__time" from abc as t1
       LEFT JOIN abc as t2 on t1.dim1 = t2.dim1""",
    # testInnerJoinOnTwoInlineDataSourcesWithOuterWhere_withLeftDirectAccess
    """with abc as
       ( SELECT dim1, "__time", m1 from foo WHERE "dim1" = '10.1' )
       SELECT t1.dim1, t1."__time" from abc as t1
       INNER JOIN abc as t2 on t1.dim1 = t2.dim1
       WHERE t1.dim1 = '10.1'""",
])
def test_inline_datasources_with_left_direct_access(spark, reg,
                                                    sql_body):
    out = druid_sql(spark, sql_body, reg,
                    context={"enableJoinLeftTableScanDirect": True}
                    ).collect()
    assert [tuple(r) for r in out] == [("10.1", datetime(2000, 1, 2))]


# -- r13 closures: the CalciteJoinQueryTest remainder ------------------------
#
# Enumerated remainder after r15 (2, with reason; the two AllColumns
# twins that pinned unique_dim1's HyperLogLogCollector wire bytes were
# un-skipped once ingest/hllc.py reproduced those exact bytes — see
# test_table_lookup_lookup_filter_outer_limit_all_columns above):
# - testInnerJoinOnMultiValueColumn: @Ignore upstream (regression
#   placeholder for apache/druid#9924 — joining ON an MV column is
#   documented-undefined there).
# - testInnerJoinQueryOfLookup (enumerated r14 — previously
#   unaccounted): its expected value hangs on LATEST(v, 10) over the
#   TIME-LESS LookupDataSource, where the reference's StringLast fold
#   keeps the last row in NATIVE CURSOR ORDER (the lookup map's
#   iteration order) because every row reads the same missing
#   timestamp. This engine has no cursor order to reproduce — its
#   max_by(v, __time) correctly refuses to resolve __time on a lookup
#   — and any deterministic stand-in (MAX, first-by-key) would pin
#   different semantics than the reference executes. The
#   join-of-aggregated-lookup TOPOLOGY itself is covered by
#   test_inner_join_query_of_lookup_removable below.

def test_join_on_groupby_instead_of_timeseries_with_floor_on_time(
        spark, reg):
    # testJoinOnGroupByInsteadOfTimeseriesWithFloorOnTime: tuple-IN
    # subquery on (TIME_FLOOR, MIN(m1)) compiles to an inner join.
    # The reference renders ANY_VALUE(dim3, 100) over the MV rows as
    # the string "[a, b]"; this engine returns the MV itself.
    out = druid_sql(spark, """
        SELECT CAST(__time AS BIGINT) AS t, m1,
               ANY_VALUE(dim3, 100) AS d3
        FROM foo WHERE (CAST(TIME_FLOOR(__time, 'PT1H') AS BIGINT), m1) IN
           (
             SELECT CAST(TIME_FLOOR(__time, 'PT1H') AS BIGINT) + 0 AS t1,
                    MIN(m1) AS t2 FROM foo WHERE dim3 = 'b'
                 AND __time BETWEEN '1994-04-29 00:00:00' AND '2020-01-11 00:00:00' GROUP BY 1
            )
        GROUP BY 1, 2
    """, reg)
    got = sorted((r["t"], r["m1"], tuple(r["d3"])) for r in out.collect())
    assert got == [(946684800000, 1.0, ("a", "b")),
                   (946771200000, 2.0, ("b", "c"))]


def test_groupby_join_as_native_query_with_unoptimized_filter(spark,
                                                              reg):
    # testGroupByJoinAsNativeQueryWithUnoptimizedFilter: a NATIVE
    # groupBy over a join of two scan QueryDataSources, with the
    # dim1=def selector deliberately expressed as the unoptimized
    # IN-with-one-value form — the join filter path must accept it
    from apache_druid_spark.plans.compiler import compile_query

    iv = ["2001-01-02T00:00:00.000Z/146140482-04-24T15:36:27.903Z"]
    scan1 = {"queryType": "scan", "dataSource": "foo",
             "intervals": iv, "columns": ["dim1"],
             "resultFormat": "compactedList"}
    scan2 = {"queryType": "scan", "dataSource": "foo",
             "intervals": iv, "columns": ["dim1", "m2"],
             "resultFormat": "compactedList"}
    q = {"queryType": "groupBy",
         "dataSource": {
             "type": "join",
             "left": {"type": "query", "query": scan1},
             "right": {"type": "query", "query": scan2},
             "rightPrefix": "j0.",
             "condition": '("dim1" == "j0.dim1")',
             "joinType": "INNER"},
         "granularity": "all",
         "intervals": ["1970-01-01/2100-01-01"],
         "filter": {"type": "in", "dimension": "dim1",
                    "values": ["def"]},
         "virtualColumns": [{"type": "expression", "name": "v0",
                             "expression": "'def'",
                             "outputType": "STRING"}],
         "dimensions": [{"type": "default", "dimension": "v0",
                         "outputName": "d0"}]}
    got = [tuple(r) for r in compile_query(q, reg).collect()]
    assert got == [("def",)]


def test_topn_on_string_with_non_sorted_dictionary_order_by_dim(spark,
                                                                reg):
    # testTopNOnStringWithNonSortedOrUniqueDictionaryOrderByDim: the
    # join against the broadcast (global) table plans as a topN with
    # an inverted lexicographic metric; each dim4 value matches its
    # 3 broadcast twins -> 9 per group, descending, LIMIT 4 -> 2 rows
    out = druid_sql(spark, """
        SELECT broadcast.dim4, COUNT(*) AS n
        FROM numfoo
        INNER JOIN broadcast ON numfoo.dim4 = broadcast.dim4
        GROUP BY 1 ORDER BY 1 DESC LIMIT 4
    """, reg)
    assert [tuple(r) for r in out.collect()] == [("b", 9), ("a", 9)]


def test_virtual_column_on_mv_filter_multi_join_expression(spark, reg):
    # testVirtualColumnOnMVFilterMultiJoinExpression: MV_FILTER_ONLY
    # virtual columns as join keys through two nested self-joins —
    # only the ["a","b"] row has a surviving 'a' element on every side
    out = druid_sql(spark, """
        SELECT foo1.dim3 AS a, foo2.dim3 AS b FROM numfoo as foo1 INNER JOIN
        (SELECT foo3.dim3 FROM numfoo as foo3 INNER JOIN numfoo as foo4
           ON MV_FILTER_ONLY(foo3.dim3, ARRAY['a']) = MV_FILTER_ONLY(foo4.dim3, ARRAY['a'])) as foo2
        ON MV_FILTER_ONLY(foo1.dim3, ARRAY['a']) = MV_FILTER_ONLY(foo2.dim3, ARRAY['a'])
    """, reg)
    got = [(tuple(r["a"]), tuple(r["b"])) for r in out.collect()]
    assert got == [(("a", "b"), ("a", "b"))]
