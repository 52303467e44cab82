"""Nested multi-value goldens: MV dimensions flowing THROUGH derived
tables, unions, and subquery aggregates. The reference explodes MV
dims at the grouping level regardless of query nesting (query
datasources keep the multi-value type — GroupByQueryEngine;
CalciteQueryTest testGroupByTimeAndOtherDimension /
testStringLatestInSubquery / testStringEarliestInSubquery). Round-5's
one real bug hid exactly here: the dialect only exploded when the
grouping block's FROM was a base table, so subquery-wrapped MV columns
grouped as raw arrays. Expected rows are the SQL-compatible null
branch, derived from the `foo` fixture spec (FIXTURES.md §1)."""

from __future__ import annotations

import pytest

from apache_druid_spark.model.datasource import DatasourceRegistry
from apache_druid_spark.sql.dialect import druid_sql

from test_golden_foo import FOO_ROWS, FOO_SCHEMA


@pytest.fixture(scope="module")
def reg(spark):
    r = DatasourceRegistry(spark)
    r.register("foo", spark.createDataFrame(FOO_ROWS, FOO_SCHEMA))
    return r


def _groups(df):
    return {("<n>" if r[0] is None else r[0]): tuple(r)[1:]
            for r in df.collect()}


def test_string_latest_in_subquery(spark, reg):
    # testStringLatestInSubquery (sqlCompatible: 3) — inner groupBy
    # explodes dim2 to element groups {null,'','a','abc'}; LATEST picks
    # the time-latest dim1 per group ('abc','2','1','def'); the outer
    # SUM coerces strings numerically (non-numeric -> null, skipped)
    out = druid_sql(spark, """
        SELECT SUM(val) AS s
        FROM (SELECT dim2, LATEST(dim1, 10) AS val
              FROM foo GROUP BY dim2)
    """, reg).first()
    assert out["s"] == 3


def test_string_earliest_in_subquery(spark, reg):
    # testStringEarliestInSubquery (sqlCompatible: 12.1)
    out = druid_sql(spark, """
        SELECT SUM(val) AS s
        FROM (SELECT dim2, EARLIEST(dim1, 10) AS val
              FROM foo GROUP BY dim2)
    """, reg).first()
    assert out["s"] == 12.1


def test_mv_groupby_through_projection(spark, reg):
    # dim2 passes bare through a derived-table projection; the outer
    # GROUP BY still explodes to element groups (the r5 bug shape)
    out = druid_sql(spark, """
        SELECT dim2, COUNT(*) AS n
        FROM (SELECT dim1, dim2 FROM druid.foo) AS t
        GROUP BY dim2
    """, reg)
    assert _groups(out) == {"<n>": (2,), "": (1,), "a": (2,),
                            "abc": (1,)}


def test_mv_groupby_through_aliased_projection(spark, reg):
    # the derived table RENAMES the MV column; MV-ness follows the
    # output name into the enclosing block
    out = druid_sql(spark, """
        SELECT d2, SUM(cnt) AS s
        FROM (SELECT dim2 AS d2, cnt FROM druid.foo) t
        GROUP BY d2 ORDER BY d2
    """, reg)
    assert _groups(out) == {"<n>": (2,), "": (1,), "a": (2,),
                            "abc": (1,)}


def test_mv_groupby_through_select_star(spark, reg):
    # SELECT * passes every column name through unchanged
    out = druid_sql(spark, """
        SELECT dim2, COUNT(*) AS n
        FROM (SELECT * FROM druid.foo) t
        GROUP BY dim2
    """, reg)
    assert _groups(out) == {"<n>": (2,), "": (1,), "a": (2,),
                            "abc": (1,)}


def test_mv_groupby_through_union(spark, reg):
    # a UNION ALL of two MV projections keeps the MV type; the outer
    # explode sees both branches (counts double the single-table case)
    out = druid_sql(spark, """
        SELECT dim2, COUNT(*) AS n
        FROM (SELECT dim2 FROM druid.foo
              UNION ALL SELECT dim2 FROM druid.foo) u
        GROUP BY dim2
    """, reg)
    assert _groups(out) == {"<n>": (4,), "": (2,), "a": (4,),
                            "abc": (2,)}


def test_mv_groupby_through_two_projection_levels(spark, reg):
    # MV-ness survives two stacked projections when the name is kept
    out = druid_sql(spark, """
        SELECT dim2, COUNT(*) AS n
        FROM (SELECT dim2 FROM (SELECT dim2 FROM druid.foo) a) b
        GROUP BY dim2
    """, reg)
    assert _groups(out) == {"<n>": (2,), "": (1,), "a": (2,),
                            "abc": (1,)}


def test_mv_groupby_subquery_with_outer_where(spark, reg):
    # the outer WHERE stays a PRE-explode any-element row filter
    # (SelectorFilter semantics), then the surviving rows explode:
    # rows 1 and 4 both carry ['a'] -> one 'a' group of 2
    out = druid_sql(spark, """
        SELECT dim2, COUNT(*) AS n
        FROM (SELECT dim1, dim2 FROM druid.foo) t
        WHERE dim2 = 'a'
        GROUP BY dim2
    """, reg)
    assert _groups(out) == {"a": (2,)}


def test_mv_groupby_subquery_grouped_with_sum(spark, reg):
    # aggregate alongside the exploded dim through a projection —
    # the m1 metric rides along and sums per element group
    out = druid_sql(spark, """
        SELECT dim2, SUM(m1) AS s
        FROM (SELECT dim2, m1 FROM druid.foo) t
        GROUP BY dim2 ORDER BY dim2
    """, reg)
    assert _groups(out) == {"<n>": (8.0,), "": (3.0,), "a": (5.0,),
                            "abc": (5.0,)}


@pytest.fixture(scope="module")
def reg_lk(spark):
    r = DatasourceRegistry(spark)
    r.register("foo", spark.createDataFrame(FOO_ROWS, FOO_SCHEMA))
    r.register_lookup("lookyloo", {"a": "xa", "abc": "xabc",
                                   "nosuchkey": "mysteryvalue",
                                   "6": "x6"})
    return r


def test_mv_groupby_through_join(spark, reg_lk):
    # GROUP BY an MV dim over a JOIN result: the reference joins the
    # base rows first, then the groupBy engine explodes each surviving
    # row's values (join datasources keep MV typing). Only dim1='abc'
    # matches a lookup key; its dim2 is null -> one null group.
    out = druid_sql(spark, """
        SELECT dim2, COUNT(*) AS n
        FROM foo JOIN lookup.lookyloo ON foo.dim1 = lookyloo.k
        GROUP BY dim2
    """, reg_lk)
    assert _groups(out) == {"<n>": (1,)}


def test_mv_groupby_through_left_join_with_where(spark, reg_lk):
    # LEFT JOIN + pre-explode WHERE row filter + two grouping dims:
    # the explode lands after the join list, WHERE stays row-level
    out = druid_sql(spark, """
        SELECT dim2, k, COUNT(*) AS n
        FROM foo LEFT JOIN lookup.lookyloo ON foo.dim1 = lookyloo.k
        WHERE dim1 <> '1'
        GROUP BY dim2, k ORDER BY dim2, k
    """, reg_lk).collect()
    assert [(r.dim2, r.k, r.n) for r in out] == [
        (None, None, 1), (None, "abc", 1), ("", None, 1),
        ("a", None, 1), ("abc", None, 1)]


# -- grouping analytics over MV dims (CalciteQueryTest grouping-sets
# family: the reference computes grouping sets over the EXPLODED
# elements; all expected rows are the sqlCompatible branch) -----------


def test_group_by_rollup_different_order(spark, reg):
    # testGroupByRollupDifferentOrder: ROLLUP(gran, dim2) through a
    # COALESCE(dim2, '') projection — the element-mapped COALESCE turns
    # null/empty rows into '' element groups
    out = druid_sql(spark, """
        SELECT dim2, gran, SUM(cnt) AS s
        FROM (SELECT FLOOR(__time TO MONTH) AS gran,
                     COALESCE(dim2, '') dim2, cnt FROM druid.foo) AS x
        GROUP BY ROLLUP (gran, dim2)
        ORDER BY gran NULLS LAST, dim2 NULLS LAST
    """, reg).collect()
    from datetime import datetime as dt
    assert [(r.dim2, r.gran, r.s) for r in out] == [
        ("", dt(2000, 1, 1), 2), ("a", dt(2000, 1, 1), 1),
        (None, dt(2000, 1, 1), 3),
        ("", dt(2001, 1, 1), 1), ("a", dt(2001, 1, 1), 1),
        ("abc", dt(2001, 1, 1), 1), (None, dt(2001, 1, 1), 3),
        (None, None, 6)]


def test_grouping_sets_no_superset(spark, reg):
    # testGroupingSetsNoSuperset: ( (), (dim2), (gran) )
    out = druid_sql(spark, """
        SELECT dim2, gran, SUM(cnt) AS s
        FROM (SELECT FLOOR(__time TO MONTH) AS gran,
                     COALESCE(dim2, '') dim2, cnt FROM druid.foo) AS x
        GROUP BY GROUPING SETS ( (), (dim2), (gran) )
        ORDER BY dim2 NULLS LAST, gran NULLS LAST
    """, reg).collect()
    from datetime import datetime as dt
    assert [(r.dim2, r.gran, r.s) for r in out] == [
        ("", None, 3), ("a", None, 2), ("abc", None, 1),
        (None, dt(2000, 1, 1), 3), (None, dt(2001, 1, 1), 3),
        (None, None, 6)]


def test_grouping_sets_with_limit(spark, reg):
    # testGroupingSetsWithLimit: all four sets, 11 rows under the limit
    out = druid_sql(spark, """
        SELECT dim2, gran, SUM(cnt) AS s
        FROM (SELECT FLOOR(__time TO MONTH) AS gran,
                     COALESCE(dim2, '') dim2, cnt FROM druid.foo) AS x
        GROUP BY GROUPING SETS ( (dim2, gran), (dim2), (gran), () )
        LIMIT 100
    """, reg).collect()
    assert len(out) == 11
    assert sum(r.s for r in out if r.dim2 is None and r.gran is None) == 6


def test_grouping_aggregator_different_order(spark, reg):
    # testGroupingAggregatorDifferentOrder: GROUPING(gran, dim2) bit
    # values per set — detail 0, dim2-only 2, gran-only 1, total 3
    out = druid_sql(spark, """
        SELECT dim2, gran, SUM(cnt) AS s, GROUPING(gran, dim2) AS g
        FROM (SELECT FLOOR(__time TO MONTH) AS gran,
                     COALESCE(dim2, '') dim2, cnt FROM druid.foo) AS x
        GROUP BY GROUPING SETS ( (dim2, gran), (dim2), (gran), () )
    """, reg).collect()
    got = {(r.dim2, r.gran and r.gran.year, r.s): r.g for r in out}
    assert got[("", 2000, 2)] == 0 and got[("a", 2000, 1)] == 0
    assert got[("", None, 3)] == 2 and got[("abc", None, 1)] == 2
    assert got[(None, 2000, 3)] == 1 and got[(None, 2001, 3)] == 1
    assert got[(None, None, 6)] == 3


def test_grouping_aggregator_with_post_aggregator(spark, reg):
    # testGroupingAggregatorWithPostAggregator (sqlCompatible): CASE on
    # GROUPING() labels the total row 'ALL'; raw dim2 explodes
    out = druid_sql(spark, """
        SELECT dim2, SUM(cnt) AS s, GROUPING(dim2) AS g,
               CASE WHEN GROUPING(dim2) = 1 THEN 'ALL' ELSE dim2 END AS lbl
        FROM druid.foo GROUP BY GROUPING SETS ( (), (dim2) )
        ORDER BY g, dim2
    """, reg).collect()
    assert [(r.dim2, r.s, r.g, r.lbl) for r in out] == [
        (None, 2, 0, None), ("", 1, 0, ""), ("a", 2, 0, "a"),
        ("abc", 1, 0, "abc"), (None, 6, 1, "ALL")]


def test_select_distinct_mv_with_sort_as_outer_query(spark, reg):
    # testSelectDistinctWithSortAsOuterQuery (sqlCompatible): DISTINCT
    # over the MV dim is a grouping — distinct ELEMENT values
    out = druid_sql(spark, """
        SELECT * FROM (SELECT DISTINCT dim2 FROM druid.foo
                       ORDER BY dim2) LIMIT 10
    """, reg).collect()
    assert [r.dim2 for r in out] == [None, "", "a", "abc"]


def test_select_distinct_mv_direct(spark, reg):
    # same grouping without the outer wrapper
    out = druid_sql(spark, """
        SELECT DISTINCT dim2 FROM druid.foo ORDER BY dim2 LIMIT 10
    """, reg).collect()
    assert [r.dim2 for r in out] == [None, "", "a", "abc"]


def test_group_by_time_floor_on_group_by_time_floor(spark, reg):
    # testGroupByTimeFloorAndDimOnGroupByTimeFloorAndDim
    # (sqlCompatible): day-grain inner groupBy with HAVING, re-rolled
    # to month in the outer block; inner dim2 explode makes the outer
    # dim2 a SCALAR (no re-explode — the scope rule)
    out = druid_sql(spark, """
        SELECT dim2, time_floor(gran, 'P1M') AS gran, sum(s) AS s
        FROM (SELECT time_floor(__time, 'P1D') AS gran, dim2,
                     sum(m1) as s FROM druid.foo
              GROUP BY 1, 2 HAVING sum(m1) > 1) AS x
        GROUP BY 1, 2
        ORDER BY dim2, gran desc
    """, reg).collect()
    from datetime import datetime as dt
    assert [(r.dim2, r.gran, r.s) for r in out] == [
        (None, dt(2001, 1, 1), 6.0), (None, dt(2000, 1, 1), 2.0),
        ("", dt(2000, 1, 1), 3.0), ("a", dt(2001, 1, 1), 4.0),
        ("abc", dt(2001, 1, 1), 5.0)]
