"""Golden tests ported from CalciteSimpleQueryTest.java (sql/src/test/
java/org/apache/druid/sql/calcite/): the FLOOR(__time TO MONTH) x dim
groupBy family with every ORDER BY permutation. Expected rows are the
SQL-compatible null branch — these cases pin Druid's null ordering
(NULL first under ASC, last under DESC), which matches Spark's
defaults, and the time-vs-dim ordering interplay the reference's
groupBy limitSpec implements.

foo is the scalar-dim2 post-ingest presentation (single-value MVs read
as strings, [] as null) — same fixture as test_golden_join.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from apache_druid_spark.model.datasource import DatasourceRegistry
from apache_druid_spark.sql.dialect import druid_sql

ROWS = [
    (datetime(2000, 1, 1), "", "a", 1),
    (datetime(2000, 1, 2), "10.1", None, 1),
    (datetime(2000, 1, 3), "2", "", 1),
    (datetime(2001, 1, 1), "1", "a", 1),
    (datetime(2001, 1, 2), "def", "abc", 1),
    (datetime(2001, 1, 3), "abc", None, 1),
]

T2000 = datetime(2000, 1, 1)
T2001 = datetime(2001, 1, 1)


@pytest.fixture(scope="module")
def reg(spark):
    r = DatasourceRegistry(spark)
    r.register("foo", spark.createDataFrame(
        ROWS, "__time timestamp, dim1 string, dim2 string, cnt long"))
    return r


def _key(row):
    # None-safe sort key for unordered comparisons
    return tuple("" if v is None else str(v) for v in row)


def test_group_by_time_and_dim(spark, reg):
    # testGroupByTimeAndDim
    out = druid_sql(spark, """
        SELECT FLOOR(__time TO MONTH) AS t, dim2, SUM(cnt) AS s
        FROM foo GROUP BY 1, 2
    """, reg).collect()
    assert sorted(([tuple(r) for r in out]), key=_key) == sorted([
        (T2000, None, 1), (T2000, "", 1), (T2000, "a", 1),
        (T2001, None, 1), (T2001, "a", 1), (T2001, "abc", 1)], key=_key)


def test_group_by_dim_and_time(spark, reg):
    # testGroupByDimAndTime
    out = druid_sql(spark, """
        SELECT dim2, FLOOR(__time TO MONTH) AS t, SUM(cnt) AS s
        FROM foo GROUP BY 1, 2
    """, reg).collect()
    assert sorted([tuple(r) for r in out], key=_key) == sorted([
        (None, T2000, 1), (None, T2001, 1), ("", T2000, 1),
        ("a", T2000, 1), ("a", T2001, 1), ("abc", T2001, 1)], key=_key)


def test_group_by_dim_and_time_where_on_time(spark, reg):
    # testGroupByDimAndTimeWhereOnTime
    out = druid_sql(spark, """
        SELECT dim2, FLOOR(__time TO MONTH) AS t, SUM(cnt) AS s
        FROM foo
        WHERE FLOOR(__time TO MONTH) = TIMESTAMP '2001-01-01'
        GROUP BY 1, 2
    """, reg).collect()
    assert sorted([tuple(r) for r in out], key=_key) == sorted([
        (None, T2001, 1), ("a", T2001, 1), ("abc", T2001, 1)], key=_key)


def test_group_by_dim_and_time_on_dim(spark, reg):
    # testGroupByDimAndTimeOnDim — LIKE filter on the dim
    out = druid_sql(spark, """
        SELECT dim2, FLOOR(__time TO MONTH) AS t, SUM(cnt) AS s
        FROM foo
        WHERE dim2 LIKE 'a%'
        GROUP BY 1, 2
    """, reg).collect()
    assert sorted([tuple(r) for r in out], key=_key) == sorted([
        ("a", T2000, 1), ("a", T2001, 1), ("abc", T2001, 1)], key=_key)


def test_group_by_time_and_dim_order_by_dim(spark, reg):
    # testGroupByTimeAndDimOrderByDim — NULL first under ASC
    out = druid_sql(spark, """
        SELECT FLOOR(__time TO MONTH) AS t, dim2, SUM(cnt) AS s
        FROM foo GROUP BY 1, 2
        ORDER BY dim2
    """, reg).collect()
    assert [r["dim2"] for r in out] == [None, None, "", "a", "a", "abc"]


def test_group_by_time_and_dim_order_by_dim_desc(spark, reg):
    # testGroupByTimeAndDimOrderByDimDesc — NULL last under DESC
    out = druid_sql(spark, """
        SELECT FLOOR(__time TO MONTH) AS t, dim2, SUM(cnt) AS s
        FROM foo GROUP BY 1, 2
        ORDER BY dim2 DESC
    """, reg).collect()
    assert [r["dim2"] for r in out] == ["abc", "a", "a", "", None, None]


def test_group_by_dim_and_time_order_by_time(spark, reg):
    # testGroupByDimAndTimeOrderByTime — only the time ordering is
    # specified; ties are engine order, so assert time monotonic +
    # exact multiset
    out = druid_sql(spark, """
        SELECT dim2, FLOOR(__time TO MONTH) AS t, SUM(cnt) AS s
        FROM foo GROUP BY 1, 2
        ORDER BY FLOOR(__time TO MONTH)
    """, reg).collect()
    times = [r["t"] for r in out]
    assert times == sorted(times)
    assert sorted([tuple(r) for r in out], key=_key) == sorted([
        (None, T2000, 1), ("", T2000, 1), ("a", T2000, 1),
        (None, T2001, 1), ("a", T2001, 1), ("abc", T2001, 1)], key=_key)


def test_group_by_dim_and_time_order_by_time_desc(spark, reg):
    # testGroupByDimAndTimeOrderByTimeDesc
    out = druid_sql(spark, """
        SELECT dim2, FLOOR(__time TO MONTH) AS t, SUM(cnt) AS s
        FROM foo GROUP BY 1, 2
        ORDER BY FLOOR(__time TO MONTH) DESC
    """, reg).collect()
    times = [r["t"] for r in out]
    assert times == sorted(times, reverse=True)
    assert len(out) == 6


def test_group_by_dim_and_time_order_by_time_and_dim(spark, reg):
    # testGroupByDimAndTimeOrderByTimeAndDim (sqlCompatible branch):
    # ORDER BY time ASC, dim2 DESC — nulls last within each month
    out = druid_sql(spark, """
        SELECT dim2, FLOOR(__time TO MONTH) AS t, SUM(cnt) AS s
        FROM foo GROUP BY 1, 2
        ORDER BY FLOOR(__time TO MONTH), dim2 DESC
    """, reg).collect()
    assert [tuple(r) for r in out] == [
        ("a", T2000, 1), ("", T2000, 1), (None, T2000, 1),
        ("abc", T2001, 1), ("a", T2001, 1), (None, T2001, 1)]


def test_group_by_dim_and_time_order_by_dim_and_time(spark, reg):
    # testGroupByDimAndTimeOrderByDimAndTime (sqlCompatible branch):
    # ORDER BY dim2 ASC, time DESC — nulls first
    out = druid_sql(spark, """
        SELECT dim2, FLOOR(__time TO MONTH) AS t, SUM(cnt) AS s
        FROM foo GROUP BY 1, 2
        ORDER BY dim2, FLOOR(__time TO MONTH) DESC
    """, reg).collect()
    assert [tuple(r) for r in out] == [
        (None, T2001, 1), (None, T2000, 1), ("", T2000, 1),
        ("a", T2001, 1), ("a", T2000, 1), ("abc", T2001, 1)]


def test_group_by_dim_time_dim_order_by_dim_time_dim(spark, reg):
    # testGroupByDimAndTimeAndDimOrderByDimAndTimeDim (sqlCompatible
    # branch): three-level ORDER BY dim2 DESC, time DESC, dim1 ASC
    out = druid_sql(spark, """
        SELECT dim2, FLOOR(__time TO MONTH) AS t, dim1, SUM(cnt) AS s
        FROM foo GROUP BY 1, 2, 3
        ORDER BY dim2 DESC, FLOOR(__time TO MONTH) DESC, dim1
    """, reg).collect()
    assert [tuple(r) for r in out] == [
        ("abc", T2001, "def", 1),
        ("a", T2001, "1", 1),
        ("a", T2000, "", 1),
        ("", T2000, "2", 1),
        (None, T2001, "abc", 1),
        (None, T2000, "10.1", 1)]
