"""Golden tests ported from CalciteCorrelatedQueryTest.java
(sql/src/test/java/org/apache/druid/sql/calcite/): correlated scalar
subqueries inside ANY_VALUE over the `visits` fixture
(CalciteTests.java:705-717 USER_VISIT_ROWS). Calcite parses the bare
``ANY_VALUE(select ...)`` form and decorrelates it to a join; the
dialect shim parenthesizes the subquery so Catalyst's own decorrelation
does the same (`_wrap_bare_subquery_agg_args`).
"""

from __future__ import annotations

from datetime import datetime

import pytest

from apache_druid_spark.model.datasource import DatasourceRegistry
from apache_druid_spark.sql.dialect import druid_sql

VISIT_ROWS = [
    (datetime(2021, 1, 1, 1), "alice", "canada", "A"),
    (datetime(2021, 1, 1, 2), "alice", "canada", "B"),
    (datetime(2021, 1, 1, 3), "bob", "canada", "A"),
    (datetime(2021, 1, 1, 4), "alice", "India", "Y"),
    (datetime(2021, 1, 2, 1), "alice", "canada", "A"),
    (datetime(2021, 1, 2, 2), "bob", "canada", "A"),
    (datetime(2021, 1, 2, 3), "foo", "canada", "B"),
    (datetime(2021, 1, 2, 4), "bar", "canada", "B"),
    (datetime(2021, 1, 2, 5), "alice", "India", "X"),
    (datetime(2021, 1, 2, 6), "bob", "India", "X"),
    (datetime(2021, 1, 2, 7), "foo", "India", "X"),
    (datetime(2021, 1, 3, 1), "foo", "USA", "M"),
]


@pytest.fixture(scope="module")
def reg(spark):
    r = DatasourceRegistry(spark)
    r.register("visits", spark.createDataFrame(
        VISIT_ROWS,
        "__time timestamp, user string, country string, city string"))
    return r


def test_correlated_subquery(spark, reg):
    # testCorrelatedSubquery: average daily distinct users per country
    out = druid_sql(spark, """
        select country, ANY_VALUE(
                select avg("users") from (
                    select floor(__time to day), count(distinct user)
                      "users" from visits f
                    where f.country = visits.country group by 1
                )
             ) as "DAU"
        from visits
        group by 1
    """, reg).collect()
    assert sorted((r["country"], float(r["DAU"])) for r in out) == [
        ("India", 2.0), ("USA", 1.0), ("canada", 3.0)]


def test_correlated_subquery_with_left_filter(spark, reg):
    # testCorrelatedSubqueryWithLeftFilter AND its
    # testCorrelatedSubqueryWithLeftFilter_leftDirectAccessDisabled
    # twin (same SQL + rows; the context flag only changes the
    # reference's asserted native plan): outer rows filtered to
    # city='B' in a time window; the correlated max-daily-visits still
    # scans the FULL country history
    out = druid_sql(spark, """
        select country, ANY_VALUE(
                select max("users") from (
                    select floor(__time to day), count(*) "users"
                    from visits f
                    where f.country = visits.country group by 1
                )
             ) as "dailyVisits"
        from visits
         where city = 'B' and __time between
           '2021-01-01 01:00:00' AND '2021-01-02 23:59:59'
         group by 1
    """, reg).collect()
    assert [(r["country"], r["dailyVisits"]) for r in out] == [
        ("canada", 4)]


def test_correlated_subquery_with_correlated_query_filter(spark, reg):
    # testCorrelatedSubqueryWithCorrelatedQueryFilter and
    # testCorrelatedSubqueryWithCorrelatedQueryFilter_Scan (same SQL +
    # rows; the Scan twin only flips withLeftDirectAccessEnabled in
    # the reference's native plan): the correlated side carries its
    # own filter
    out = druid_sql(spark, """
        select country, ANY_VALUE(
                select max("users") from (
                    select floor(__time to day), count(user) "users"
                    from visits f
                    where f.country = visits.country and f.city = 'A'
                    group by 1
                )
             ) as "dailyVisits"
        from visits
         where city = 'B'
         group by 1
    """, reg).collect()
    assert [(r["country"], r["dailyVisits"]) for r in out] == [
        ("canada", 2)]


def test_correlated_exists(spark, reg):
    # EXISTS correlate (Calcite decorrelates to a semi join; same
    # planner family as testCorrelatedSubquery): countries with at
    # least one 'B'-city visit
    out = druid_sql(spark, """
        select distinct country from visits v
        where exists (select 1 from visits f
                      where f.country = v.country and f.city = 'B')
        order by country
    """, reg).collect()
    assert [r.country for r in out] == ["canada"]


def test_correlated_not_exists(spark, reg):
    # NOT EXISTS decorrelates to an anti join: countries with no
    # 'A'-city visit
    out = druid_sql(spark, """
        select distinct country from visits v
        where not exists (select 1 from visits f
                          where f.country = v.country and f.city = 'A')
        order by country
    """, reg).collect()
    assert [r.country for r in out] == ["India", "USA"]


def test_correlated_scalar_in_where(spark, reg):
    # correlated scalar aggregate used directly as a WHERE predicate
    # (filter-pushdown variant ADVICE r5 asked for): countries with
    # more than 4 total visits
    out = druid_sql(spark, """
        select distinct country from visits v
        where (select count(*) from visits f
               where f.country = v.country) > 4
        order by country
    """, reg).collect()
    assert [r.country for r in out] == ["canada"]


def test_correlated_subquery_with_limit(spark, reg):
    # LIMIT inside the correlate (the peak-day pattern): the ordered
    # single-row inner query survives decorrelation
    out = druid_sql(spark, """
        select country, ANY_VALUE(
            select "users" from (
                select floor(__time to day), count(*) "users"
                from visits f where f.country = visits.country
                group by 1 order by "users" desc, 1 limit 1
            )
        ) as peak
        from visits group by 1 order by 1
    """, reg).collect()
    assert [(r.country, r.peak) for r in out] == [
        ("India", 3), ("USA", 1), ("canada", 4)]


def test_multiple_exact_count_distinct_with_grouping(spark, reg):
    # testMultipleExactCountDistinctWithGroupingAndOtherAggregators
    # (useGroupingSetForExactDistinct planner path; values match both
    # planner configs)
    out = druid_sql(spark, """
        SELECT FLOOR(__time to day) AS d, COUNT(distinct city) AS c,
               COUNT(distinct user) AS u
        FROM druid.visits GROUP BY 1 ORDER BY 1
    """, reg).collect()
    assert [(r.d, r.c, r.u) for r in out] == [
        (datetime(2021, 1, 1), 3, 2), (datetime(2021, 1, 2), 3, 4),
        (datetime(2021, 1, 3), 1, 1)]
