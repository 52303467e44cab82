"""Second golden tranche from CalciteQueryTest.java (sql/src/test/
java/org/apache/druid/sql/calcite/): count-star filter simplification,
numeric-predicate null handling, degenerate/literal-false filters, and
groupBy shape cases. Expected rows are the SQL-compatible null branch,
derived from the `foo` / `numfoo` fixture specs (FIXTURES.md §1)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import types as T

from apache_druid_spark.model.datasource import DatasourceRegistry
from apache_druid_spark.sql.dialect import druid_sql

from test_golden_foo import FOO_ROWS, FOO_SCHEMA


@pytest.fixture(scope="module")
def reg(spark):
    r = DatasourceRegistry(spark)
    r.register("foo", spark.createDataFrame(FOO_ROWS, FOO_SCHEMA))
    return r


@pytest.fixture(scope="module")
def numfoo(spark):
    """numfoo (CalciteTests RAW_ROWS1_WITH_NUMERIC_DIMS) — scalar
    post-ingest dim2, nullable numeric dims."""
    r = DatasourceRegistry(spark)
    rows = [
        (datetime(2000, 1, 1), "", "a", 1, 1.0,
         1.0, None, 1.0, None, 7, None),
        (datetime(2000, 1, 2), "10.1", None, 1, 2.0,
         1.7, 1.7, 0.1, 0.1, 325323, 325323),
        (datetime(2000, 1, 3), "2", "", 1, 3.0,
         0.0, 0.0, 0.0, 0.0, 0, 0),
        (datetime(2001, 1, 1), "1", "a", 1, 4.0,
         None, None, None, None, None, None),
        (datetime(2001, 1, 2), "def", "abc", 1, 5.0,
         None, None, None, None, None, None),
        (datetime(2001, 1, 3), "abc", None, 1, 6.0,
         None, None, None, None, None, None),
    ]
    schema = T.StructType([
        T.StructField("__time", T.TimestampType()),
        T.StructField("dim1", T.StringType()),
        T.StructField("dim2", T.StringType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("m1", T.FloatType()),
        T.StructField("d1", T.DoubleType()),
        T.StructField("d2", T.DoubleType()),
        T.StructField("f1", T.FloatType()),
        T.StructField("f2", T.FloatType()),
        T.StructField("l1", T.LongType()),
        T.StructField("l2", T.LongType()),
    ])
    r.register("numfoo", spark.createDataFrame(rows, schema))
    return r


# -- count-star filter family ------------------------------------------------


def test_count_star_bound_filter_simplify_and(spark, reg):
    # testCountStarWithBoundFilterSimplifyAnd: the equality collapses
    # the surrounding bound range
    out = druid_sql(spark, """
        SELECT COUNT(*) AS n FROM druid.foo
        WHERE (dim1 >= 'a' and dim1 < 'b') and dim1 = 'abc'
    """, reg).first()
    assert out["n"] == 1


def test_count_star_long_filters_on_two_points(spark, reg):
    # testCountStarWithLongColumnFiltersOnTwoPoints
    out = druid_sql(spark, """
        SELECT COUNT(*) AS n FROM druid.foo WHERE cnt = 1 OR cnt = 2
    """, reg).first()
    assert out["n"] == 6


def test_count_star_not_of_degenerate_filter(spark, reg):
    # testCountStarWithNotOfDegenerateFilter: NOT(x>'a' OR x<'b') is
    # unsatisfiable over non-null strings
    out = druid_sql(spark, """
        SELECT COUNT(*) AS n FROM druid.foo
        WHERE dim2 = 'a' and not (dim1 > 'a' OR dim1 < 'b')
    """, reg).first()
    assert out["n"] == 0


def test_count_star_with_not_time_filter(spark, reg):
    # testCountStarWithNotTimeFilter: complement of two year windows
    out = druid_sql(spark, """
        SELECT COUNT(*) AS n FROM druid.foo
        WHERE dim1 <> 'xxx' and not (
            (__time >= TIMESTAMP '2000-01-01 00:00:00'
             AND __time < TIMESTAMP '2001-01-01 00:00:00')
            OR (__time >= TIMESTAMP '2003-01-01 00:00:00'
                AND __time < TIMESTAMP '2004-01-01 00:00:00'))
    """, reg).first()
    assert out["n"] == 3


def test_count_star_time_filter_timestamp_to_millis(spark, reg):
    # testCountStarWithTimeFilterOnLongColumnUsingTimestampToMillis:
    # cnt (=1 everywhere) lies in the epoch-day-zero window
    out = druid_sql(spark, """
        SELECT COUNT(*) AS n FROM druid.foo
        WHERE cnt >= TIMESTAMP_TO_MILLIS(TIMESTAMP '1970-01-01 00:00:00')
          AND cnt < TIMESTAMP_TO_MILLIS(TIMESTAMP '1970-01-02 00:00:00')
    """, reg).first()
    assert out["n"] == 6


def test_count_star_time_filter_extract_epoch(spark, reg):
    # testCountStarWithTimeFilterOnLongColumnUsingExtractEpoch
    out = druid_sql(spark, """
        SELECT COUNT(*) AS n FROM druid.foo
        WHERE cnt >= EXTRACT(EPOCH FROM TIMESTAMP '1970-01-01 00:00:00') * 1000
          AND cnt < EXTRACT(EPOCH FROM TIMESTAMP '1970-01-02 00:00:00') * 1000
    """, reg).first()
    assert out["n"] == 6


# -- numeric predicate null handling -----------------------------------------


def test_double_predicate_filter_nulls(spark, numfoo):
    # testDoublePredicateFilterNulls (sqlCompatible: nulls never match)
    out = druid_sql(spark, """
        SELECT COUNT(*) AS n FROM druid.numfoo WHERE d1 > 0
    """, numfoo).first()
    assert out["n"] == 2


def test_float_predicate_filter_nulls(spark, numfoo):
    # testFloatPredicateFilterNulls
    out = druid_sql(spark, """
        SELECT COUNT(*) AS n FROM druid.numfoo WHERE f1 > 0
    """, numfoo).first()
    assert out["n"] == 2


def test_long_predicate_filter_nulls(spark, numfoo):
    # testLongPredicateFilterNulls
    out = druid_sql(spark, """
        SELECT COUNT(*) AS n FROM druid.numfoo WHERE l1 > 3
    """, numfoo).first()
    assert out["n"] == 2


def test_filter_long_dimension(spark, numfoo):
    # testFilterLongDimension
    out = druid_sql(spark, """
        SELECT dim1 FROM numfoo WHERE l1 = 7 LIMIT 1
    """, numfoo).first()
    assert out["dim1"] == ""


def test_filter_on_float_and_double_metric(spark, reg):
    # testFilterOnFloat / testFilterOnDouble: equality against float
    # and double metric columns
    a = druid_sql(spark, "SELECT COUNT(*) AS n FROM druid.foo WHERE m1 = 1.0",
                  reg).first()
    b = druid_sql(spark, "SELECT COUNT(*) AS n FROM druid.foo WHERE m2 = 1.0",
                  reg).first()
    assert (a["n"], b["n"]) == (1, 1)


# -- groupBy shape family ----------------------------------------------------


def test_group_by_and_order_by_ordinal_of_alias(spark, reg):
    # testGroupByAndOrderByOrdinalOfAlias
    out = druid_sql(spark, """
        SELECT cnt as theCnt, COUNT(*) AS n
        FROM druid.foo GROUP BY 1 ORDER BY 1 ASC
    """, reg).collect()
    assert [(r.theCnt, r.n) for r in out] == [(1, 6)]


def test_group_by_expression_aliased_as_original_column_name(spark, reg):
    # testGroupByExpressionAliasedAsOriginalColumnName: the FLOOR
    # result reuses the __time name
    out = druid_sql(spark, """
        SELECT FLOOR(__time TO MONTH) AS __time, COUNT(*) AS n
        FROM druid.foo GROUP BY FLOOR(__time TO MONTH)
        ORDER BY 1
    """, reg).collect()
    assert [(r["__time"], r["n"]) for r in out] == [
        (datetime(2000, 1, 1), 3), (datetime(2001, 1, 1), 3)]


def test_group_by_with_filter_matching_nothing(spark, reg):
    # testGroupByWithFilterMatchingNothing (sqlCompatible: empty MAX
    # is null, not Long.MIN_VALUE)
    out = druid_sql(spark, """
        SELECT COUNT(*) AS c, MAX(cnt) AS m FROM druid.foo
        WHERE dim1 = 'foobar'
    """, reg).first()
    assert (out["c"], out["m"]) == (0, None)


def test_group_by_nothing_with_literally_false_filter(spark, reg):
    # testGroupByNothingWithLiterallyFalseFilter: ungrouped aggregate
    # over zero rows still returns ONE row
    out = druid_sql(spark, """
        SELECT COUNT(*) AS c, MAX(cnt) AS m FROM druid.foo WHERE 1 = 0
    """, reg).collect()
    assert [(r.c, r.m) for r in out] == [(0, None)]


def test_group_by_one_column_with_literally_false_filter(spark, reg):
    # testGroupByOneColumnWithLiterallyFalseFilter: GROUPED aggregate
    # over zero rows returns NO rows
    out = druid_sql(spark, """
        SELECT COUNT(*) AS c, MAX(cnt) AS m FROM druid.foo
        WHERE 1 = 0 GROUP BY dim1
    """, reg).collect()
    assert out == []


def test_group_by_with_group_by_empty(spark, reg):
    # testGroupByWithGroupByEmpty: GROUP BY () is the ungrouped form
    out = druid_sql(spark, """
        SELECT COUNT(*) AS a, SUM(cnt) AS b, MIN(cnt) AS c
        FROM druid.foo GROUP BY ()
    """, reg).first()
    assert tuple(out) == (6, 6, 1)


def test_group_by_single_column_descending(spark, reg):
    # testGroupBySingleColumnDescendingNoTopN
    out = druid_sql(spark, """
        SELECT dim1 FROM druid.foo GROUP BY dim1 ORDER BY dim1 DESC
    """, reg).collect()
    assert [r.dim1 for r in out] == ["def", "abc", "2", "10.1", "1", ""]


def test_min_max_avg_daily_count_with_limit(spark, reg):
    # testMinMaxAvgDailyCountWithLimit: nested daily-count rollup with
    # EPOCH extraction of the max day
    out = druid_sql(spark, """
        SELECT * FROM (
          SELECT max(cnt) AS mx, min(cnt) AS mn, avg(cnt) AS av,
                 TIME_EXTRACT(max(t), 'EPOCH') AS last_time,
                 count(1) AS num_days FROM (
              SELECT TIME_FLOOR(__time, 'P1D') AS t, count(1) cnt
              FROM "foo"
              GROUP BY 1
          )
        ) LIMIT 1
    """, reg).first()
    assert (out["mx"], out["mn"], out["av"], out["last_time"],
            out["num_days"]) == (1, 1, 1.0, 978480000, 6)


def test_group_by_limit_push_down_with_having(spark, reg):
    # testGroupByLimitPushDownWithHavingOnLong (sqlCompatible: dim2
    # explodes; null element groups sort FIRST under ORDER BY dim2)
    out = druid_sql(spark, """
        SELECT dim1, dim2, SUM(cnt) AS thecnt
        FROM druid.foo
        group by dim1, dim2
        having SUM(cnt) = 1
        order by dim2
        limit 4
    """, reg).collect()
    assert len(out) == 4 and all(r.thecnt == 1 for r in out)
    # dim2 sequence: two null-element groups, then '', then one 'a'
    # (the dim1 at the tie boundary is planner-dependent)
    assert [r.dim2 for r in out] == [None, None, "", "a"]
    assert {r.dim1 for r in out[:2]} == {"10.1", "abc"}
    assert out[2].dim1 == "2"


def test_filter_on_time_floor_comparison_misaligned(spark, reg):
    # testFilterOnTimeFloorComparisonMisaligned: the misaligned bound
    # rounds to the enclosing month
    out = druid_sql(spark, """
        SELECT COUNT(*) AS n FROM druid.foo
        WHERE FLOOR(__time TO MONTH) < TIMESTAMP '2000-02-01 00:00:01'
    """, reg).first()
    assert out["n"] == 3


def test_filter_on_time_extract_multiple_days(spark, reg):
    # testFilterOnTimeExtractWithMultipleDays
    out = druid_sql(spark, """
        SELECT COUNT(*) AS n FROM druid.foo
        WHERE EXTRACT(YEAR FROM __time) = 2000
        AND EXTRACT(DAY FROM __time) IN (2, 3, 5)
    """, reg).first()
    assert out["n"] == 2


def test_expression_filtering_and_grouping_cast_to_long(spark, reg):
    # testExpressionFilteringAndGroupingUsingCastToLong
    out = druid_sql(spark, """
        SELECT CAST(m1 AS BIGINT) / 2 * 2 AS v, COUNT(*) AS n
        FROM druid.foo
        WHERE CAST(m1 AS BIGINT) / 2 * 2 > -1
        GROUP BY CAST(m1 AS BIGINT) / 2 * 2
        ORDER BY 1 DESC
    """, reg).collect()
    assert [(r.v, r.n) for r in out] == [(6, 1), (4, 2), (2, 2), (0, 1)]


def test_group_by_extract_floor_time(spark, reg):
    # testGroupByExtractFloorTime
    out = druid_sql(spark, """
        SELECT EXTRACT(YEAR FROM FLOOR(__time TO YEAR)) AS "year",
               SUM(cnt) AS s
        FROM druid.foo
        GROUP BY EXTRACT(YEAR FROM FLOOR(__time TO YEAR))
        ORDER BY 1
    """, reg).collect()
    assert [(r["year"], r.s) for r in out] == [(2000, 3), (2001, 3)]


def test_exact_count_distinct_subquery_where_pushdown(spark, reg):
    # testExactCountDistinctUsingSubqueryWithWherePushDown
    # (sqlCompatible: the outer <> '' filter excludes BOTH the ''
    # group and the null element group)
    out = druid_sql(spark, """
        SELECT SUM(cnt) AS s, COUNT(*) AS n
        FROM (SELECT dim2, SUM(cnt) AS cnt FROM druid.foo
              GROUP BY dim2)
        WHERE dim2 <> ''
    """, reg).first()
    assert (out["s"], out["n"]) == (3, 2)


def test_count_and_average_by_constant_virtual_column(spark, numfoo):
    # testCountAndAverageByConstantVirtualColumn (adapted: numfoo here
    # has no dim5, group by a constant expression instead)
    out = druid_sql(spark, """
        SELECT 'ab' AS k, COUNT(dim1) AS c, AVG(l1) AS a
        FROM druid.numfoo WHERE dim1 = '10.1' AND l1 = 325323
        GROUP BY 1
    """, numfoo).first()
    assert (out["k"], out["c"], out["a"]) == ("ab", 1, 325323.0)


def test_group_by_floor_time_and_dim_with_order_by(spark, reg):
    # testGroupByFloorTimeAndOneOtherDimensionWithOrderBy
    # (sqlCompatible branch: dim2 explodes; null sorts FIRST asc)
    out = druid_sql(spark, """
        SELECT floor(__time TO year) AS y, dim2, COUNT(*) AS n
        FROM druid.foo
        GROUP BY floor(__time TO year), dim2
        ORDER BY floor(__time TO year), dim2, COUNT(*) DESC
    """, reg).collect()
    assert [(r.y, r.dim2, r.n) for r in out] == [
        (datetime(2000, 1, 1), None, 1), (datetime(2000, 1, 1), "", 1),
        (datetime(2000, 1, 1), "a", 1), (datetime(2001, 1, 1), None, 1),
        (datetime(2001, 1, 1), "a", 1), (datetime(2001, 1, 1), "abc", 1)]


# -- STRING_AGG family (StringSqlAggregator) ---------------------------------


def test_string_agg(spark, reg):
    # testStringAgg (sqlCompatible: '' is a value and joins first;
    # DISTINCT joins the SORTED string set; empty FILTER -> null)
    out = druid_sql(spark, """
        SELECT STRING_AGG(dim1, ',') AS a,
               STRING_AGG(DISTINCT dim1, ',') AS d,
               STRING_AGG(DISTINCT dim1, ',')
                 FILTER(WHERE dim1 = 'shazbot') AS f
        FROM foo WHERE dim1 is not null
    """, reg).first()
    assert out["a"] == ",10.1,2,1,def,abc"
    assert out["d"] == ",1,10.1,2,abc,def"
    assert out["f"] is None


def test_string_agg_max_bytes(spark, numfoo):
    # testStringAggMaxBytes (sqlCompatible): the size argument strips;
    # nulls are skipped; DISTINCT sorts the STRINGIFIED values
    # lexicographically ('0' < '325323' < '7')
    out = druid_sql(spark, """
        SELECT STRING_AGG(l1, ',', 128) AS a,
               STRING_AGG(DISTINCT l1, ',', 128) AS d
        FROM numfoo
    """, numfoo).first()
    assert (out["a"], out["d"]) == ("7,325323,0", "0,325323,7")


def test_string_agg_numeric(spark, numfoo):
    # testStringAggNumeric (sqlCompatible branch). DOCUMENTED
    # DIVERGENCE on f1: the reference widens float->double before
    # stringifying (0.1f -> '0.10000000149011612'); this engine renders
    # the float's shortest representation ('0.1').
    out = druid_sql(spark, """
        SELECT STRING_AGG(l1, ',') AS a, STRING_AGG(DISTINCT l1, ',') AS b,
               STRING_AGG(d1, ',') AS c, STRING_AGG(DISTINCT d1, ',') AS d,
               STRING_AGG(f1, ',') AS e, STRING_AGG(DISTINCT f1, ',') AS f
        FROM numfoo
    """, numfoo).first()
    assert tuple(out) == ("7,325323,0", "0,325323,7",
                          "1.0,1.7,0.0", "0.0,1.0,1.7",
                          "1.0,0.1,0.0", "0.0,0.1,1.0")


def test_string_agg_expression_non_constant_separator(spark, reg):
    # testStringAggExpressionNonConstantSeparator: rejected
    import pytest as _pytest
    with _pytest.raises(Exception):
        druid_sql(spark, """
            SELECT STRING_AGG(DISTINCT CONCAT(dim1, 'x'),
                              CONCAT('|', dim1)) AS a FROM foo
        """, reg).collect()


# -- TIMESTAMPADD / round / union-all shapes ---------------------------------


def test_timestampadd_conversion(spark, reg):
    # testTimeStampAddConversion + ZeroDayPeriod: month increment and
    # the zero-period identity
    out = druid_sql(spark, """
        SELECT TIMESTAMPADD(MONTH, 1, __time) AS m,
               TIMESTAMPADD(DAY, 0, __time) AS z
        FROM druid.foo ORDER BY __time LIMIT 2
    """, reg).collect()
    assert [(r.m, r.z) for r in out] == [
        (datetime(2000, 2, 1), datetime(2000, 1, 1)),
        (datetime(2000, 2, 2), datetime(2000, 1, 2))]


def test_round_func_float_nulls(spark, numfoo):
    # testRoundFuc over the float column: null rows stay null
    out = druid_sql(spark, """
        SELECT f1, round(f1) AS r FROM druid.numfoo ORDER BY __time
    """, numfoo).collect()
    got = [(r.f1, r.r) for r in out]
    assert got[0] == (1.0, 1.0)
    assert abs(got[1][0] - 0.1) < 1e-6 and got[1][1] == 0.0
    assert got[2] == (0.0, 0.0)
    assert got[3:] == [(None, None)] * 3


def test_union_all_same_table_twice(spark, reg):
    # testUnionAllSameTableTwice (sqlCompatible): the MV filter and
    # explode both apply across the union
    out = druid_sql(spark, """
        SELECT dim1, dim2, SUM(m1) AS s, COUNT(*) AS n
        FROM (SELECT * FROM foo UNION ALL SELECT * FROM foo)
        WHERE dim2 = 'a' OR dim2 = 'def'
        GROUP BY dim1, dim2 ORDER BY dim1
    """, reg).collect()
    assert [(r.dim1, r.dim2, r.s, r.n) for r in out] == [
        ("", "a", 2.0, 2), ("1", "a", 8.0, 2)]


def test_union_all_queries_with_limit(spark, reg):
    # testUnionAllQueriesWithLimit
    out = druid_sql(spark, """
        SELECT * FROM (
          SELECT COUNT(*) AS c FROM foo
          UNION ALL SELECT SUM(cnt) AS c FROM foo
          UNION ALL SELECT COUNT(*) AS c FROM foo
        ) LIMIT 2
    """, reg).collect()
    assert [r.c for r in out] == [6, 6]


# -- ORDER BY first/last aggregates and null handling ------------------------


def test_order_by_earliest_float(spark, numfoo):
    # testOrderByEarliestFloat (sqlCompatible: null aggregates sort
    # FIRST ascending; dim1 breaks ties deterministically here)
    out = druid_sql(spark, """
        SELECT dim1, EARLIEST(f1) AS v FROM druid.numfoo
        GROUP BY 1 ORDER BY 2, 1 LIMIT 10
    """, numfoo).collect()
    got = [(r.dim1, r.v) for r in out]
    assert got[:3] == [("1", None), ("abc", None), ("def", None)]
    assert got[3] == ("2", 0.0)
    assert got[4][0] == "10.1" and abs(got[4][1] - 0.1) < 1e-6
    assert got[5] == ("", 1.0)


def test_order_by_latest_long(spark, numfoo):
    # testOrderByLatestLong (sqlCompatible branch)
    out = druid_sql(spark, """
        SELECT dim1, LATEST(l1) AS v FROM druid.numfoo
        GROUP BY 1 ORDER BY 2, 1 LIMIT 10
    """, numfoo).collect()
    assert [(r.dim1, r.v) for r in out] == [
        ("1", None), ("abc", None), ("def", None),
        ("2", 0), ("", 7), ("10.1", 325323)]


def test_null_long_filter(spark, numfoo):
    # testNullLongFilter (sqlCompatible: 3 null rows)
    out = druid_sql(spark, """
        SELECT COUNT(*) AS n FROM druid.numfoo WHERE l1 IS NULL
    """, numfoo).first()
    assert out["n"] == 3


def test_null_double_topn(spark, numfoo):
    # testNullDoubleTopN (sqlCompatible: nulls sort LAST descending)
    out = druid_sql(spark, """
        SELECT d1, COUNT(*) AS n FROM druid.numfoo
        GROUP BY d1 ORDER BY d1 DESC LIMIT 10
    """, numfoo).collect()
    assert [(r.d1, r.n) for r in out] == [
        (1.7, 1), (1.0, 1), (0.0, 1), (None, 3)]


def test_null_string_equality(spark, reg):
    # testNullStringEquality: `= null` never matches
    out = druid_sql(spark, """
        SELECT COUNT(*) AS n FROM druid.foo WHERE NULLIF(dim2, 'a') = null
    """, reg).first()
    assert out["n"] == 0


def test_null_empty_string_equality(spark, reg):
    # testNullEmptyStringEquality (sqlCompatible: IS NULL on the MV
    # expression matches rows whose mapped value carries a null
    # element — ['a']->null, []->null, raw null->null: 4 rows)
    out = druid_sql(spark, """
        SELECT COUNT(*) AS n FROM druid.foo
        WHERE NULLIF(dim2, 'a') IS NULL
    """, reg).first()
    assert out["n"] == 4


def test_simple_long_aggregations(spark, numfoo):
    # testSimpleLongAggregations
    out = druid_sql(spark, """
        SELECT MIN(l1) AS a, MIN(cnt) AS b, MAX(l1) AS c
        FROM druid.numfoo
    """, numfoo).first()
    assert tuple(out) == (0, 1, 325323)


def test_sum_of_extraction_fn(spark, reg):
    # testSumOfExtractionFn: SUBSTRING + CAST + SUM coercion
    out = druid_sql(spark, """
        SELECT SUM(CAST(SUBSTRING(dim1, 1, 10) AS INTEGER)) AS s
        FROM druid.foo
    """, reg).first()
    assert out["s"] == 13


# -- planner-config contexts -------------------------------------------------


def test_require_time_condition_positive(spark, reg):
    # testRequireTimeConditionPositive: a __time filter satisfies the
    # connection flag
    out = druid_sql(spark, """
        SELECT COUNT(*) AS n FROM druid.foo
        WHERE __time >= TIMESTAMP '2000-01-01 00:00:00'
    """, reg, context={"requireTimeCondition": True}).first()
    assert out["n"] == 6


def test_require_time_condition_negative(spark, reg):
    # testRequireTimeConditionSimpleQueryNegative: rejected without one
    with pytest.raises(ValueError, match="requireTimeCondition"):
        druid_sql(spark, "SELECT COUNT(*) AS n FROM druid.foo",
                  reg, context={"requireTimeCondition": True})


def test_require_time_condition_literal_query(spark, reg):
    # testRequireTimeConditionLogicalValuePositive: literal-only
    # queries (no datasource scan) are exempt
    out = druid_sql(spark, "SELECT 1 + 1 AS v", reg,
                    context={"requireTimeCondition": True}).first()
    assert out["v"] == 2


# -- timeseries-shaped SQL family --------------------------------------------


def test_timeseries_time_floor_with_origin(spark, reg):
    # testTimeseriesUsingTimeFloorWithOrigin: monthly buckets aligned
    # to the 01:02:03 origin
    out = druid_sql(spark, """
        SELECT SUM(cnt) AS s, gran FROM (
          SELECT TIME_FLOOR(__time, 'P1M',
                            TIMESTAMP '1970-01-01 01:02:03') AS gran,
                 cnt FROM druid.foo
        ) AS x GROUP BY gran ORDER BY gran
    """, reg).collect()
    assert [(r.s, r.gran) for r in out] == [
        (1, datetime(1999, 12, 1, 1, 2, 3)),
        (2, datetime(2000, 1, 1, 1, 2, 3)),
        (1, datetime(2000, 12, 1, 1, 2, 3)),
        (2, datetime(2001, 1, 1, 1, 2, 3))]


def test_timeseries_time_floor_with_time_shift(spark, reg):
    # testTimeseriesUsingTimeFloorWithTimeShift
    out = druid_sql(spark, """
        SELECT SUM(cnt) AS s, gran FROM (
          SELECT TIME_FLOOR(TIME_SHIFT(__time, 'P1D', -1), 'P1M') AS gran,
                 cnt FROM druid.foo
        ) AS x GROUP BY gran ORDER BY gran
    """, reg).collect()
    assert [(r.s, r.gran) for r in out] == [
        (1, datetime(1999, 12, 1)), (2, datetime(2000, 1, 1)),
        (1, datetime(2000, 12, 1)), (2, datetime(2001, 1, 1))]


def test_timeseries_time_floor_with_timestampadd(spark, reg):
    # testTimeseriesUsingTimeFloorWithTimestampAdd (same buckets via
    # TIMESTAMPADD)
    out = druid_sql(spark, """
        SELECT SUM(cnt) AS s, gran FROM (
          SELECT TIME_FLOOR(TIMESTAMPADD(DAY, -1, __time), 'P1M') AS gran,
                 cnt FROM druid.foo
        ) AS x GROUP BY gran ORDER BY gran
    """, reg).collect()
    assert [(r.s, r.gran) for r in out] == [
        (1, datetime(1999, 12, 1)), (2, datetime(2000, 1, 1)),
        (1, datetime(2000, 12, 1)), (2, datetime(2001, 1, 1))]


def test_timeseries_using_cast_as_date(spark, reg):
    # testTimeseriesUsingCastAsDate
    from datetime import date
    out = druid_sql(spark, """
        SELECT SUM(cnt) AS s, dt FROM (
          SELECT CAST(__time AS DATE) AS dt, cnt FROM druid.foo
        ) AS x GROUP BY dt ORDER BY dt
    """, reg).collect()
    assert [(r.s, r.dt) for r in out] == [
        (1, date(2000, 1, 1)), (1, date(2000, 1, 2)),
        (1, date(2000, 1, 3)), (1, date(2001, 1, 1)),
        (1, date(2001, 1, 2)), (1, date(2001, 1, 3))]


def test_timeseries_with_limit_and_offset(spark, reg):
    # testTimeseriesWithLimitAndOffset
    out = druid_sql(spark, """
        SELECT gran, SUM(cnt) AS s
        FROM (SELECT floor(__time TO month) AS gran, cnt
              FROM druid.foo) AS x
        GROUP BY gran
        ORDER BY gran
        LIMIT 2 OFFSET 1
    """, reg).collect()
    assert [(r.gran, r.s) for r in out] == [(datetime(2001, 1, 1), 3)]


def test_project_after_sort(spark, reg):
    # testProjectAfterSort: outer projection drops the sort key; inner
    # groupBy explodes dim2 so dim1 appears once per element group
    out = druid_sql(spark, """
        select dim1 from (select dim1, dim2, count(*) cnt
                          from druid.foo group by dim1, dim2
                          order by cnt)
    """, reg).collect()
    assert sorted(r.dim1 for r in out) == ["", "1", "10.1", "2",
                                           "abc", "def"]


def test_postagg_with_timeseries_shape(spark, reg):
    # testPostAggWithTimeseries (sqlCompatible): MV filter + yearly
    # buckets + additive post-aggregation, descending
    out = druid_sql(spark, """
        SELECT FLOOR(__time TO YEAR) AS y, SUM(m1) AS a,
               SUM(m1) + SUM(m2) AS b
        FROM druid.foo
        WHERE dim2 = 'a'
        GROUP BY FLOOR(__time TO YEAR)
        ORDER BY FLOOR(__time TO YEAR) desc
    """, reg).collect()
    assert [(r.y, r.a, r.b) for r in out] == [
        (datetime(2001, 1, 1), 4.0, 8.0), (datetime(2000, 1, 1), 1.0, 2.0)]


# -- misc select / union / outer-limit shapes --------------------------------


def test_union_all_same_table_three_times(spark, reg):
    # testUnionAllSameTableThreeTimes (sqlCompatible)
    out = druid_sql(spark, """
        SELECT dim1, dim2, SUM(m1) AS s, COUNT(*) AS n
        FROM (SELECT * FROM foo UNION ALL SELECT * FROM foo
              UNION ALL SELECT * FROM foo)
        WHERE dim2 = 'a' OR dim2 = 'def'
        GROUP BY dim1, dim2 ORDER BY dim1
    """, reg).collect()
    assert [(r.dim1, r.dim2, r.s, r.n) for r in out] == [
        ("", "a", 3.0, 3), ("1", "a", 12.0, 3)]


def test_values_containing_null(spark, reg):
    # testValuesContainingNull / testMultipleValuesContainingNull
    out = druid_sql(spark, """
        SELECT * FROM (VALUES (NULL, 'United States'), ('Delhi', 'India'))
    """, reg).collect()
    assert [tuple(r) for r in out] == [
        (None, "United States"), ("Delhi", "India")]


def test_select_constant_regexp_extract(spark, reg):
    # testSelectConstantExpression
    out = druid_sql(spark,
                    "SELECT REGEXP_EXTRACT('foo', '^(.)') AS v", reg).first()
    assert out["v"] == "f"


def test_radians_and_degrees(spark, reg):
    # testRadiansAndDegrees (adapted to foo's m1/m2): row dim1='1' has
    # m1=4, m2=4
    import math
    out = druid_sql(spark, """
        SELECT RADIANS(m1 * 15) / DEGREES(m2) AS v
        FROM foo WHERE dim1 = '1'
    """, reg).first()
    assert abs(out["v"] - math.radians(60) / math.degrees(4)) < 1e-12


def test_timeseries_with_order_by_and_limit(spark, reg):
    # testTimeseriesWithOrderByAndLimit
    out = druid_sql(spark, """
        SELECT gran, SUM(cnt) AS s
        FROM (SELECT floor(__time TO month) AS gran, cnt
              FROM druid.foo) AS x
        GROUP BY gran ORDER BY gran LIMIT 1
    """, reg).collect()
    assert [(r.gran, r.s) for r in out] == [(datetime(2000, 1, 1), 3)]


def test_topn_limit_wrapping_outer_context(spark, reg):
    # testTopNLimitWrapping (sqlCompatible): the sqlOuterLimit context
    # caps the ordered groupBy
    out = druid_sql(spark, """
        SELECT dim1, COUNT(*) AS n FROM druid.foo
        GROUP BY dim1 ORDER BY dim1 DESC
    """, reg, context={"sqlOuterLimit": 2}).collect()
    assert [(r.dim1, r.n) for r in out] == [("def", 1), ("abc", 1)]


def test_empty_group_with_offset_joined(spark, reg):
    # testEmptyGroupWithOffsetDoesntInfiniteLoop: the OFFSET 1 empties
    # the single-row ungrouped aggregate; the LEFT JOIN keeps nothing
    out = druid_sql(spark, """
        SELECT r0.c AS c0, r1.c AS c1
        FROM (
          SELECT COUNT(*) AS c FROM "foo" GROUP BY () OFFSET 1
        ) AS r0
        LEFT JOIN (
          SELECT COUNT(*) AS c FROM "foo" GROUP BY ()
        ) AS r1 ON TRUE LIMIT 10
    """, reg).collect()
    assert out == []


def test_prune_dead_aggregators(spark, reg):
    # testPruneDeadAggregators: the constant CASE keeps only SUM(m1)
    out = druid_sql(spark, """
        SELECT
          CASE 'foo'
          WHEN 'bar' THEN SUM(cnt)
          WHEN 'foo' THEN SUM(m1)
          WHEN 'baz' THEN SUM(m2)
          END AS v
        FROM foo
    """, reg).first()
    assert out["v"] == 21.0


def test_prune_dead_aggregators_through_having(spark, reg):
    # testPruneDeadAggregatorsThroughHaving
    out = druid_sql(spark, """
        SELECT
          CASE 'foo'
          WHEN 'bar' THEN SUM(cnt)
          WHEN 'foo' THEN SUM(m1)
          WHEN 'baz' THEN SUM(m2)
          END AS theCase
        FROM foo
        HAVING theCase = 21
    """, reg).collect()
    assert [r.theCase for r in out] == [21.0]


def test_postagg_with_topn(spark, reg):
    # testPostAggWithTopN (sqlCompatible): MV filter + per-m1 groups
    # with additive post-aggregation
    out = druid_sql(spark, """
        SELECT AVG(m2) AS a, SUM(m1) + SUM(m2) AS b
        FROM druid.foo
        WHERE dim2 = 'a'
        GROUP BY m1 ORDER BY m1 LIMIT 5
    """, reg).collect()
    assert [(r.a, r.b) for r in out] == [(1.0, 2.0), (4.0, 8.0)]


def test_return_empty_rows_for_filtered_constant_group_by(spark, reg):
    # testReturnEmptyRowWhenGroupByIsConvertedToTimeseriesWith
    # SingleConstantDimension: grouping by a constant over ZERO rows
    # returns no rows (grouped, not the ungrouped single row)
    out1 = druid_sql(spark, """
        SELECT 'A' AS v from foo WHERE m1 = 50 AND dim1 = 'wat'
        GROUP BY 'foobar'
    """, reg).collect()
    out2 = druid_sql(spark, """
        SELECT 'A' AS v from foo WHERE dim1 = 'wat' GROUP BY dim1
    """, reg).collect()
    assert out1 == [] and out2 == []


def test_timeseries_los_angeles_via_query_context(spark, reg):
    # testTimeseriesLosAngelesViaQueryContext: sqlTimeZone shifts the
    # month buckets to LA-local boundaries; foo's midnight-UTC rows
    # fall in the PREVIOUS LA month
    out = druid_sql(spark, """
        SELECT SUM(cnt) AS s, gran FROM (
          SELECT FLOOR(__time TO MONTH) AS gran, cnt FROM druid.foo
        ) AS x GROUP BY gran ORDER BY gran
    """, reg, context={"sqlTimeZone": "America/Los_Angeles"}).collect()
    # buckets are the UTC instants of the LA month starts
    la_months = [(1, datetime(1999, 12, 1, 8)),
                 (2, datetime(2000, 1, 1, 8)),
                 (1, datetime(2000, 12, 1, 8)),
                 (2, datetime(2001, 1, 1, 8))]
    assert [(r.s, r.gran) for r in out] == la_months


def test_group_by_extract_floor_time_los_angeles(spark, reg):
    # testGroupByExtractFloorTimeLosAngeles: year extraction on
    # LA-local year boundaries splits the two UTC years into three
    out = druid_sql(spark, """
        SELECT EXTRACT(YEAR FROM FLOOR(__time TO YEAR)) AS "year",
               SUM(cnt) AS s
        FROM druid.foo
        GROUP BY EXTRACT(YEAR FROM FLOOR(__time TO YEAR))
        ORDER BY 1
    """, reg, context={"sqlTimeZone": "America/Los_Angeles"}).collect()
    assert [(r["year"], r.s) for r in out] == [
        (1999, 1), (2000, 3), (2001, 2)]


def test_timeseries_with_limit_no_topn(spark, reg):
    # testTimeseriesWithLimitNoTopN
    out = druid_sql(spark, """
        SELECT gran, SUM(cnt) AS s
        FROM (SELECT floor(__time TO month) AS gran, cnt
              FROM druid.foo) AS x
        GROUP BY gran ORDER BY gran LIMIT 1
    """, reg).collect()
    assert [(r.gran, r.s) for r in out] == [(datetime(2000, 1, 1), 3)]
