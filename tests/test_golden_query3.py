"""Golden tests mined from the ~160 CalciteQueryTest.java methods not
covered by the foo/foo2 tranches (sql/src/test/java/org/apache/druid/
sql/calcite/CalciteQueryTest.java). Families: EARLIEST/LATEST/ANY
aggregators (incl. _BY and subquery forms), HAVING-on-aggregate,
exact/approx COUNT DISTINCT, UNION ALL mapping, timeseries-shaped
subqueries, GROUPING SETS, null numeric filters/topN, lookups,
HUMAN_READABLE_* formats, STRING_AGG on MVs, unicode filters.

Fixtures: foo (FIXTURES.md §1), the FULL numfoo
(CalciteTests.RAW_ROWS1_WITH_NUMERIC_DIMS — scalar post-ingest dim2,
MV dim3, dim4/5/6, nullable numerics), foo2 (CalciteTests.RAW_ROWS2).
Expected rows are the SQL-compatible (useDefault=false) branch.

Reference-planner artifacts are pinned as DOCUMENTED DIVERGENCES
inline: DESC null position (nulls last per standard SQL; Druid's
inverted comparators emit nulls first) and tie order under a
single-key ORDER BY (Druid breaks ties by dimension order; this
engine leaves ties unordered, so such tests compare as multisets).
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import types as T

from apache_druid_spark.model.datasource import DatasourceRegistry
from apache_druid_spark.sql.dialect import druid_sql

from test_golden_foo import FOO_ROWS, FOO_SCHEMA

NUMFOO_SCHEMA = T.StructType([
    T.StructField("__time", T.TimestampType()),
    T.StructField("dim1", T.StringType()),
    T.StructField("dim2", T.StringType()),     # scalar post-ingest
    T.StructField("dim3", T.ArrayType(T.StringType())),
    T.StructField("dim4", T.StringType()),
    T.StructField("dim5", T.StringType()),
    T.StructField("dim6", T.StringType()),
    T.StructField("cnt", T.LongType()),
    T.StructField("m1", T.FloatType()),
    T.StructField("m2", T.DoubleType()),
    T.StructField("d1", T.DoubleType()),
    T.StructField("d2", T.DoubleType()),
    T.StructField("f1", T.FloatType()),
    T.StructField("f2", T.FloatType()),
    T.StructField("l1", T.LongType()),
    T.StructField("l2", T.LongType()),
])

NUMFOO_ROWS = [
    (datetime(2000, 1, 1), "", "a", ["a", "b"], "a", "aa", "1",
     1, 1.0, 1.0, 1.0, None, 1.0, None, 7, None),
    (datetime(2000, 1, 2), "10.1", None, ["b", "c"], "a", "ab", "2",
     1, 2.0, 2.0, 1.7, 1.7, 0.1, 0.1, 325323, 325323),
    (datetime(2000, 1, 3), "2", "", ["d"], "a", "ba", "3",
     1, 3.0, 3.0, 0.0, 0.0, 0.0, 0.0, 0, 0),
    (datetime(2001, 1, 1), "1", "a", [""], "b", "ad", "4",
     1, 4.0, 4.0, None, None, None, None, None, None),
    (datetime(2001, 1, 2), "def", "abc", [], "b", "aa", "5",
     1, 5.0, 5.0, None, None, None, None, None, None),
    (datetime(2001, 1, 3), "abc", None, None, "b", "ab", "6",
     1, 6.0, 6.0, None, None, None, None, None, None),
]

FOO2_ROWS = [
    (datetime(2000, 1, 1), "דרואיד", "he", 10, 1.0),
    (datetime(2000, 1, 1), "druid", "en", 11, 1.0),
    (datetime(2000, 1, 1), "друид", "ru", 12, 1.0),
]
FOO2_SCHEMA = ("__time timestamp, dim1 string, dim2 string, "
               "dim3 long, m1 double")


@pytest.fixture(scope="module")
def reg(spark):
    r = DatasourceRegistry(spark)
    r.register("foo", spark.createDataFrame(FOO_ROWS, FOO_SCHEMA))
    r.register("numfoo", spark.createDataFrame(NUMFOO_ROWS, NUMFOO_SCHEMA))
    r.register("foo2", spark.createDataFrame(
        FOO2_ROWS, T._parse_datatype_string(FOO2_SCHEMA)))
    r.register_lookup("lookyloo", {"a": "xa", "abc": "xabc",
                                   "nosuchkey": "mysteryvalue", "6": "x6"})
    return r


def rows(spark, reg, sql, ctx=None):
    return [tuple(r) for r in
            druid_sql(spark, sql, reg, context=ctx).collect()]


def _key(t):
    return tuple((v is None, v) for v in t)


def same_rows(got, expected):
    """Order-insensitive multiset compare."""
    return sorted(got, key=_key) == sorted(expected, key=_key)


# =====================================================================
# EARLIEST / LATEST / ANY aggregators
# =====================================================================


def test_latest_aggregators(spark, reg):
    # testLatestAggregators — LATEST by __time and LATEST_BY an
    # arbitrary long-millis column, over plain and expression inputs
    out = rows(spark, reg, """
        SELECT
        LATEST(cnt), LATEST(m1), LATEST(dim1, 10),
        LATEST(cnt + 1), LATEST(m1 + 1),
        LATEST(dim1 || CAST(cnt AS VARCHAR), 10),
        LATEST_BY(cnt, MILLIS_TO_TIMESTAMP(l1)),
        LATEST_BY(m1, MILLIS_TO_TIMESTAMP(l1)),
        LATEST_BY(dim1, MILLIS_TO_TIMESTAMP(l1), 10),
        LATEST_BY(cnt + 1, MILLIS_TO_TIMESTAMP(l1)),
        LATEST_BY(m1 + 1, MILLIS_TO_TIMESTAMP(l1)),
        LATEST_BY(dim1 || CAST(cnt AS VARCHAR), MILLIS_TO_TIMESTAMP(l1), 10)
        FROM druid.numfoo
    """)
    assert out == [(1, 6.0, "abc", 2, 7.0, "abc1",
                    1, 2.0, "10.1", 2, 3.0, "10.11")]


def test_latest_aggregators_numeric_null(spark, reg):
    # testLatestAggregatorsNumericNull — last row's numerics are null
    assert rows(spark, reg,
                "SELECT LATEST(l1), LATEST(d1), LATEST(f1) "
                "FROM druid.numfoo") == [(None, None, None)]


def test_any_aggregator(spark, reg):
    # testAnyAggregator — deterministic in practice: first value
    assert rows(spark, reg, """
        SELECT
        ANY_VALUE(cnt), ANY_VALUE(m1), ANY_VALUE(m2), ANY_VALUE(dim1, 10),
        ANY_VALUE(cnt + 1), ANY_VALUE(m1 + 1),
        ANY_VALUE(dim1 || CAST(cnt AS VARCHAR), 10)
        FROM druid.foo
    """) == [(1, 1.0, 1.0, "", 2, 2.0, "1")]


def test_any_aggregators_numeric_nulls(spark, reg):
    # testAnyAggregatorsOffHeapNumericNulls — ANY skips nulls when a
    # non-null value exists in the group
    out = rows(spark, reg,
               "SELECT ANY_VALUE(l1), ANY_VALUE(d1), ANY_VALUE(f1) "
               "FROM druid.numfoo GROUP BY dim2")
    assert same_rows(out, [
        (325323, 1.7, 0.10000000149011612),
        (0, 0.0, 0.0),
        (7, 1.0, 1.0),
        (None, None, None),
    ])


def test_any_aggregators_skip_nulls_with_filter(spark, reg):
    # testAnyAggregatorsSkipNullsWithFilter
    out = rows(spark, reg,
               "SELECT ANY_VALUE(dim1, 32), ANY_VALUE(l2), "
               "ANY_VALUE(d2), ANY_VALUE(f2) FROM druid.numfoo "
               "WHERE dim1 IS NOT NULL AND l2 IS NOT NULL AND "
               "d2 IS NOT NULL AND f2 is NOT NULL")
    assert out[0][0] == "10.1"
    assert out[0][1] == 325323
    assert out[0][2] == 1.7
    assert out[0][3] == pytest.approx(0.1, rel=1e-6)


def test_primitive_latest_in_subquery(spark, reg):
    # testPrimitiveLatestInSubquery — LATEST per dim2 element group
    # then summed: groups null/''/a/abc -> m1 last values 6,3,4,5
    assert rows(spark, reg,
                "SELECT SUM(val1), SUM(val2), SUM(val3) FROM "
                "(SELECT dim2, LATEST(m1) AS val1, LATEST(cnt) AS "
                "val2, LATEST(m2) AS val3 FROM foo GROUP BY dim2)") \
        == [(18.0, 4, 18.0)]


def test_primitive_earliest_in_subquery(spark, reg):
    # testPrimitiveEarliestInSubquery
    assert rows(spark, reg,
                "SELECT SUM(val1), SUM(val2), SUM(val3) FROM "
                "(SELECT dim2, EARLIEST(m1) AS val1, EARLIEST(cnt) AS "
                "val2, EARLIEST(m2) AS val3 FROM foo GROUP BY dim2)") \
        == [(11.0, 4, 11.0)]


def test_primitive_any_in_subquery(spark, reg):
    # testPrimitiveAnyInSubquery
    assert rows(spark, reg,
                "SELECT SUM(val1), SUM(val2), SUM(val3) FROM "
                "(SELECT dim2, ANY_VALUE(m1) AS val1, ANY_VALUE(cnt) "
                "AS val2, ANY_VALUE(m2) AS val3 FROM foo GROUP BY dim2)") \
        == [(11.0, 4, 11.0)]


def test_string_any_in_subquery(spark, reg):
    # testStringAnyInSubquery — SUM of CAST-to-number ANY strings:
    # groups yield '10.1', '2', '', 'abc' -> 10.1 + 2 + null + null
    assert rows(spark, reg,
                "SELECT SUM(val) FROM (SELECT dim2, "
                "ANY_VALUE(dim1, 10) AS val FROM foo GROUP BY dim2)") \
        == [(12.1,)]


def test_order_by_earliest_double(spark, reg):
    # testOrderByEarliestDouble — values pinned; ORDER BY 2 ties and
    # null position compared order-insensitively (Druid breaks ties
    # by dimension; nulls sort first in its numeric ordering)
    out = rows(spark, reg,
               "SELECT dim1, EARLIEST(d1) FROM druid.numfoo "
               "GROUP BY 1 ORDER BY 2 LIMIT 10")
    assert same_rows(out, [("1", None), ("abc", None), ("def", None),
                           ("2", 0.0), ("", 1.0), ("10.1", 1.7)])
    vals = [v for _, v in out if v is not None]
    assert vals == sorted(vals)


def test_order_by_latest_float(spark, reg):
    # testOrderByLatestFloat
    out = rows(spark, reg,
               "SELECT dim1, LATEST(f1) FROM druid.numfoo "
               "GROUP BY 1 ORDER BY 2 LIMIT 10")
    got = {d: (None if v is None else round(v, 6)) for d, v in out}
    assert got == {"1": None, "abc": None, "def": None,
                   "2": 0.0, "10.1": 0.1, "": 1.0}


def test_order_by_any_long(spark, reg):
    # testOrderByAnyLong
    out = rows(spark, reg,
               "SELECT dim1, ANY_VALUE(l1) FROM druid.numfoo "
               "GROUP BY 1 ORDER BY 2 LIMIT 10")
    assert dict(out) == {"2": 0, "": 7, "10.1": 325323,
                         "1": None, "abc": None, "def": None}


def test_earliest_latest_by_invalid_timestamp(spark, reg):
    # testEarliestByInvalidTimestamp / testLatestByInvalidTimestamp:
    # the reference REJECTS a BIGINT second argument at validation.
    # DOCUMENTED DIVERGENCE (superset): min_by/max_by accept any
    # orderable key, so the query executes with the obvious meaning.
    assert rows(spark, reg,
                "SELECT EARLIEST_BY(m1, l1), LATEST_BY(m1, l1) "
                "FROM druid.numfoo") == [(3.0, 2.0)]


# =====================================================================
# HAVING / exact+approx COUNT DISTINCT
# =====================================================================


def test_having_on_grand_total(spark, reg):
    # testHavingOnGrandTotal
    assert rows(spark, reg,
                "SELECT SUM(m1) AS m1_sum FROM foo HAVING m1_sum = 21") \
        == [(21.0,)]


def test_having_on_double_sum(spark, reg):
    # testHavingOnDoubleSum
    out = rows(spark, reg,
               "SELECT dim1, SUM(m1) AS m1_sum FROM druid.foo "
               "GROUP BY dim1 HAVING SUM(m1) > 1")
    assert same_rows(out, [("1", 4.0), ("10.1", 2.0), ("2", 3.0),
                           ("abc", 6.0), ("def", 5.0)])


def test_having_on_float_sum(spark, reg):
    # testHavingOnFloatSum
    out = rows(spark, reg,
               "SELECT dim1, CAST(SUM(m1) AS FLOAT) AS m1_sum FROM "
               "druid.foo GROUP BY dim1 HAVING CAST(SUM(m1) AS FLOAT) > 1")
    assert same_rows(out, [("1", 4.0), ("10.1", 2.0), ("2", 3.0),
                           ("abc", 6.0), ("def", 5.0)])


def test_having_on_exact_count_distinct(spark, reg):
    # testHavingOnExactCountDistinct / testHavingOnApproximateCount
    # Distinct (same SQL; this engine resolves COUNT(DISTINCT) exactly)
    out = rows(spark, reg,
               "SELECT dim2, COUNT(DISTINCT m1) FROM druid.foo "
               "GROUP BY dim2 HAVING COUNT(DISTINCT m1) > 1")
    assert same_rows(out, [(None, 2), ("a", 2)])


def test_exact_count_distinct_with_filter(spark, reg):
    # testExactCountDistinctWithFilter
    assert rows(spark, reg,
                "SELECT COUNT(DISTINCT foo.dim1) FILTER(WHERE "
                "foo.cnt = 1), SUM(foo.cnt) FROM druid.foo") \
        == [(6, 6)]


def test_compare_exact_and_approximate_count_distinct(spark, reg):
    # testCompareExactAndApproximateCountDistinctUsingSubquery
    assert rows(spark, reg, """
        SELECT
          COUNT(*) AS exact_count,
          COUNT(DISTINCT dim1) AS approx_count,
          (CAST(1 AS FLOAT) - COUNT(DISTINCT dim1) / COUNT(*)) * 100
              AS error_pct
        FROM (SELECT DISTINCT dim1 FROM druid.foo WHERE dim1 <> '')
    """) == [(5, 5, 0.0)]


def test_approx_count_distinct_builtin(spark, reg):
    # testApproxCountDistinctBuiltin — over MV dim2 elements
    assert rows(spark, reg,
                "SELECT APPROX_COUNT_DISTINCT_BUILTIN(dim2) "
                "FROM druid.foo") == [(3,)]


def test_approx_count_distinct_redundant_distinct(spark, reg):
    # testApproxCountDistinct's `APPROX_COUNT_DISTINCT(distinct x)`
    # spelling — Calcite tolerates the keyword
    assert rows(spark, reg,
                "SELECT APPROX_COUNT_DISTINCT(distinct dim1) "
                "FROM druid.foo WHERE dim1 <> ''") == [(5,)]


def test_exact_count_distinct_of_semi_join_result(spark, reg):
    # testExactCountDistinctOfSemiJoinResult
    assert rows(spark, reg, """
        SELECT COUNT(*)
        FROM (
          SELECT DISTINCT dim2
          FROM druid.foo
          WHERE SUBSTRING(dim2, 1, 1) IN (
            SELECT SUBSTRING(dim1, 1, 1) FROM druid.foo
            WHERE dim1 <> '')
        )
    """) == [(2,)]


def test_double_nested_group_by2(spark, reg):
    # testDoubleNestedGroupBy2
    assert rows(spark, reg, """
        SELECT MAX(cnt) FROM (
          SELECT dim2, MAX(t1.cnt) cnt FROM (
            SELECT dim1, dim2, COUNT(*) cnt
            FROM druid.foo GROUP BY dim1, dim2
          ) t1 GROUP BY dim2
        ) t2
    """) == [(1,)]


def test_histogram_using_subquery_with_sort(spark, reg):
    # testHistogramUsingSubqueryWithSort
    assert rows(spark, reg, """
        SELECT CAST(thecnt AS VARCHAR), COUNT(*)
        FROM (SELECT dim2, SUM(cnt) AS thecnt FROM druid.foo
              GROUP BY dim2)
        GROUP BY CAST(thecnt AS VARCHAR)
        ORDER BY CAST(thecnt AS VARCHAR) LIMIT 2
    """) == [("1", 2), ("2", 2)]


# =====================================================================
# UNION ALL
# =====================================================================


def test_union_all_different_tables_with_mapping(spark, reg):
    # testUnionAllDifferentTablesWithMapping (scalar-dim2 numfoo side;
    # MV dim2 = 'a' matches any element on the foo side)
    out = rows(spark, reg, """
        SELECT dim1, dim2, SUM(m1), COUNT(*)
        FROM (SELECT dim1, dim2, m1 FROM foo
              UNION ALL SELECT dim1, dim2, m1 FROM numfoo)
        WHERE dim2 = 'a' OR dim2 = 'def'
        GROUP BY 1, 2
    """)
    assert same_rows(
        [(a, b, c, d) for a, b, c, d in out],
        [("", "a", 2.0, 2), ("1", "a", 8.0, 2)])


def test_union_all_tables_column_type_mismatch_string_long(spark, reg):
    # testUnionAllTablesColumnTypeMismatchStringLong is UNPLANNABLE in
    # the reference (dim3 string vs long union). DOCUMENTED DIVERGENCE
    # (superset): Spark coerces to a common type and executes.
    out = rows(spark, reg, """
        SELECT dim3, dim2, SUM(m1), COUNT(*)
        FROM (SELECT dim3, dim2, m1 FROM foo2
              UNION ALL SELECT dim3, dim2, m1 FROM numfoo)
        WHERE dim2 = 'a' OR dim2 = 'en'
        GROUP BY 1, 2
    """)
    assert ("11", "en", 1.0, 1) in out or (11, "en", 1.0, 1) in out


def test_union_all_tables_when_mapping_is_required(spark, reg):
    # testUnionAllTablesWhenMappingIsRequired — UNPLANNABLE in the
    # reference (column remapping across tables). Superset: executes.
    out = rows(spark, reg, """
        SELECT c, COUNT(*)
        FROM (SELECT dim1 AS c, m1 FROM foo
              UNION ALL SELECT dim2 AS c, m1 FROM numfoo)
        WHERE c = 'a' OR c = 'def'
        GROUP BY 1
    """)
    assert same_rows(out, [("a", 2), ("def", 1)])


def test_union_all_same_table_twice_with_same_mapping(spark, reg):
    # testUnionAllSameTableTwiceWithSameMapping
    out = rows(spark, reg, """
        SELECT dim1, dim2, SUM(m1), COUNT(*)
        FROM (SELECT dim1, dim2, m1 FROM foo
              UNION ALL SELECT dim1, dim2, m1 FROM foo)
        WHERE dim2 = 'a' OR dim2 = 'def'
        GROUP BY 1, 2
    """)
    assert same_rows(
        out, [("", "a", 2.0, 2), ("1", "a", 8.0, 2)])


# =====================================================================
# timeseries-shaped subqueries / default values
# =====================================================================


def test_timeseries(spark, reg):
    # testTimeseries
    assert rows(spark, reg, """
        SELECT SUM(cnt), gran FROM (
          SELECT floor(__time TO month) AS gran, cnt FROM druid.foo
        ) AS x GROUP BY gran ORDER BY gran
    """) == [(3, datetime(2000, 1, 1)), (3, datetime(2001, 1, 1))]


def test_timeseries_using_time_floor(spark, reg):
    # testTimeseriesUsingTimeFloor
    assert rows(spark, reg, """
        SELECT SUM(cnt), gran FROM (
          SELECT TIME_FLOOR(__time, 'P1M') AS gran, cnt FROM druid.foo
        ) AS x GROUP BY gran ORDER BY gran
    """) == [(3, datetime(2000, 1, 1)), (3, datetime(2001, 1, 1))]


def test_timeseries_using_floor_plus_cast_as_date(spark, reg):
    # testTimeseriesUsingFloorPlusCastAsDate
    out = rows(spark, reg, """
        SELECT SUM(cnt), dt FROM (
          SELECT CAST(FLOOR(__time TO QUARTER) AS DATE) AS dt,
          cnt FROM druid.foo
        ) AS x GROUP BY dt ORDER BY dt
    """)
    assert [(n, str(d)) for n, d in out] == [
        (3, "2000-01-01"), (3, "2001-01-01")]


def test_timeseries_empty_results_aggregator_default_values(spark, reg):
    # testTimeseriesEmptyResultsAggregatorDefaultValues — matching
    # nothing still returns the all-granularity default row
    assert rows(spark, reg, """
        SELECT
         count(*), COUNT(DISTINCT dim1),
         APPROX_COUNT_DISTINCT(distinct dim1),
         sum(d1), max(d1), min(d1), sum(l1), max(l1), min(l1),
         avg(l1), avg(d1)
        FROM druid.numfoo WHERE dim2 = 0
    """) == [(0, 0, 0, None, None, None, None, None, None,
              None, None)]


def test_groupby_nothing_with_impossible_time_filter(spark, reg):
    # testGroupByNothingWithImpossibleTimeFilter
    assert rows(spark, reg, """
        SELECT COUNT(*) FROM druid.foo
        WHERE FLOOR(__time TO DAY) = TIMESTAMP '2000-01-02 01:00:00'
        OR FLOOR(__time TO DAY) = TIMESTAMP '2000-01-02 02:00:00'
    """) == [(0,)]


def test_groupby_filter_matching_nothing_with_group_by_literal(
        spark, reg):
    # testGroupByWithFilterMatchingNothingWithGroupByLiteral
    assert rows(spark, reg,
                "SELECT COUNT(*), MAX(cnt) FROM druid.foo "
                "WHERE dim1 = 'foobar' GROUP BY 'dummy'") == []


def test_group_by_post_aggregator_referencing_time_floor(spark, reg):
    # testGroupByWithPostAggregatorReferencingTimeFloorColumnOnTimeseries
    assert same_rows(rows(spark, reg, """
        SELECT TIME_FORMAT("date", 'yyyy-MM'), SUM(x)
        FROM (
            SELECT FLOOR(__time to hour) as "date", COUNT(*) as x
            FROM foo GROUP BY 1
        ) GROUP BY 1
    """), [("2000-01", 3), ("2001-01", 3)])


# =====================================================================
# GROUPING SETS
# =====================================================================


def test_grouping_sets_with_numeric_dimension(spark, reg):
    # testGroupingSetsWithNumericDimension
    assert same_rows(rows(spark, reg,
                          "SELECT cnt, COUNT(*) FROM foo "
                          "GROUP BY GROUPING SETS ( (cnt), () )"),
                     [(1, 6), (None, 6)])


def test_grouping_sets_with_order_by_dimension(spark, reg):
    # testGroupingSetsWithOrderByDimension (scalar-dim2 numfoo — same
    # dim2 content as the reference's post-ingest foo)
    out = rows(spark, reg, """
        SELECT dim2, gran, SUM(cnt)
        FROM (SELECT FLOOR(__time TO MONTH) AS gran,
                     COALESCE(dim2, '') dim2, cnt FROM druid.numfoo) AS x
        GROUP BY GROUPING SETS ( (), (dim2), (gran) )
        ORDER BY gran, dim2 DESC
    """)
    assert out == [
        ("abc", None, 1), ("a", None, 2), ("", None, 3), (None, None, 6),
        (None, datetime(2000, 1, 1), 3), (None, datetime(2001, 1, 1), 3)]


def test_grouping_sets_with_order_by_aggregator(spark, reg):
    # testGroupingSetsWithOrderByAggregator
    out = rows(spark, reg, """
        SELECT dim2, gran, SUM(cnt)
        FROM (SELECT FLOOR(__time TO MONTH) AS gran,
                     COALESCE(dim2, '') dim2, cnt FROM druid.numfoo) AS x
        GROUP BY GROUPING SETS ( (), (dim2), (gran) )
        ORDER BY SUM(cnt)
    """)
    assert same_rows(out, [
        ("abc", None, 1), ("a", None, 2), ("", None, 3),
        (None, datetime(2000, 1, 1), 3), (None, datetime(2001, 1, 1), 3),
        (None, None, 6)])
    sums = [s for _, _, s in out]
    assert sums == sorted(sums)


def test_grouping_sets_with_order_by_aggregator_with_limit(spark, reg):
    # testGroupingSetsWithOrderByAggregatorWithLimit
    assert rows(spark, reg, """
        SELECT dim2, gran, SUM(cnt)
        FROM (SELECT FLOOR(__time TO MONTH) AS gran,
                     COALESCE(dim2, '') dim2, cnt FROM druid.numfoo) AS x
        GROUP BY GROUPING SETS ( (), (dim2), (gran) )
        ORDER BY SUM(cnt) LIMIT 1
    """) == [("abc", None, 1)]


# =====================================================================
# null numeric filters / topN
# =====================================================================


def test_null_double_float_filter(spark, reg):
    # testNullDoubleFilter / testNullFloatFilter
    assert rows(spark, reg,
                "SELECT COUNT(*) FROM druid.numfoo WHERE d1 IS NULL") \
        == [(3,)]
    assert rows(spark, reg,
                "SELECT COUNT(*) FROM druid.numfoo WHERE f1 IS NULL") \
        == [(3,)]


def test_null_float_topn(spark, reg):
    # testNullFloatTopN — values pinned; the reference's inverted
    # comparator emits the null group FIRST in DESC (documented
    # divergence: standard SQL DESC places nulls last)
    out = rows(spark, reg,
               "SELECT f1, COUNT(*) FROM druid.numfoo "
               "GROUP BY f1 ORDER BY f1 DESC LIMIT 10")
    got = {(None if f is None else round(f, 6)): n for f, n in out}
    assert got == {None: 3, 1.0: 1, 0.1: 1, 0.0: 1}


def test_null_long_topn(spark, reg):
    # testNullLongTopN
    out = rows(spark, reg,
               "SELECT l1, COUNT(*) FROM druid.numfoo "
               "GROUP BY l1 ORDER BY l1 DESC LIMIT 10")
    assert dict(out) == {None: 3, 325323: 1, 7: 1, 0: 1}
    nonnull = [v for v, _ in out if v is not None]
    assert nonnull == [325323, 7, 0]


def test_long_predicate_is_null(spark, reg):
    # testLongPredicateIsNull
    assert [r[0] for r in rows(
        spark, reg, "SELECT l1 is null FROM druid.numfoo")] \
        == [False, False, False, True, True, True]


def test_filter_float_dimension(spark, reg):
    # testFilterFloatDimension
    assert rows(spark, reg,
                "SELECT dim1 FROM numfoo WHERE f1 = 0.1 LIMIT 1") \
        == [("10.1",)]


def test_filter_double_dimension(spark, reg):
    # testFilterDoubleDimension
    assert rows(spark, reg,
                "SELECT dim1 FROM numfoo WHERE d1 = 1.7 LIMIT 1") \
        == [("10.1",)]


# =====================================================================
# lookups
# =====================================================================


def test_filter_and_group_by_lookup(spark, reg):
    # testFilterAndGroupByLookup
    out = rows(spark, reg, """
        SELECT LOOKUP(dim1, 'lookyloo'), COUNT(*) FROM foo
        WHERE LOOKUP(dim1, 'lookyloo') <> 'xxx'
        GROUP BY LOOKUP(dim1, 'lookyloo')
    """)
    assert same_rows(out, [(None, 5), ("xabc", 1)])


def test_count_distinct_of_lookup(spark, reg):
    # testCountDistinctOfLookup
    assert rows(spark, reg,
                "SELECT COUNT(DISTINCT LOOKUP(dim1, 'lookyloo')) "
                "FROM foo") == [(1,)]


def test_group_by_expression_from_lookup(spark, reg):
    # testGroupByExpressionFromLookup
    assert same_rows(rows(spark, reg,
                          "SELECT SUBSTRING(v, 1, 1), COUNT(*) "
                          "FROM lookup.lookyloo GROUP BY 1"),
                     [("m", 1), ("x", 3)])


def test_lookup_with_null(spark, reg):
    # testLookupWithNull — MV dim2 null rows ([]/null). DOCUMENTED
    # DIVERGENCE: the reference's expected scalar NULL comes from
    # Calcite constant-folding lookup(dim2,..) -> null under the
    # `dim2 IS NULL` predicate (the pinned plan carries a literal
    # `null` virtual column); this engine applies the lookup
    # element-wise like every other scalar fn over an MV (its own
    # reference-pinned test_works_like_string_scan maps the null row
    # to [null]), so the lookup output is the single-null MV.
    out = rows(spark, reg,
               "SELECT dim2, lookup(dim2, 'lookyloo') from foo "
               "where dim2 is null")
    assert len(out) == 2
    assert all(v is None or list(v) == [None]
               for r in out for v in r[1:])


# =====================================================================
# misc: unicode, trig, timestampadd, human-readable, subquery filters
# =====================================================================


def test_unicode_filter_and_group_by(spark, reg):
    # testUnicodeFilterAndGroupBy (the U& escape spelled directly)
    assert same_rows(rows(spark, reg, """
        SELECT dim1, dim2, COUNT(*) FROM foo2
        WHERE dim1 LIKE 'דר%' OR dim1 = 'друид'
        GROUP BY dim1, dim2
    """), [("друид", "ru", 1), ("דרואיד", "he", 1)])


def test_trigonometric_function(spark, reg):
    # testTrigonometricFunction (on the empty-match aggregate row)
    out = rows(spark, reg,
               "SELECT exp(count(*)) + 10, sin(pi() / 6), "
               "cos(pi() / 6), tan(pi() / 6) "
               "FROM druid.foo WHERE dim2 = 0")
    assert out[0][0] == 11.0
    assert out[0][1] == pytest.approx(0.5)
    assert out[0][2] == pytest.approx(0.8660254037844387)
    assert out[0][3] == pytest.approx(0.5773502691896257)


def test_timestampadd_zero_periods(spark, reg):
    # testTimeStampAddZeroDayPeriod / ZeroMonthPeriod / ZeroYearPeriod
    for unit in ("DAY", "MONTH", "YEAR"):
        out = rows(spark, reg,
                   f'SELECT TIMESTAMPADD({unit}, 0, "__time") '
                   f"FROM druid.foo")
        assert [r[0] for r in out] == [r[0] for r in FOO_ROWS]


def test_human_readable_format_function(spark, reg):
    # testHumanReadableFormatFunction
    out = rows(spark, reg, """
        SELECT m1,
        HUMAN_READABLE_BINARY_BYTE_FORMAT(45678),
        HUMAN_READABLE_BINARY_BYTE_FORMAT(m1*12345),
        HUMAN_READABLE_BINARY_BYTE_FORMAT(m1*12345, 0),
        HUMAN_READABLE_DECIMAL_BYTE_FORMAT(m1*12345),
        HUMAN_READABLE_DECIMAL_FORMAT(m1*12345),
        HUMAN_READABLE_BINARY_BYTE_FORMAT(l1),
        HUMAN_READABLE_DECIMAL_BYTE_FORMAT(l1),
        HUMAN_READABLE_DECIMAL_FORMAT(l1)
        FROM numfoo WHERE dim1 = '1' LIMIT 1
    """)
    assert out == [(4.0, "44.61 KiB", "48.22 KiB", "48 KiB",
                    "49.38 KB", "49.38 K", None, None, None)]


def test_using_subquery_as_filter_on_two_columns(spark, reg):
    # testUsingSubqueryAsFilterOnTwoColumns
    out = rows(spark, reg, """
        SELECT __time, cnt, dim1, dim2 FROM druid.foo
         WHERE (dim1, dim2) IN (
           SELECT dim1, dim2 FROM (
             SELECT dim1, dim2, COUNT(*)
             FROM druid.foo WHERE dim2 = 'abc'
             GROUP BY dim1, dim2 HAVING COUNT(*) = 1
           )
         )
    """)
    assert [(r[0], r[1], r[2]) for r in out] == [
        (datetime(2001, 1, 2), 1, "def")]


def test_using_subquery_as_filter_with_inner_sort(spark, reg):
    # testUsingSubqueryAsFilterWithInnerSort (sql-compatible branch).
    # DOCUMENTED DIVERGENCE (rendering only): a scanned MV column is
    # returned as the array value (the whole corpus pins lists for
    # bare-MV scans — test_golden_mv.py test_overlap_filter etc.);
    # the reference renders a one-element MV as its scalar. The IN
    # subquery semantics (any-element match against the exploded
    # grouped elements) are what this golden checks.
    out = rows(spark, reg, """
        SELECT dim1, dim2 FROM druid.foo
         WHERE dim2 IN (
           SELECT dim2 FROM druid.foo GROUP BY dim2
           ORDER BY dim2 DESC
         )
    """)
    assert same_rows([(a, tuple(b)) for a, b in out],
                     [("", ("a",)), ("2", ("",)), ("1", ("a",)),
                      ("def", ("abc",))])


def test_using_subquery_with_and_without_limit(spark, reg):
    # testUsingSubqueryWithLimit / testUsingSubqueryWithoutLimit
    assert rows(spark, reg,
                "SELECT COUNT(*) AS cnt FROM "
                "( SELECT * FROM druid.foo LIMIT 10 ) tmpA") == [(6,)]
    assert rows(spark, reg,
                "SELECT COUNT(*) AS cnt FROM "
                "( SELECT * FROM druid.foo ) tmpA") == [(6,)]


def test_group_by_with_literal_in_subquery_grouping(spark, reg):
    # testGroupByWithLiteralInSubqueryGrouping
    out = rows(spark, reg, """
        SELECT t1, t2 FROM (
          SELECT 'dummy' as t1,
            CASE WHEN dim4 = 'b' THEN dim4 ELSE NULL END AS t2
          FROM numfoo GROUP BY dim4
        ) GROUP BY t1, t2
    """)
    assert same_rows(out, [("dummy", None), ("dummy", "b")])


def test_query_context_outer_limit(spark, reg):
    # testQueryContextOuterLimit (sqlOuterLimit = 4)
    out = rows(spark, reg,
               "SELECT dim1 FROM druid.foo GROUP BY dim1 "
               "ORDER BY dim1 DESC", ctx={"sqlOuterLimit": 4})
    assert [r[0] for r in out] == ["def", "abc", "2", "10.1"]
    out2 = rows(spark, reg,
                "SELECT dim1 FROM druid.foo GROUP BY dim1 "
                "ORDER BY dim1 DESC LIMIT 2", ctx={"sqlOuterLimit": 4})
    assert [r[0] for r in out2] == ["def", "abc"]


def test_in_filter(spark, reg):
    # testInFilter
    assert same_rows(rows(spark, reg,
                          "SELECT dim1, COUNT(*) FROM druid.foo WHERE "
                          "dim1 IN ('abc', 'def', 'ghi') GROUP BY dim1"),
                     [("abc", 1), ("def", 1)])


def test_simple_double_float_aggregations(spark, reg):
    # testSimpleDoubleAggregations / testSimpleFloatAggregations
    assert rows(spark, reg,
                "SELECT MIN(d1), MAX(d1) FROM druid.numfoo") \
        == [(0.0, 1.7)]
    assert rows(spark, reg,
                "SELECT MIN(m1), MAX(m1) FROM druid.numfoo") \
        == [(1.0, 6.0)]


def test_count_star(spark, reg):
    # testCountStar
    assert rows(spark, reg, "SELECT COUNT(*) FROM druid.foo") == [(6,)]


def test_expression_filtering_and_grouping_on_string_cast(spark, reg):
    # testExpressionFilteringAndGroupingOnStringCastToNumber
    out = rows(spark, reg, """
        SELECT FLOOR(CAST(dim1 AS FLOAT) / 2) * 2, COUNT(*)
        FROM druid.foo
        WHERE FLOOR(CAST(dim1 AS FLOAT) / 2) * 2 > -1
        GROUP BY FLOOR(CAST(dim1 AS FLOAT) / 2) * 2
        ORDER BY 1 DESC
    """)
    assert out == [(10.0, 1), (2.0, 1), (0.0, 1)]


def test_string_agg_multi_value(spark, reg):
    # testStringAggMultiValue — aggregates MV dim3 ELEMENTS; sql-
    # compatible branch includes the '' element; DISTINCT is sorted
    out = rows(spark, reg,
               "SELECT STRING_AGG(dim3, ','), "
               "STRING_AGG(DISTINCT dim3, ',') FROM foo")
    assert sorted(out[0][0].split(",")) == ["", "a", "b", "b", "c", "d"]
    assert out[0][1] == ",a,b,c,d"


def test_string_agg_expression(spark, reg):
    # testStringAggExpression — sorted DISTINCT over a concat of the
    # MV dim2's elements with dim1
    out = rows(spark, reg,
               "SELECT STRING_AGG(DISTINCT CONCAT(dim1, dim2), ','), "
               "STRING_AGG(DISTINCT CONCAT(dim1, dim2), "
               "CONCAT('|', '|')) FROM foo")
    assert out[0][0] == "1a,2,a,defabc"
    assert out[0][1] == "1a||2||a||defabc"


def test_group_by_limit_pushdown_extraction(spark, reg):
    # testGroupByLimitPushdownExtraction
    assert same_rows(rows(spark, reg,
                          "SELECT dim4, substring(dim5, 1, 1), count(*) "
                          "FROM druid.numfoo WHERE dim4 = 'a' "
                          "GROUP BY 1,2 LIMIT 2"),
                     [("a", "a", 2), ("a", "b", 1)])


def test_common_virtual_expression_with_different_value_type(spark, reg):
    # testCommonVirtualExpressionWithDifferentValueType
    assert rows(spark, reg,
                "SELECT 'A' from foo WHERE m1 = 50 AND dim1 = 'wat' "
                "GROUP BY 'foobar'") == []
    assert rows(spark, reg,
                "SELECT 'A' from foo WHERE dim1 = 'wat' "
                "GROUP BY dim1") == []


def test_return_empty_row_groupby_constant_dims(spark, reg):
    # testReturnEmptyRowWhenGroupByIsConvertedToTimeseriesWith
    # SingleConstantDimension: grouped by a column, matching nothing
    # returns no rows (the reference's single-constant-dim rewrite to
    # timeseries is a planner detail; the result contract is empty)
    assert rows(spark, reg, """
        SELECT dim1, sum(cast(0 as bigint)) as s1,
               sum(cast(0 as double)) as s2
        from druid.foo where dim1 = 'none' group by dim1 limit 1
    """) == []


# -- r13 tranche: the remaining named CalciteQueryTest methods ---------------

def test_grouping_sets_with_dummy_dimension(spark, reg):
    # testGroupingSetsWithDummyDimension: a constant 'dummy' grouping
    # expression collapses inside each set; 11 rows, exactly the
    # reference's SQL-null-branch expectations
    out = rows(spark, reg, """
        SELECT dim2, gran, SUM(cnt)
        FROM (SELECT FLOOR(__time TO MONTH) AS gran,
                     COALESCE(dim2, '') dim2, cnt FROM druid.numfoo) AS x
        GROUP BY GROUPING SETS ( (dim2, 'dummy', gran), (dim2), (gran),
                                 ('dummy') )
    """)
    assert same_rows(out, [
        ("", datetime(2000, 1, 1), 2), ("", datetime(2001, 1, 1), 1),
        ("a", datetime(2000, 1, 1), 1), ("a", datetime(2001, 1, 1), 1),
        ("abc", datetime(2001, 1, 1), 1),
        ("", None, 3), ("a", None, 2), ("abc", None, 1),
        (None, None, 6),
        (None, datetime(2000, 1, 1), 3), (None, datetime(2001, 1, 1), 3)])


def test_timestamp_add_zero_periods(spark, reg):
    # testTimeStampAddZeroMonthPeriod / testTimeStampAddZeroYearPeriod:
    # shifting by a zero period is the identity on __time
    for unit in ("MONTH", "YEAR"):
        out = rows(spark, reg,
                   f"SELECT TIMESTAMPADD({unit}, 0, \"__time\") AS t, "
                   "__time FROM druid.numfoo")
        assert all(t == orig for t, orig in out) and len(out) == 6


def test_time_extract_with_too_few_arguments(spark, reg):
    # testTimeExtractWithTooFewArguments: one-arg TIME_EXTRACT is a
    # planning error (apache/druid#7710 regression pin)
    with pytest.raises(Exception, match="(?i)parameters|arguments"):
        rows(spark, reg, "SELECT TIME_EXTRACT(__time) FROM druid.numfoo")


def test_return_empty_row_when_groupby_converted_to_timeseries(spark,
                                                               reg):
    # testReturnEmptyRowWhenGroupByIsConvertedToTimeseriesWithSingleConstantDimension
    # and testReturnEmptyRowWhenGroupByIsConvertedToTimeseriesWithMutlipleConstantDimensions
    # [sic — upstream typo]: a
    # constant-dimension GROUP BY over a nothing-matches filter yields
    # ZERO rows, not an error
    assert rows(spark, reg,
                "SELECT 'A' from numfoo WHERE m1 = 50 AND dim1 = 'wat' "
                "GROUP BY 'foobar'") == []
    assert rows(spark, reg,
                "SELECT 'A', dim1 from numfoo WHERE m1 = 50 AND "
                "dim1 = 'wat' GROUP BY 'foobar', dim1") == []
    # the non-reduced variant also returns empty (same method, second
    # testQuery): GROUP BY a real dim under the impossible filter
    assert rows(spark, reg,
                "SELECT 'A' from numfoo WHERE dim1 = 'wat' "
                "GROUP BY dim1") == []


def test_order_by_any_float(spark, reg):
    # testOrderByAnyFloat: the (dim1 -> ANY_VALUE(f1)) mapping of the
    # SQL-null branch. ORDERING DIVERGENCE (documented): the reference
    # emits nulls LAST through InvertedTopNMetricSpec's wrapped
    # comparator; Spark's ASC sort puts nulls FIRST — the mapping is
    # the value contract, so compare order-insensitively
    out = rows(spark, reg,
               "SELECT dim1, ANY_VALUE(f1) FROM druid.numfoo "
               "GROUP BY 1 ORDER BY 2 LIMIT 10")
    got = {d: (None if f is None else round(float(f), 3))
           for d, f in out}
    assert got == {"2": 0.0, "10.1": 0.1, "": 1.0,
                   "1": None, "abc": None, "def": None}


# Enumerated CalciteQueryTest remainder adopted by THIS module (each
# with its reason; the planner/config families):
# - testUnionIsUnplannable, testUnionAllTablesWhenCastAndMappingIsRequired,
#   testUnionAllThreeTablesColumnCountMismatch1,
#   testUnionAllThreeTablesColumnCountMismatch2,
#   testUnionAllThreeTablesColumnCountMismatch3: the reference CANNOT
#   plan unions needing column mapping/casts and hard-errors on
#   column-count mismatches; this engine's heterogeneous-schema union
#   aligns by name and null-pads (PARITY §2.11 superset,
#   union_hetero_schemas driver entry) — the same SQL succeeds here.
# - testUnplannableQueries, testUnplannableTwoExactCountDistincts,
#   testCountStarWithTimeFilterUsingStringLiteralsInvalid_isUnplannable:
#   assertQueryIsUnplannable pins of the reference PLANNER's gaps
#   (two exact count-distincts, OVER clauses it can't translate) —
#   Spark plans all of them; supersets, not gaps.
# - testMaxSubqueryRows, testZeroMaxNumericInFilter,
#   testHighestMaxNumericInFilter, testQueryWithMoreThanMaxNumericInFilter,
#   testApproxCountDistinctWhenHllDisabled: broker config knobs
#   (maxSubqueryRows, maxNumericInFilters, useApproximateCountDistinct
#   =false) with no engine equivalent — resource governance happens in
#   Spark's own conf space.
# - testExplainExactCountDistinctOfSemiJoinResult,
#   testExplainSelectStarWithOverrides,
#   testExplainMultipleTopLevelUnionAllQueries,
#   testExplainInformationSchemaColumns: EXPLAIN pins of native-plan
#   JSON text (same bucket as testExplainSelectStar).
# - testInformationSchemaTables, testInformationSchemaColumnsOnView,
#   testInformationSchemaColumnsOnAnotherView,
#   testInformationSchemaColumnsOnForbiddenTable: catalog rows for the
#   reference's view/auth machinery (views surface as view_<name>
#   here; auth out of scope).
# - testValidationErrorNullLiteralIllegal,
#   testValidationErrorWrongTypeLiteral: Calcite operand-type
#   validation pins; Spark coerces (REGEXP_LIKE('x', NULL) -> false)
#   — documented lenient divergence.
# - testHumanReadableFormatFunctionWithWrongPrecisionType: ditto —
#   the '2' string precision coerces here.
# - testGroupByWithSortOnPostAggregationNoTopNConfig,
#   testGroupByWithSortOnPostAggregationNoTopNContext: the same SQL as
#   the ported testGroupByWithSortOnPostAggregationDefault, asserted
#   under topN-disabled planner config — plan-shape only, values
#   already pinned.
# - testGroupByAggregatorDefaultValuesNonVectorized: the vectorized
#   twin is ported; the NonVectorized variant pins the same values
#   under an engine-internal flag.
# - testTimeseriesDontSkipEmptyBuckets: hour-grain zero-fill default —
#   DOCUMENTED DIVERGENCE (PARITY): the reference fills empty buckets
#   by default, this engine skips unless skipEmptyBuckets: false is
#   explicit (unbounded interval specs would explode the generated
#   sequence); the explicit-fill path is pinned by the zero-fill
#   timeseries family.
# - testTimeseriesLosAngelesUsingTimeFloorConnectionUtc: connection-
#   level timezone wiring (sqlTimeZone context is pinned by the
#   ported LosAngeles family).
# - testGroupingSetsWithLimitOrderByGran: the reference's expected
#   output contains DUPLICATE (dim2, null-gran) rows — an artifact of
#   its timestampResultField interaction with subtotal ordering —
#   where ANSI grouping sets (and this engine) produce one row per
#   set member; the ANSI-conformant variants are ported above.
# - testSurfaceErrorsWhenInsertingThroughIncorrectSelectStatment:
#   INSERT ... ORDER BY rejection — pinned as
#   test_insert_with_order_by in tests/test_insert_dml_contracts.py.
# - testPlanWithInFilterLessThanInSubQueryThreshold: inSubQueryThreshold
#   planner knob (IN -> semi-join switch); Catalyst owns that choice
#   here.


def test_groupby_aggregator_default_values(spark, reg):
    # testGroupByAggregatorDefaultValues (r14 — previously the one
    # unaccounted CalciteQueryTest method): every aggregator family
    # under an always-false FILTER clause; SQL-null mode expects
    # count/distinct-counts 0 and every sum/max/min/avg NULL
    got = rows(spark, reg, """
SELECT
 dim2,
 count(*) FILTER(WHERE dim1 = 'nonexistent') AS c,
 COUNT(DISTINCT dim1) FILTER(WHERE dim1 = 'nonexistent') AS cd,
 APPROX_COUNT_DISTINCT(dim1) FILTER(WHERE dim1 = 'nonexistent') AS acd,
 sum(d1) FILTER(WHERE dim1 = 'nonexistent') AS sd,
 max(d1) FILTER(WHERE dim1 = 'nonexistent') AS xd,
 min(d1) FILTER(WHERE dim1 = 'nonexistent') AS nd,
 sum(l1) FILTER(WHERE dim1 = 'nonexistent') AS sl,
 max(l1) FILTER(WHERE dim1 = 'nonexistent') AS xl,
 min(l1) FILTER(WHERE dim1 = 'nonexistent') AS nl,
 avg(l1) FILTER(WHERE dim1 = 'nonexistent') AS al,
 avg(d1) FILTER(WHERE dim1 = 'nonexistent') AS ad
FROM numfoo WHERE dim2 = 'a' GROUP BY dim2
""")
    assert got == [("a", 0, 0, 0, None, None, None,
                    None, None, None, None, None)]
