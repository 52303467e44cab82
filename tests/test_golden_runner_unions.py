"""Golden tests ported from the reference's small runner suites over
union datasources and segment-merge boundaries:

- TimeSeriesUnionQueryRunnerTest.java (processing/src/test/java/org/
  apache/druid/query/timeseries/, 2 methods) — BOTH ported.
  testUnionResultMerging is a semantic port: the reference feeds
  pre-aggregated per-datasource partials through the toolchest merge;
  here the partials are registered as pre-rolled datasources and the
  combining aggregator runs (CountAggregatorFactory's combining
  factory IS LongSumAggregatorFactory, so the merge sums the partial
  `rows` column — AggregatorFactory.getCombiningFactory contract).
- TopNUnionQueryTest.java (.../query/topn/, 1 method) — ported with
  the reference's full literal pins (rows/index 4x the single-pass
  values; hyperUnique estimates at the module-standard 0.05 abs).
- TimeBoundaryQueryRunnerTest.java (.../query/timeboundary/, 7
  methods): testTimeBoundary/Max/Min were already pinned in
  test_golden_runner_timeseries.py (same fixture); this module ports
  testFilteredTimeBoundaryQuery{,NoMatches} over the suite's OWN
  two-segment fixture (V_0112/V_0113 rows at :92-107) and
  testMergeResults{,EmptyResults} as union-equivalents (the broker
  merge of two partial boundary results == the boundary of the union;
  empty inputs yield NO result row).
- SegmentMetadataUnionQueryTest.java (1 method) — ported: merged
  numRows over the 4-way self-union is 4x the single segment.

GroupByTimeseriesQueryRunnerTest.java (10 overridden methods) runs
the whole timeseries runner suite through the groupBy engine; here
both shapes compile into the same Spark aggregate, so the contract is
pinned as direct equivalence tests (groupBy with no dimensions ==
timeseries, row for row) over three aggregator shapes.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from apache_druid_spark.model.datasource import DatasourceRegistry
from apache_druid_spark.plans.compiler import compile_query

from testindex_fixture import testindex  # noqa: F401 (fixture)

FIRST_TO_THIRD = ["2011-04-01/2011-04-03"]
FULL_ON = ["1970-01-01/2020-01-01"]
UNIQUES_9 = 9.019833517963864
UNIQUES_2 = 2.000977198748901

ROWS = {"type": "count", "name": "rows"}
IDX_LONG = {"type": "longSum", "name": "idx", "fieldName": "index"}
UNIQUES = {"type": "hyperUnique", "name": "uniques",
           "fieldName": "quality_uniques"}

UNION_4X = {"type": "union",
            "dataSources": ["testindex", "testindex", "testindex",
                            "testindex"]}


def test_union_timeseries(spark, testindex):
    # TimeSeriesUnionQueryRunnerTest.testUnionTimeseries: the 4-way
    # self-union quadruples rows and sums, uniques unchanged
    q = {"queryType": "timeseries", "dataSource": UNION_4X,
         "granularity": "day", "intervals": FIRST_TO_THIRD,
         "aggregations": [ROWS, IDX_LONG, UNIQUES]}
    got = compile_query(q, testindex).orderBy("__time").collect()
    assert [(r["__time"], r["rows"], r["idx"]) for r in got] == [
        (datetime(2011, 4, 1), 52, 26476),
        (datetime(2011, 4, 2), 52, 23308)]
    for r in got:
        assert float(r["uniques"]) == pytest.approx(UNIQUES_9, abs=0.05)


def test_union_result_merging(spark, testindex):
    # TimeSeriesUnionQueryRunnerTest.testUnionResultMerging: partial
    # per-datasource results merge per bucket. Semantic port: the
    # partials register as pre-rolled datasources; count's COMBINING
    # factory is longSum (CountAggregatorFactory.getCombiningFactory),
    # so the merge sums the partial columns.
    reg = DatasourceRegistry(spark)
    ds1 = [(datetime(2011, 4, 2), 1, 2), (datetime(2011, 4, 3), 3, 4)]
    ds2 = [(datetime(2011, 4, 1), 5, 6), (datetime(2011, 4, 2), 7, 8),
           (datetime(2011, 4, 4), 9, 10)]
    for name, rows_ in (("ds1", ds1), ("ds2", ds2)):
        reg.register(name, spark.createDataFrame(
            rows_, "__time timestamp, rows long, idx long"))
    q = {"queryType": "timeseries",
         "dataSource": {"type": "union", "dataSources": ["ds1", "ds2"]},
         "granularity": "day",
         "intervals": ["2011-04-01/2011-04-10"],
         "aggregations": [
             {"type": "longSum", "name": "rows", "fieldName": "rows"},
             {"type": "longSum", "name": "idx", "fieldName": "idx"}]}
    got = [(r["__time"], r["rows"], r["idx"])
           for r in compile_query(q, reg).orderBy("__time").collect()]
    assert got == [
        (datetime(2011, 4, 1), 5, 6),
        (datetime(2011, 4, 2), 8, 10),   # 1+7, 2+8
        (datetime(2011, 4, 3), 3, 4),
        (datetime(2011, 4, 4), 9, 10)]


def test_topn_union_query(spark, testindex):
    # TopNUnionQueryTest.testTopNUnionQuery — full literal pins
    q = {"queryType": "topN", "dataSource": UNION_4X,
         "granularity": "all", "dimension": "market",
         "metric": "dependentPostAgg", "threshold": 4,
         "intervals": FULL_ON,
         "aggregations": [
             ROWS,
             {"type": "doubleSum", "name": "index",
              "fieldName": "index"},
             UNIQUES,
             {"type": "doubleMax", "name": "maxIndex",
              "fieldName": "index"},
             {"type": "doubleMin", "name": "minIndex",
              "fieldName": "index"}],
         "postAggregations": [
             {"type": "arithmetic", "name": "addRowsIndexConstant",
              "fn": "+", "fields": [
                  {"type": "fieldAccess", "fieldName": "rows"},
                  {"type": "fieldAccess", "fieldName": "index"},
                  {"type": "constant", "value": 1}]},
             {"type": "arithmetic", "name": "dependentPostAgg",
              "fn": "+", "fields": [
                  {"type": "constant", "value": 1},
                  {"type": "fieldAccess",
                   "fieldName": "addRowsIndexConstant"},
                  {"type": "fieldAccess", "fieldName": "rows"}]},
             {"type": "arithmetic",
              "name": "hyperUniqueFinalizingPostAggMetric",
              "fn": "+", "fields": [
                  {"type": "hyperUniqueCardinality",
                   "fieldName": "uniques"},
                  {"type": "constant", "value": 1}]}]}
    got = compile_query(q, testindex).collect()
    by_market = {r["market"]: r for r in got}
    assert [r["market"] for r in got] == ["total_market", "upfront",
                                          "spot"]
    tm = by_market["total_market"]
    assert tm["rows"] == 744
    assert float(tm["index"]) == pytest.approx(862719.3151855469,
                                               rel=1e-6)
    assert float(tm["addRowsIndexConstant"]) == pytest.approx(
        863464.3151855469, rel=1e-6)
    assert float(tm["dependentPostAgg"]) == pytest.approx(
        864209.3151855469, rel=1e-6)
    assert float(tm["maxIndex"]) == pytest.approx(1743.9217529296875,
                                                  rel=1e-6)
    assert float(tm["minIndex"]) == pytest.approx(792.3260498046875,
                                                  rel=1e-6)
    assert float(tm["uniques"]) == pytest.approx(UNIQUES_2, abs=0.05)
    assert float(tm["hyperUniqueFinalizingPostAggMetric"]) == \
        pytest.approx(UNIQUES_2 + 1.0, abs=0.05)
    up = by_market["upfront"]
    assert up["rows"] == 744
    assert float(up["index"]) == pytest.approx(768184.4240722656,
                                               rel=1e-6)
    assert float(up["dependentPostAgg"]) == pytest.approx(
        769674.4240722656, rel=1e-6)
    assert float(up["maxIndex"]) == pytest.approx(1870.06103515625,
                                                  rel=1e-6)
    assert float(up["minIndex"]) == pytest.approx(545.9906005859375,
                                                  rel=1e-6)
    sp = by_market["spot"]
    assert sp["rows"] == 3348
    assert float(sp["index"]) == pytest.approx(382426.28929138184,
                                               rel=1e-6)
    assert float(sp["dependentPostAgg"]) == pytest.approx(
        389124.28929138184, rel=1e-6)
    assert float(sp["uniques"]) == pytest.approx(UNIQUES_9, abs=0.05)
    assert float(sp["maxIndex"]) == pytest.approx(277.2735290527344,
                                                  rel=1e-6)
    assert float(sp["minIndex"]) == pytest.approx(59.02102279663086,
                                                  rel=1e-6)


# -- TimeBoundaryQueryRunnerTest: the filtered pair over its own
# two-segment fixture (V_0112 at :92, V_0113 at :97) ------------------------

@pytest.fixture(scope="module")
def boundary_reg(spark):
    rows = [
        # segment v_0112
        ("2011-01-12T01:00:00", "business"),
        ("2011-01-12T02:00:00", "entertainment"),
        ("2011-01-13T00:00:00", "automotive"),
        ("2011-01-13T01:00:00", "business"),
        # segment v_0113
        ("2011-01-14T00:00:00", "automotive"),
        ("2011-01-14T02:00:00", "entertainment"),
        ("2011-01-15T00:00:00", "automotive"),
        ("2011-01-15T01:00:00", "business"),
        ("2011-01-16T00:00:00", "automotive"),
        ("2011-01-16T01:00:00", "business"),
        ("2011-01-16T02:00:00", "entertainment"),
        ("2011-01-17T01:00:00", "business"),
        ("2011-01-17T02:00:00", "entertainment"),
    ]
    from pyspark.sql import functions as F
    reg = DatasourceRegistry(spark)
    reg.register("testing", spark.createDataFrame(
        rows, "ts string, quality string"
    ).select(F.col("ts").cast("timestamp").alias("__time"), "quality"))
    return reg


def test_filtered_time_boundary_query(spark, boundary_reg):
    # testFilteredTimeBoundaryQuery: quality=automotive spans
    # 2011-01-13T00 .. 2011-01-16T00 across both segments
    q = {"queryType": "timeBoundary", "dataSource": "testing",
         "filter": {"type": "selector", "dimension": "quality",
                    "value": "automotive"}}
    got = compile_query(q, boundary_reg).collect()
    assert len(got) == 1
    assert got[0]["minTime"] == datetime(2011, 1, 13)
    assert got[0]["maxTime"] == datetime(2011, 1, 16)


def test_filtered_time_boundary_query_no_matches(spark, boundary_reg):
    # testFilteredTimeBoundaryQueryNoMatches: a filter matching
    # nothing yields ZERO results (not a null row)
    q = {"queryType": "timeBoundary", "dataSource": "testing",
         "filter": {"type": "selector", "dimension": "quality",
                    "value": "foobar"}}
    assert compile_query(q, boundary_reg).collect() == []


def test_time_boundary_merge_results(spark, boundary_reg):
    # testMergeResults: merging two partial boundary results == the
    # boundary of the union of their data (the broker's merge keeps
    # the overall min/max — TimeBoundaryQuery.mergeResults)
    q = {"queryType": "timeBoundary", "dataSource": "testing"}
    got = compile_query(q, boundary_reg).collect()
    assert len(got) == 1
    assert got[0]["minTime"] == datetime(2011, 1, 12, 1)
    assert got[0]["maxTime"] == datetime(2011, 1, 17, 2)


def test_time_boundary_merge_empty_results(spark):
    # testMergeResultsEmptyResults: no input -> no result row
    reg = DatasourceRegistry(spark)
    reg.register("empty", spark.createDataFrame(
        [], "__time timestamp, quality string"))
    q = {"queryType": "timeBoundary", "dataSource": "empty"}
    assert compile_query(q, reg).collect() == []


def test_segment_metadata_union_query(spark, testindex):
    # SegmentMetadataUnionQueryTest.testSegmentMetadataUnionQuery: the
    # union's merged analysis — counts ADD (the reference pins
    # numRows 4 x 1209 = 4836; this engine's per-column shape carries
    # the additive contract in nullCount), value analyses (cardinality
    # and min/max) are union-invariant
    single = {r["column"]: r for r in compile_query(
        {"queryType": "segmentMetadata", "dataSource": "testindex"},
        testindex).collect()}
    union = {r["column"]: r for r in compile_query(
        {"queryType": "segmentMetadata", "dataSource": UNION_4X},
        testindex).collect()}
    assert set(union) == set(single)
    assert any(s["nullCount"] > 0 for s in single.values())
    for col, s in single.items():
        u = union[col]
        assert u["nullCount"] == 4 * s["nullCount"]
        assert u["cardinality"] == s["cardinality"]
        assert (u["minValue"], u["maxValue"]) == (s["minValue"],
                                                  s["maxValue"])


# -- GroupByTimeseriesQueryRunnerTest: groupBy(no dims) == timeseries -------

@pytest.mark.parametrize("aggs", [
    [ROWS, IDX_LONG],
    [ROWS, {"type": "doubleSum", "name": "idx", "fieldName": "index"},
     UNIQUES],
    [{"type": "doubleMax", "name": "mx", "fieldName": "index"},
     {"type": "doubleMin", "name": "mn", "fieldName": "index"}],
], ids=["count-longsum", "doublesum-uniques", "minmax"])
def test_groupby_equals_timeseries(spark, testindex, aggs):
    # GroupByTimeseriesQueryRunnerTest runs the timeseries suite
    # through the groupBy engine; both shapes must agree row for row
    ts = {"queryType": "timeseries", "dataSource": "testindex",
          "granularity": "day", "intervals": FIRST_TO_THIRD,
          "aggregations": aggs}
    gb = {"queryType": "groupBy", "dataSource": "testindex",
          "granularity": "day", "intervals": FIRST_TO_THIRD,
          "dimensions": [], "aggregations": aggs}
    a = [tuple(r) for r in
         compile_query(ts, testindex).orderBy("__time").collect()]
    b = [tuple(r) for r in
         compile_query(gb, testindex).orderBy("__time").collect()]
    assert len(a) == 2
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            if isinstance(va, float):
                assert va == pytest.approx(vb, rel=1e-6)
            else:
                assert va == vb


# -- MultiSegmentScanQueryTest.java (.../query/scan/, 2 methods): scan
# merge across segments under limit+offset. Ported as the merged-
# results contract over a PUBLISHED two-segment datasource (real
# __segment partition directories via write_segments — the merge the
# reference simulates with two historicals is Spark's cross-partition
# scan here). The batchSize axis of the reference's parameter matrix
# is result-envelope chunking, pinned separately by
# scan_result_envelope (sql/results.py). -----------------------------------

@pytest.fixture(scope="module")
def two_segment_reg(spark, tmp_path_factory):
    from pyspark.sql import functions as F
    from apache_druid_spark.ingest.batch import write_segments
    rows = [(f"2011-01-{12 + i // 7:02d}T{i % 7:02d}:00:00", f"v{i}")
            for i in range(13)]   # 7 rows on day 1, 6 on day 2
    df = spark.createDataFrame(rows, "ts string, val string").select(
        F.col("ts").cast("timestamp").alias("__time"), "val")
    path = str(tmp_path_factory.mktemp("seg") / "multiseg")
    write_segments(df, path, segment_granularity="day")
    reg = DatasourceRegistry(spark)
    reg.register_published("multiseg", path, "day")
    return reg


@pytest.mark.parametrize("limit", [0, 1, 3, 7, 10, 20, 1000])
@pytest.mark.parametrize("offset", [0, 1, 3, 5, 7, 10, 20, 200])
def test_merge_results_with_limit_and_offset(spark, two_segment_reg,
                                             limit, offset):
    # testMergeResultsWithLimitAndOffset (and the runner-level
    # testMergeRunnersWithLimitAndOffset, whose contract is the
    # limit!=0 ? min(limit, total) : total row count): the merged
    # scan across both segments honors offset then limit; limit 0
    # means unlimited (ScanQuery.isLimited)
    q = {"queryType": "scan", "dataSource": "multiseg",
         "intervals": ["2011-01-12/2011-01-14"],
         "columns": ["__time", "val"],
         "limit": limit, "offset": offset}
    n = compile_query(q, two_segment_reg).count()
    remaining = max(0, 13 - offset)
    expect = remaining if limit == 0 else min(limit, remaining)
    assert n == expect


# -- DataSourceMetadataQueryTest.java (.../query/datasourcemetadata/):
# the value contract, testMaxIngestedEventTime. The serde methods
# (testQuerySerialization, testContextSerde,
# testResultSerialization, testResultDeserialization) pin Jackson
# wire classes, and
# testFilterSegments/testFilterOverlappingSegments pin the broker's
# timeline-walk internals — both out of scope for a Spark engine
# (the interval->partition pruning equivalent is plan-asserted in
# test_plan_shapes). ---------------------------------------------------------

def test_max_ingested_event_time(spark, two_segment_reg):
    # testMaxIngestedEventTime: the latest __time across all segments
    q = {"queryType": "dataSourceMetadata", "dataSource": "multiseg"}
    got = compile_query(q, two_segment_reg).collect()
    assert len(got) == 1
    assert got[0]["maxIngestedEventTime"] == datetime(2011, 1, 13, 5)


# -- NestedQueryPushDownTest.java (.../query/groupby/, 8 methods): the
# VALUE contracts of force-pushed-down nested groupBys over its own
# two-segment dimA/dimB fixture (:153-243). The reference rewrites the
# outer query to run per-segment then merge; the pinned expectations
# equal the GLOBAL nested-groupBy semantics, which is exactly what
# this engine computes — the forcePushDownNestedQuery context passes
# through as a no-op plan hint. The three filtered methods use
# JavaScriptDimFilter("function(dim){return dim == 'X'}") purely as an
# equality filter; ported with the equivalent native selector (the
# javascript ENGINE is the policy exclusion, the filter-vs-pushdown
# interaction is the contract). testQueryRewriteForPushDown asserts
# the reference's internal rewritten-query OBJECT (plan shape, not
# values) — documented skip. ------------------------------------------------

PUSHDOWN_CTX = {"forcePushDownNestedQuery": True}


@pytest.fixture(scope="module")
def nested_reg(spark):
    rows = [
        # segment A (:159-190)
        (1505260888888, "pomegranate", 1000, "sweet", 10),
        (1505260800000, "mango", 1000, "sweet", 20),
        (1505264400000, "pomegranate", 1000, "sweet", 10),
        (1505264400400, "mango", 1000, "sweet", 20),
        # segment B (:203-233)
        (1505260800000, "pomegranate", 1000, "sweet", 10),
        (1505260800000, "mango", 1000, "sweet", 20),
        (1505264400000, "pomegranate", 1000, "sour", 10),
        (1505264400000, "mango", 1000, "sour", 20),
    ]
    from pyspark.sql import functions as F
    reg = DatasourceRegistry(spark)
    reg.register("blah", spark.createDataFrame(
        rows, "ts long, dimA string, metA long, dimB string, metB long"
    ).select(F.timestamp_millis("ts").alias("__time"),
             "dimA", "metA", "dimB", "metB"))
    return reg


NESTED_IV = ["2017-07-14T02:40:00.000Z/2020-09-13T12:26:40.000Z"]


def _inner(dim_b_out="dimB"):
    return {"queryType": "groupBy", "dataSource": "blah",
            "granularity": "all", "intervals": NESTED_IV,
            "dimensions": [
                {"type": "default", "dimension": "dimA",
                 "outputName": "dimA"},
                {"type": "default", "dimension": "dimB",
                 "outputName": dim_b_out}],
            "aggregations": [
                {"type": "longSum", "name": "metASum",
                 "fieldName": "metA"},
                {"type": "longSum", "name": "metBSum",
                 "fieldName": "metB"}]}


def _outer(inner, dims, aggs, **extra):
    q = {"queryType": "groupBy",
         "dataSource": {"type": "query", "query": inner},
         "granularity": "all", "intervals": NESTED_IV,
         "dimensions": dims, "aggregations": aggs,
         "context": PUSHDOWN_CTX}
    q.update(extra)
    return q


def test_nested_pushdown_simple_double_aggregation(spark, nested_reg):
    # testSimpleDoubleAggregation: sour 2000, sweet 6000
    q = _outer(_inner(), [{"type": "default", "dimension": "dimB",
                           "outputName": "dimB"}],
               [{"type": "longSum", "name": "totalSum",
                 "fieldName": "metASum"}])
    got = sorted((r["dimB"], r["totalSum"])
                 for r in compile_query(q, nested_reg).collect())
    assert got == [("sour", 2000), ("sweet", 6000)]


def test_nested_pushdown_renamed_dimensions(spark, nested_reg):
    # testNestedQueryWithRenamedDimensions: rename chains through both
    # levels; longMax over the inner per-(dimA,dimB) metB sums
    q = _outer(_inner("newDimB"),
               [{"type": "default", "dimension": "newDimB",
                 "outputName": "renamedDimB"}],
               [{"type": "longMax", "name": "maxBSum",
                 "fieldName": "metBSum"}])
    got = sorted((r["renamedDimB"], r["maxBSum"])
                 for r in compile_query(q, nested_reg).collect())
    assert got == [("sour", 20), ("sweet", 60)]


def test_nested_pushdown_filter_on_outer_and_inner(spark, nested_reg):
    # testDimensionFilterOnOuterAndInnerQueries: inner keeps mango,
    # outer wants pomegranate -> empty
    inner = dict(_inner(), filter={"type": "selector",
                                   "dimension": "dimA",
                                   "value": "mango"})
    q = _outer(inner, [{"type": "default", "dimension": "dimA",
                        "outputName": "newDimA"}],
               [{"type": "longSum", "name": "finalSum",
                 "fieldName": "metASum"}],
               filter={"type": "selector", "dimension": "dimA",
                       "value": "pomegranate"})
    assert compile_query(q, nested_reg).collect() == []


def test_nested_pushdown_filter_on_outer_query(spark, nested_reg):
    # testDimensionFilterOnOuterQuery: (mango, 4000)
    q = _outer(_inner(), [{"type": "default", "dimension": "dimA",
                           "outputName": "newDimA"}],
               [{"type": "longSum", "name": "finalSum",
                 "fieldName": "metASum"}],
               filter={"type": "selector", "dimension": "dimA",
                       "value": "mango"})
    got = [(r["newDimA"], r["finalSum"])
           for r in compile_query(q, nested_reg).collect()]
    assert got == [("mango", 4000)]


def test_nested_pushdown_filter_on_inner_query(spark, nested_reg):
    # testDimensionFilterOnInnerQuery: same answer with the filter
    # pushed inside
    inner = dict(_inner(), filter={"type": "selector",
                                   "dimension": "dimA",
                                   "value": "mango"})
    q = _outer(inner, [{"type": "default", "dimension": "dimA",
                        "outputName": "newDimA"}],
               [{"type": "longSum", "name": "finalSum",
                 "fieldName": "metASum"}])
    got = [(r["newDimA"], r["finalSum"])
           for r in compile_query(q, nested_reg).collect()]
    assert got == [("mango", 4000)]


def test_nested_pushdown_extraction_fn_in_outer_query(spark,
                                                      nested_reg):
    # testSubqueryWithExtractionFnInOuterQuery: regex '^(p)' with
    # replaceMissingValue 'replacement' over the inner dimA
    q = _outer(_inner(),
               [{"type": "extraction", "dimension": "dimA",
                 "outputName": "extractedDimA",
                 "extractionFn": {"type": "regex", "expr": "^(p)",
                                  "replaceMissingValue": True,
                                  "replaceMissingValueWith":
                                      "replacement"}}],
               [{"type": "longSum", "name": "finalSum",
                 "fieldName": "metASum"}])
    got = sorted((r["extractedDimA"], r["finalSum"])
                 for r in compile_query(q, nested_reg).collect())
    assert got == [("p", 4000), ("replacement", 4000)]


def test_nested_pushdown_having_clause(spark, nested_reg):
    # testHavingClauseInNestedPushDownQuery: finalSum > 70 keeps only
    # sweet (90 = 30 + 60)
    q = _outer(_inner(), [{"type": "default", "dimension": "dimB",
                           "outputName": "dimB"}],
               [{"type": "longSum", "name": "finalSum",
                 "fieldName": "metBSum"}],
               having={"type": "greaterThan", "aggregation": "finalSum",
                       "value": 70})
    got = [(r["dimB"], r["finalSum"])
           for r in compile_query(q, nested_reg).collect()]
    assert got == [("sweet", 90)]


# -- GroupByMultiSegmentTest.java (.../query/groupby/, 1 method) and the
# merge-topology pair GroupByLimitPushDownMultiNodeMergeTest (3) /
# GroupByLimitPushDownInsufficientBufferTest (2,
# testPartialLimitPushDownMerge + testPartialLimitPushDownMergeForceAggs):
# those two simulate historical/broker MERGE TOPOLOGIES (per-node
# partial limit pushdown, insufficient-buffer fallback on one node,
# flatMerge across two brokers — testDescendingNumerics,
# testForcePushLimitDownAccuracyWhenSortHasNonGroupingFields); in this
# engine there is no node topology — Spark's partial/final aggregate
# IS the merge — and their value contracts (numeric-descending
# limitSpec, forced pushdown accuracy) are pinned by the groupBy
# runner's limitSpec family. GroupByMultiSegmentTest's single value
# contract is ported below. --------------------------------------------------

def test_groupby_multi_segment_having_no_limit_pushdown(spark):
    # GroupByMultiSegmentTest.testHavingAndNoLimitPushDown: 'world'
    # clears the having only AFTER the cross-segment merge (75 + 75);
    # the asc-limit-1 must not cut groups before the having applies
    from pyspark.sql import functions as F
    reg = DatasourceRegistry(spark)
    rows = [("hello", 100), ("world", 75),   # segment A
            ("foo", 100), ("world", 75)]     # segment B
    reg.register("blah2", spark.createDataFrame(
        rows, "dimA string, metA long").select(
            F.timestamp_millis(F.lit(1000)).alias("__time"),
            "dimA", "metA"))
    q = {"queryType": "groupBy", "dataSource": "blah2",
         "granularity": "all",
         "intervals": ["1970-01-01T00:00:00Z/1970-01-01T00:16:40Z"],
         "dimensions": [{"type": "default", "dimension": "dimA",
                         "outputName": "dimA"}],
         "aggregations": [{"type": "longSum", "name": "metA",
                           "fieldName": "metA"}],
         "having": {"type": "greaterThan", "aggregation": "metA",
                    "value": 110},
         "limitSpec": {"type": "default", "limit": 1, "columns": [
             {"dimension": "dimA", "direction": "ascending"}]}}
    got = [(r["dimA"], r["metA"])
           for r in compile_query(q, reg).collect()]
    assert got == [("world", 150)]
