"""As-of join and data-selection operator tests (asof_join,
semantic_dedup, importance_weights, top_ngrams)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from apache_druid_spark.operators.asof import asof_join
from apache_druid_spark.pipeline import (
    dsir_select, importance_weights, semantic_dedup, top_ngrams,
)


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:05"), "A", 100.0),
         (2, _ts("2024-01-01T10:00:10"), "A", 101.0),
         (3, _ts("2024-01-01T09:59:00"), "B", 50.0),
         (4, _ts("2024-01-01T10:05:00"), "C", 70.0)],
        ["trade_id", "ts", "sym", "px"])


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [(_ts("2024-01-01T10:00:00"), "A", 99.0, 10),
         (_ts("2024-01-01T10:00:10"), "A", 100.5, 11),
         # duplicate (sym, ts): greatest payload must win deterministically
         (_ts("2024-01-01T10:00:10"), "A", 100.7, 12),
         (_ts("2024-01-01T10:01:00"), "B", 48.0, 20)],
        ["ts", "sym", "bid", "qid"])


def test_asof_backward_inclusive(trades, quotes):
    out = {r["trade_id"]: r for r in
           asof_join(trades, quotes, on="ts", by="sym",
                     right_cols=["bid", "qid"]).collect()}
    assert out[1]["bid"] == 99.0          # 10:00:05 -> 10:00:00 quote
    # equal timestamps match (<=), and the max-payload duplicate wins
    assert out[2]["bid"] == 100.7 and out[2]["qid"] == 12
    assert out[3]["bid"] is None          # B trade precedes every B quote
    assert out[4]["bid"] is None          # no C quotes at all
    assert out[2]["ts_r"] == _ts("2024-01-01T10:00:10")


def test_asof_forward(trades, quotes):
    out = {r["trade_id"]: r for r in
           asof_join(trades, quotes, on="ts", by="sym",
                     right_cols=["bid"], direction="forward").collect()}
    assert out[1]["bid"] == 100.7         # earliest quote >= 10:00:05
    assert out[3]["bid"] == 48.0          # 09:59 -> 10:01 B quote
    assert out[4]["bid"] is None


def test_asof_tolerance_nulls_stale_matches(trades, quotes):
    out = {r["trade_id"]: r for r in
           asof_join(trades, quotes, on="ts", by="sym",
                     right_cols=["bid"],
                     tolerance_seconds=3).collect()}
    assert out[1]["bid"] is None          # 5s gap > 3s tolerance
    assert out[2]["bid"] == 100.7         # exact-ts match, gap 0


def test_asof_plan_is_single_key_shuffle(trades, quotes):
    plan = (asof_join(trades, quotes, on="ts", by="sym")
            ._jdf.queryExecution().executedPlan().toString())
    # union+window shape: no nested-loop / cartesian range join
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_semantic_dedup_drops_near_identical(spark):
    base = [float(i % 7 - 3) for i in range(8)]
    near = list(base)
    near[0] += 1e-4
    far = [float((i * 3) % 5 - 2) for i in range(8)]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)],
        "vec_id: long, embedding: array<float>")
    out = {r["vec_id"]: r["is_kept"]
           for r in semantic_dedup(df, dim=8, n_cells=2,
                                   threshold=0.999).collect()}
    assert out[1] is True                 # min-id representative kept
    assert out[2] is False                # its near-dup dropped
    assert out[3] is True


def test_importance_weights_prefer_target_like_docs(spark):
    target = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta") for i in range(5)],
        ["doc_id", "text"])
    raw = spark.createDataFrame(
        [(1, "alpha beta gamma delta"),        # exactly target-like
         (2, "zeta eta theta iota kappa")],    # disjoint vocabulary
        ["doc_id", "text"])
    w = {r["doc_id"]: r["weight"]
         for r in importance_weights(raw, target,
                                     n_buckets=256).collect()}
    assert w[1] > w[2]
    sel = dsir_select(raw, target, k=1, n_buckets=256).collect()
    assert [r["doc_id"] for r in sel] == [1]


def test_top_ngrams_count_then_lexicographic(spark):
    df = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b c"), (3, "x y z")],
        ["doc_id", "text"])
    rows = top_ngrams(df, ngram=3, k=3).collect()
    assert [r["gram"] for r in rows] == ["a b c", "b c a", "c a b"]
    assert rows[0]["occurrences"] == 3


def test_assign_cells_matches_literal_ivf_assign(spark, registry):
    """The broadcast-table assignment (scale path) must agree row-for-
    row with the literal-expression ivf_assign (oracle path) on the
    same centroids."""
    from apache_druid_spark.pipeline.semdedup import assign_cells
    from apache_druid_spark.pipeline.similarity import (
        ivf_assign, ivf_centroids,
    )

    emb = registry.table("embeddings")
    cents = ivf_centroids(8, 64)
    lit = emb.select("vec_id",
                     ivf_assign("embedding", cents).alias("cell"))
    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)],
        "cell: int, centroid: array<double>")
    tab = assign_cells(emb, cdf).select(
        "vec_id", F.col("__cell").alias("cell"))
    assert lit.exceptAll(tab).count() == 0
    assert tab.exceptAll(lit).count() == 0


def test_semantic_dedup_scale_mode_matches_literal_mode(spark, registry):
    """The centroid_table scale mode (numpy assign + grouped matmul
    prune) must produce exactly the keep/drop set of the literal
    expression mode for the same centroids."""
    from apache_druid_spark.pipeline import semantic_dedup
    from apache_druid_spark.pipeline.similarity import ivf_centroids

    emb = registry.table("embeddings")
    cents = ivf_centroids(8, 64)
    lit = semantic_dedup(emb, dim=64, threshold=0.35, centroids=cents)
    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)],
        "cell: int, centroid: array<double>")
    tab = semantic_dedup(emb, dim=64, threshold=0.35, centroid_table=cdf)
    assert lit.exceptAll(tab).count() == 0
    assert tab.exceptAll(lit).count() == 0


def test_winnowing_overlap_pairs_detects_shared_substring(spark):
    """Docs sharing a >= window+k-1 char substring must pair; disjoint
    docs must not."""
    from apache_druid_spark.pipeline import winnowing_overlap_pairs

    shared = "the quick brown fox jumps over the lazy dog tonight"
    df = spark.createDataFrame(
        [(1, "AAA " + shared + " BBB"),
         (2, "CCC " + shared + " DDD"),
         (3, "completely different words with zero overlap here ok")],
        ["doc_id", "text"])
    pairs = winnowing_overlap_pairs(df, k=16, window=8, min_shared=2,
                                    max_fp_freq=100).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]


def test_embedding_pairs_numpy_verify_matches_expression(registry):
    """verify='numpy' (grouped matmul) must reproduce the expression
    path's pair set and cosines exactly at the rounded precision."""
    from apache_druid_spark.pipeline import embedding_cosine_pairs

    emb = registry.table("embeddings")
    expr = embedding_cosine_pairs(emb, dim=64, threshold=0.35)
    np_ = embedding_cosine_pairs(emb, dim=64, threshold=0.35,
                                 verify="numpy")
    assert expr.exceptAll(np_).count() == 0
    assert np_.exceptAll(expr).count() == 0


def test_unigram_logprob_ranks_typical_docs_higher(spark):
    # CCNet-style LM score (unigram_logprob, r13): a document built
    # from corpus-frequent tokens must out-score one made of hapaxes;
    # exact math is hash-oracled by the text_unigram_logprob driver
    # entry — this pins the ranking contract and the exact smoothing
    # formula on a countable fixture
    import math

    from apache_druid_spark.pipeline import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "the the the cat"), (2, "qux zorp blee flib")],
        ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_tok"], r["logprob"])
           for r in unigram_logprob(docs).collect()}
    assert got[1][0] == 4 and got[2][0] == 4
    assert got[1][1] > got[2][1]
    # N=8 tokens, V=6 distinct; 'the' c=3, 'cat' c=1, hapax c=1
    denom = 8 + 0.5 * 6
    lp1 = (3 * math.log(3.5 / denom) + math.log(1.5 / denom)) / 4
    lp2 = math.log(1.5 / denom)
    assert got[1][1] == round(lp1, 4)
    assert got[2][1] == round(lp2, 4)


def test_unigram_logprob_oov_under_separate_ref(spark):
    # scoring against a SEPARATE reference corpus: OOV tokens take the
    # ln(k / (N + k*V)) smoothed floor through the left join
    import math

    from apache_druid_spark.pipeline import unigram_logprob

    ref = spark.createDataFrame([(9, "a a b")], ["doc_id", "text"])
    docs = spark.createDataFrame([(1, "a zz")], ["doc_id", "text"])
    got = unigram_logprob(docs, ref=ref).collect()[0]
    denom = 3 + 0.5 * 2
    want = (math.log(2.5 / denom) + math.log(0.5 / denom)) / 2
    assert got["n_tok"] == 2 and got["logprob"] == round(want, 4)
