"""Deterministic sampling / splitting (pipeline/sampling.py)."""

import pytest

from apache_druid_spark.pipeline.sampling import (
    hash_sample, stratified_sample, train_test_split_col,
)


@pytest.fixture(scope="module")
def docs(spark, registry):
    return registry.table("documents")


def test_hash_sample_rate_and_determinism(docs):
    n = docs.count()
    s1 = hash_sample(docs, "doc_id", 0.3)
    s2 = hash_sample(docs, "doc_id", 0.3)
    k = s1.count()
    # deterministic: identical row set both runs
    assert s2.count() == k
    assert s1.select("doc_id").subtract(s2.select("doc_id")).count() == 0
    # rate roughly honored (binomial tolerance on 500 docs)
    assert 0.2 * n < k < 0.4 * n


def test_hash_sample_nested(docs):
    # a 0.1 sample is a subset of the 0.3 sample (same seed): thresholds
    # nest, so shrinking a corpus sample never picks new documents
    small = hash_sample(docs, "doc_id", 0.1).select("doc_id")
    big = hash_sample(docs, "doc_id", 0.3).select("doc_id")
    assert small.subtract(big).count() == 0


def test_hash_sample_edge_rates(docs):
    n = docs.count()
    assert hash_sample(docs, "doc_id", 0.0).count() == 0
    assert hash_sample(docs, "doc_id", 1.0).count() == n
    with pytest.raises(ValueError):
        hash_sample(docs, "doc_id", 1.5)


def test_stratified_rates(docs):
    out = stratified_sample(docs, "lang", "doc_id",
                            {"en": 1.0}, default_rate=0.0)
    n_en = docs.filter("lang = 'en'").count()
    assert out.count() == n_en
    assert out.filter("lang <> 'en'").count() == 0


def test_split_partitions_and_is_stable(docs):
    out = train_test_split_col(docs, "doc_id", 0.25)
    n = docs.count()
    counts = dict(out.groupBy("split").count().collect())
    assert counts.get("test", 0) + counts.get("train", 0) == n
    assert 0.1 * n < counts.get("test", 0) < 0.4 * n
    # same key -> same split even from a differently-partitioned frame
    again = train_test_split_col(docs.repartition(7), "doc_id", 0.25)
    joined = (out.select("doc_id", "split")
              .join(again.select("doc_id", "split").withColumnRenamed(
                  "split", "split2"), "doc_id"))
    assert joined.filter("split <> split2").count() == 0


def test_leakage_safe_split_cluster_purity(spark):
    """leakage_safe_split (pipeline/sampling.py; Lee et al. 2022):
    every member of a near-dup cluster lands on the SAME side, and
    singletons match the plain content-keyed split exactly."""
    from apache_druid_spark.pipeline.graph import connected_components
    from apache_druid_spark.pipeline.sampling import (
        leakage_safe_split, train_test_split_col)

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string")
    # plant clusters: (0,1,2), (10,11), (20,21,22,23)
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long")
    comps = connected_components(
        pairs, nodes=docs.selectExpr("doc_id AS node"))
    out = leakage_safe_split(docs, comps, test_rate=0.3).collect()
    split = {r["doc_id"]: r["split"] for r in out}
    assert len(split) == 200
    for cluster in ([0, 1, 2], [10, 11], [20, 21, 22, 23]):
        assert len({split[d] for d in cluster}) == 1, cluster
    # singletons gate identically to the plain split
    plain = {r["doc_id"]: r["split"] for r in
             train_test_split_col(docs, "doc_id", 0.3).collect()}
    clustered = {0, 1, 2, 10, 11, 20, 21, 22, 23}
    for d in range(200):
        if d not in clustered:
            assert split[d] == plain[d], d
