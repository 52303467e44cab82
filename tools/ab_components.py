"""Interleaved A/B: r17 label propagation (neighbor-min join + left
join-back + changed-count action per round) vs r18 shape (messages
unioned with labels into ONE groupBy-min per round, convergence via the
star algorithm's (count, xxhash-sum) signature).

Both run on the same localCheckpointed LSH pair table, so this times
the clustering loop exactly like the dedup_components bench entry.

Usage: python tools/ab_components.py [rounds] [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

_CHECKPOINT_EVERY = 5


def _setup(spark, sf_dir):
    from apache_druid_spark.pipeline.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    pairs = minhash_lsh_pairs(docs, num_hashes=16, bands=4,
                              shingle_k=3).localCheckpoint(eager=True)
    nodes = docs.select(F.col("doc_id").alias("node"))
    return pairs, nodes


def _bidir(pairs):
    return (pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
            .unionAll(pairs.select(F.col("id_b").alias("u"),
                                   F.col("id_a").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct())


def old_cc(pairs, nodes, max_iterations=25):
    bidir = _bidir(pairs).persist()
    labels = nodes.select("node", F.col("node").alias("component"))
    prev = None
    for i in range(max_iterations):
        neighbor_min = (bidir.join(labels, bidir["v"] == labels["node"])
                        .groupBy("u")
                        .agg(F.min("component").alias("nmin")))
        updated = (labels.join(neighbor_min,
                               labels["node"] == neighbor_min["u"], "left")
                   .select(labels["node"],
                           F.least("component",
                                   F.coalesce("nmin", "component"))
                           .alias("component"),
                           (F.col("nmin") < F.col("component"))
                           .alias("__changed")))
        if i % _CHECKPOINT_EVERY == _CHECKPOINT_EVERY - 1:
            updated = updated.localCheckpoint(eager=True)
        else:
            updated = updated.persist()
        changed = updated.agg(
            F.count_if(F.col("__changed")).alias("c")).first()["c"]
        if prev is not None:
            prev.unpersist()
        prev = updated
        labels = updated.select("node", "component")
        if changed == 0:
            break
    out = labels.localCheckpoint(eager=True)
    if prev is not None:
        prev.unpersist()
    bidir.unpersist()
    return out


def new_cc(pairs, nodes, max_iterations=25):
    bidir = _bidir(pairs).persist()
    labels = nodes.select("node", F.col("node").alias("component"))
    prev = None
    prev_sig = None
    for i in range(max_iterations):
        msgs = (bidir.join(labels, bidir["v"] == labels["node"])
                .select(F.col("u").alias("node"), "component"))
        updated = (labels.unionAll(msgs)
                   .groupBy("node")
                   .agg(F.min("component").alias("component")))
        if i % _CHECKPOINT_EVERY == _CHECKPOINT_EVERY - 1:
            updated = updated.localCheckpoint(eager=True)
        else:
            updated = updated.persist()
        sig = updated.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("node", "component").cast("decimal(20,0)"))
            .alias("h")).first()
        if prev is not None:
            prev.unpersist()
        prev = updated
        labels = updated
        if prev_sig is not None and (sig["n"], sig["h"]) == prev_sig:
            break
        prev_sig = (sig["n"], sig["h"])
    out = labels.localCheckpoint(eager=True)
    if prev is not None:
        prev.unpersist()
    bidir.unpersist()
    return out


def main() -> None:
    from apache_druid_spark.session import get_spark

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("ab_components")
    pairs, nodes = _setup(spark, sf_dir)

    def run(fn):
        out = fn(pairs, nodes)
        out.write.mode("overwrite").format("noop").save()
        return out

    # value check once: both must produce identical labelings
    a = {(r["node"], r["component"]) for r in old_cc(pairs, nodes).collect()}
    b = {(r["node"], r["component"]) for r in new_cc(pairs, nodes).collect()}
    print(f"values identical: {a == b} ({len(a)} labels)")

    olds, news = [], []
    for i in range(rounds):
        for label, fn, sink in (("old", old_cc, olds), ("new", new_cc, news)):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{label}:{i}")
            t0 = time.time()
            run(fn)
            sink.append(round(time.time() - t0, 3))
        print(f"round {i}: old={olds[-1]} new={news[-1]} "
              f"load1={os.getloadavg()[0]:.1f}", flush=True)
    print(f"OLD samples={olds} min={min(olds)} "
          f"median={statistics.median(olds)}")
    print(f"NEW samples={news} min={min(news)} "
          f"median={statistics.median(news)}")


if __name__ == "__main__":
    main()
