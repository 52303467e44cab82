"""Interleaved A/B: ngram_jaccard_pairs as shipped (posting subtree
evaluated twice — stop aggregate + the ReuseExchange-served self-join
input) vs a one-shot persist(posting) that makes the tokenize+md5 pass
run once (VERDICT r17 task #1: "re-tried at sf1 where joins actually
shuffle"; r17 had rejected the persist at sf0.1: 2.6-2.9 s vs
2.1-2.7 s recompute).

Usage: python tools/ab_jaccard_persist.py [rounds] [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from apache_druid_spark.pipeline._util import (  # noqa: E402
    parallelize_scan, staged_explode)
from apache_druid_spark.pipeline.dedup import _shingles, _tokens  # noqa: E402

K = 5
THRESHOLD = 0.2
MAX_FREQ = 100


def _posting(docs):
    staged = parallelize_scan(docs).select(
        F.col("doc_id"), _tokens(F.col("text")).alias("__toks"))
    return staged_explode(
        staged, [F.col("doc_id")],
        F.array_distinct(_shingles(F.col("__toks"), K)), "shingle",
    ).select(
        F.col("doc_id"),
        F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10)
         .cast("long").alias("h"))


def _pairs(posting):
    stop = (posting.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > MAX_FREQ).select("h"))
    sh = (posting.join(F.broadcast(stop), "h", "left_anti")
          .withColumn("set_size",
                      F.count(F.lit(1)).over(Window.partitionBy("doc_id"))))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(b, [F.col("a.h") == F.col("b.h"),
                   F.col("a.doc_id") < F.col("b.doc_id")])
         .groupBy(F.col("a.doc_id").alias("id_a"),
                  F.col("b.doc_id").alias("id_b"))
         .agg(F.count(F.lit(1)).alias("shared"),
              F.min("a.set_size").alias("__size_a"),
              F.min("b.set_size").alias("__size_b")))
    out = shared.select(
        "id_a", "id_b",
        (F.col("shared")
         / (F.col("__size_a") + F.col("__size_b") - F.col("shared"))
         ).alias("jaccard"))
    return out.filter(F.col("jaccard") >= THRESHOLD)


def main() -> None:
    from apache_druid_spark.session import get_spark

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("ab_jaccard_persist")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    def run_plain():
        spark.sparkContext.setJobDescription("jaccard plain")
        t0 = time.monotonic()
        _pairs(_posting(docs)).write.mode("overwrite").format("noop").save()
        dt = time.monotonic() - t0
        spark.catalog.clearCache()
        return dt

    def run_persist():
        spark.sparkContext.setJobDescription("jaccard persist")
        t0 = time.monotonic()
        p = _posting(docs).persist()
        try:
            _pairs(p).write.mode("overwrite").format("noop").save()
        finally:
            p.unpersist()
        dt = time.monotonic() - t0
        spark.catalog.clearCache()
        return dt

    run_plain()
    run_persist()
    plains, persists = [], []
    for i in range(rounds):
        plains.append(run_plain())
        persists.append(run_persist())
        print(f"round {i}: plain={plains[-1]:.3f} "
              f"persist={persists[-1]:.3f} "
              f"load1={os.getloadavg()[0]:.1f}")
    print(f"plain:   median={statistics.median(plains):.3f} "
          f"min={min(plains):.3f}")
    print(f"persist: median={statistics.median(persists):.3f} "
          f"min={min(persists):.3f}")


if __name__ == "__main__":
    main()
