"""Interleaved A/B: r17 ngram_jaccard shape (groupBy sizes + two size
joins) vs r18 shape (window set_size carried through the self-join).

Both shapes are built inline from the same staged posting table so one
session times them back-to-back, alternating, N rounds (VERDICT r17
task #1: settle the jaccard trend with a pinned interleaved A/B at
sf0.1 AND at the amplified ~sf1 dir).

Usage: python tools/ab_jaccard.py [rounds] [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402


def _posting(spark, sf_dir):
    from apache_druid_spark.pipeline._util import (parallelize_scan,
                                                   staged_explode)
    from apache_druid_spark.pipeline.dedup import _shingles, _tokens

    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    staged = parallelize_scan(df).select(
        F.col("doc_id"), _tokens(F.col("text")).alias("__toks"))
    return staged_explode(
        staged, [F.col("doc_id")],
        F.array_distinct(_shingles(F.col("__toks"), 5)), "shingle",
    ).select(
        F.col("doc_id"),
        F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10)
         .cast("long").alias("h"))


def old_shape(posting, threshold=0.2, max_freq=100):
    stop = (posting.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_freq).select("h"))
    sh = posting.join(F.broadcast(stop), "h", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("set_size"))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (a.join(b, [F.col("a.h") == F.col("b.h"),
                         F.col("a.doc_id") < F.col("b.doc_id")])
              .groupBy(F.col("a.doc_id").alias("id_a"),
                       F.col("b.doc_id").alias("id_b"))
              .agg(F.count(F.lit(1)).alias("shared")))
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    out = (shared.join(sa, F.col("id_a") == F.col("sa.doc_id"))
           .join(sb, F.col("id_b") == F.col("sb.doc_id"))
           .select("id_a", "id_b",
                   (F.col("shared") / (F.col("sa.set_size")
                    + F.col("sb.set_size") - F.col("shared")))
                   .alias("jaccard")))
    return out.filter(F.col("jaccard") >= threshold)


def new_shape(posting, threshold=0.2, max_freq=100):
    stop = (posting.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_freq).select("h"))
    sh = (posting.join(F.broadcast(stop), "h", "left_anti")
          .withColumn("set_size",
                      F.count(F.lit(1)).over(Window.partitionBy("doc_id"))))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (a.join(b, [F.col("a.h") == F.col("b.h"),
                         F.col("a.doc_id") < F.col("b.doc_id")])
              .groupBy(F.col("a.doc_id").alias("id_a"),
                       F.col("b.doc_id").alias("id_b"))
              .agg(F.count(F.lit(1)).alias("shared"),
                   F.min("a.set_size").alias("__size_a"),
                   F.min("b.set_size").alias("__size_b")))
    out = shared.select(
        "id_a", "id_b",
        (F.col("shared") / (F.col("__size_a") + F.col("__size_b")
                            - F.col("shared"))).alias("jaccard"))
    return out.filter(F.col("jaccard") >= threshold)


def allwin_shape(posting, threshold=0.2, max_freq=100):
    """Variant C: stop filter AND set sizes both as windows — ONE
    tokenize pass total (the stop aggregate no longer re-derives
    posting), at the cost of an extra keyed exchange in the chain."""
    sh = (posting
          .withColumn("__df",
                      F.count(F.lit(1)).over(Window.partitionBy("h")))
          .filter(F.col("__df") <= max_freq)
          .drop("__df")
          .withColumn("set_size",
                      F.count(F.lit(1)).over(Window.partitionBy("doc_id"))))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (a.join(b, [F.col("a.h") == F.col("b.h"),
                         F.col("a.doc_id") < F.col("b.doc_id")])
              .groupBy(F.col("a.doc_id").alias("id_a"),
                       F.col("b.doc_id").alias("id_b"))
              .agg(F.count(F.lit(1)).alias("shared"),
                   F.min("a.set_size").alias("__size_a"),
                   F.min("b.set_size").alias("__size_b")))
    out = shared.select(
        "id_a", "id_b",
        (F.col("shared") / (F.col("__size_a") + F.col("__size_b")
                            - F.col("shared"))).alias("jaccard"))
    return out.filter(F.col("jaccard") >= threshold)


def main() -> None:
    from apache_druid_spark.session import get_spark

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("ab_jaccard")
    posting = _posting(spark, sf_dir)

    def run(df):
        df.write.mode("overwrite").format("noop").save()

    variants = [("old", old_shape, []), ("new", new_shape, []),
                ("win", allwin_shape, [])]
    for _, builder, _s in variants:
        run(builder(posting))
    for i in range(rounds):
        line = []
        for label, builder, sink in variants:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{label}:{i}")
            t0 = time.time()
            run(builder(posting))
            sink.append(round(time.time() - t0, 3))
            line.append(f"{label}={sink[-1]}")
        print(f"round {i}: {' '.join(line)} "
              f"load1={os.getloadavg()[0]:.1f}", flush=True)
    for label, _b, sink in variants:
        print(f"{label.upper()} samples={sink} min={min(sink)} "
              f"median={statistics.median(sink)}")


if __name__ == "__main__":
    main()
