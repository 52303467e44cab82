"""Interleaved A/B: r17 unigram_logprob (eager N/V .first() mid-build +
ref corpus tokenized twice) vs r18 (lazy broadcast totals, one ref
tokenize via AQE stage reuse).

Usage: python tools/ab_unigram.py [rounds] [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

K = 0.5


def old_shape(docs):
    from apache_druid_spark.pipeline._util import (parallelize_scan,
                                                   staged_explode)
    from apache_druid_spark.pipeline.dedup import _tokens

    ref_toks = staged_explode(parallelize_scan(docs), [],
                              _tokens(F.col("text")), "__tok")
    counts = ref_toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__c"))
    n, v = counts.agg(F.sum("__c"), F.count(F.lit(1))).first()
    denom = float(n) + K * float(v)
    doc_toks = staged_explode(parallelize_scan(docs), [F.col("doc_id")],
                              _tokens(F.col("text")), "__tok")
    lp = F.log((F.coalesce(F.col("__c"), F.lit(0.0)) + F.lit(K))
               / F.lit(denom))
    return (doc_toks.join(counts, "__tok", "left")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tok"),
                 F.round(F.avg(lp), 4).alias("logprob")))


def new_shape(docs):
    from apache_druid_spark.pipeline.importance import unigram_logprob

    return unigram_logprob(docs)


def main() -> None:
    from apache_druid_spark.session import get_spark

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("ab_unigram")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    def run(builder):
        builder(docs).write.mode("overwrite").format("noop").save()

    run(old_shape)
    run(new_shape)
    olds, news = [], []
    for i in range(rounds):
        for label, builder, sink in (("old", old_shape, olds),
                                     ("new", new_shape, news)):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{label}:{i}")
            t0 = time.time()
            run(builder)
            sink.append(round(time.time() - t0, 3))
        print(f"round {i}: old={olds[-1]} new={news[-1]} "
              f"load1={os.getloadavg()[0]:.1f}", flush=True)
    print(f"OLD samples={olds} min={min(olds)} "
          f"median={statistics.median(olds)}")
    print(f"NEW samples={news} min={min(news)} "
          f"median={statistics.median(news)}")


if __name__ == "__main__":
    main()
