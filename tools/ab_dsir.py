"""Interleaved A/B: r18-mid dsir importance_weights (target id
semi-join + two per-side bucket counts + full count join; 3 passes
over the persisted gram table) vs r18-final (target_predicate flag on
every gram row, ONE conditional aggregate for both counts; 2 passes,
no semi-join, no count join).

Usage: python tools/ab_dsir.py [rounds] [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def old_shape(docs):
    from apache_druid_spark.pipeline.importance import importance_weights

    return importance_weights(
        docs, docs.filter(F.col("lang") == "en"), n_buckets=1024,
        target_within_raw=True)


def new_shape(docs):
    from apache_druid_spark.pipeline.importance import importance_weights

    return importance_weights(
        docs, docs.filter(F.col("lang") == "en"), n_buckets=1024,
        target_predicate=F.col("lang") == "en")


def main() -> None:
    from apache_druid_spark.session import get_spark

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("ab_dsir")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # value identity first (sorted-row hash of both shapes)
    a = sorted(map(tuple, old_shape(docs).collect()))
    b = sorted(map(tuple, new_shape(docs).collect()))
    assert a == b, f"shapes disagree: {len(a)} vs {len(b)} rows"
    print(f"value-identical: {len(a)} rows")
    spark.catalog.clearCache()

    def run(builder, label):
        spark.sparkContext.setJobDescription(f"ab_dsir {label}")
        t0 = time.monotonic()
        builder(docs).write.mode("overwrite").format("noop").save()
        dt = time.monotonic() - t0
        spark.catalog.clearCache()
        return dt

    run(old_shape, "warm")
    run(new_shape, "warm")
    olds, news = [], []
    for i in range(rounds):
        olds.append(run(old_shape, f"old#{i}"))
        news.append(run(new_shape, f"new#{i}"))
        load1 = os.getloadavg()[0]
        print(f"round {i}: old={olds[-1]:.3f} new={news[-1]:.3f} "
              f"load1={load1:.1f}")
    print(f"old: median={statistics.median(olds):.3f} min={min(olds):.3f}")
    print(f"new: median={statistics.median(news):.3f} min={min(news):.3f}")


if __name__ == "__main__":
    main()
