"""Interleaved A/B: r17 embedding_cosine_pairs shape (per-table union +
persist + oversized agg + broadcast anti-join) vs r18 shape (one scan,
staged explode, window bucket cap on the join's own key).

Usage: python tools/ab_embcos.py [rounds] [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from functools import reduce

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

DIM, BITS, TABLES, THRESHOLD, MAXB = 64, 8, 2, 0.35, 10000


def old_shape(df, spark):
    from pyspark import StorageLevel

    from apache_druid_spark.pipeline._util import parallelize_scan
    from apache_druid_spark.pipeline.similarity import (
        _dot_cols, _norm, hyperplanes, lsh_bucket)

    base = parallelize_scan(df).select("vec_id", "embedding")
    views = []
    for t in range(TABLES):
        planes = hyperplanes(BITS, DIM, seed=f"emb{t}:")
        views.append(base.select(
            F.col("vec_id"), F.col("embedding"),
            F.lit(t).alias("__table"),
            lsh_bucket("`embedding`", planes).alias("__bucket")))
    blocked = reduce(lambda x, y: x.unionAll(y), views)
    blocked = blocked.persist(StorageLevel.MEMORY_AND_DISK)
    oversized = (blocked.select("__table", "__bucket")
                 .groupBy("__table", "__bucket")
                 .agg(F.count(F.lit(1)).alias("__bsz"))
                 .filter(F.col("__bsz") > MAXB)
                 .select("__table", "__bucket"))
    blocked = (blocked.join(F.broadcast(oversized),
                            ["__table", "__bucket"], "left_anti")
               .withColumn("__nrm", _norm("`embedding`", DIM)))
    a, b = blocked.alias("a"), blocked.alias("b")
    dot = _dot_cols("a.`embedding`", "b.`embedding`", DIM)
    cosine = F.round(dot / (F.col("a.__nrm") * F.col("b.__nrm")), 6)
    return (a.join(b, [F.col("a.__table") == F.col("b.__table"),
                       F.col("a.__bucket") == F.col("b.__bucket"),
                       F.col("a.vec_id") < F.col("b.vec_id")])
            .select(F.col("a.vec_id").alias("id_a"),
                    F.col("b.vec_id").alias("id_b"),
                    cosine.alias("cosine"))
            .filter(F.col("cosine") >= THRESHOLD)
            .distinct())


def new_shape(df, spark):
    from apache_druid_spark.pipeline.dedup import embedding_cosine_pairs

    return embedding_cosine_pairs(df, dim=DIM, threshold=THRESHOLD,
                                  bits=BITS, tables=TABLES)


def hybrid_shape(df, spark):
    """Single-scan staged explode (r18) + persist/agg/anti cap (r17)."""
    from pyspark import StorageLevel

    from apache_druid_spark.pipeline._util import (parallelize_scan,
                                                   staged_explode)
    from apache_druid_spark.pipeline.similarity import (
        _dot_cols, _norm, hyperplanes, lsh_bucket)

    base = parallelize_scan(df).select("vec_id", "embedding")
    cells = F.array(*[
        F.struct(F.lit(t).alias("__table"),
                 lsh_bucket("`embedding`",
                            hyperplanes(BITS, DIM, seed=f"emb{t}:"))
                 .alias("__bucket"))
        for t in range(TABLES)])
    blocked = staged_explode(
        base, [F.col("vec_id"), F.col("embedding")], cells, "__tb",
    ).select(F.col("vec_id"), F.col("embedding"),
             F.col("__tb.__table").alias("__table"),
             F.col("__tb.__bucket").alias("__bucket"))
    blocked = blocked.persist(StorageLevel.MEMORY_AND_DISK)
    oversized = (blocked.select("__table", "__bucket")
                 .groupBy("__table", "__bucket")
                 .agg(F.count(F.lit(1)).alias("__bsz"))
                 .filter(F.col("__bsz") > MAXB)
                 .select("__table", "__bucket"))
    blocked = (blocked.join(F.broadcast(oversized),
                            ["__table", "__bucket"], "left_anti")
               .withColumn("__nrm", _norm("`embedding`", DIM)))
    a, b = blocked.alias("a"), blocked.alias("b")
    dot = _dot_cols("a.`embedding`", "b.`embedding`", DIM)
    cosine = F.round(dot / (F.col("a.__nrm") * F.col("b.__nrm")), 6)
    return (a.join(b, [F.col("a.__table") == F.col("b.__table"),
                       F.col("a.__bucket") == F.col("b.__bucket"),
                       F.col("a.vec_id") < F.col("b.vec_id")])
            .select(F.col("a.vec_id").alias("id_a"),
                    F.col("b.vec_id").alias("id_b"),
                    cosine.alias("cosine"))
            .filter(F.col("cosine") >= THRESHOLD)
            .distinct())


def main() -> None:
    from apache_druid_spark.session import get_spark

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("ab_embcos")
    df = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    def run(d):
        d.write.mode("overwrite").format("noop").save()

    variants = [("old", old_shape, []), ("new", new_shape, []),
                ("hyb", hybrid_shape, [])]
    for _, builder, _sink in variants:
        spark.catalog.clearCache()
        run(builder(df, spark))
    for i in range(rounds):
        line = []
        for label, builder, sink in variants:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{label}:{i}")
            t0 = time.time()
            run(builder(df, spark))
            sink.append(round(time.time() - t0, 3))
            line.append(f"{label}={sink[-1]}")
        print(f"round {i}: {' '.join(line)} "
              f"load1={os.getloadavg()[0]:.1f}", flush=True)
    for label, _, sink in variants:
        print(f"{label.upper()} samples={sink} min={min(sink)} "
              f"median={statistics.median(sink)}")


if __name__ == "__main__":
    main()
