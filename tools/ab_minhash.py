"""Interleaved A/B for minhash_lsh_pairs signature build:

  hof  — current shape: per-row array HOFs (transform md5 base hash,
         then 16 x transform+array_min universal hashes). Zero
         shuffles, but every HOF pass is interpreted per element
         (ArrayTransform/ArrayMin are not codegen).
  agg  — explode_outer the shingle array (guarded) and compute the 16
         universal-hash mins as ONE codegen hash aggregate keyed on
         the doc id. Adds one exchange that carries only per-doc
         partial rows (16 longs + id), map-side collapsed.

Value identity: min over occurrences == min over distinct; docs whose
token array is null keep a null-signature row via explode_outer (null
shingle -> null base hash -> min of nulls = null per coefficient),
matching array_min over a null array. Short docs are unaffected
(_shingles emits the whole text as one shingle, never an empty array).

Usage: python tools/ab_minhash.py [rounds] [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from apache_druid_spark.pipeline.dedup import (  # noqa: E402
    _MERSENNE_P, _hash_coeffs, _shingles, _tokens)
from apache_druid_spark.pipeline._util import parallelize_scan  # noqa: E402

NUM_HASHES = 16
SHINGLE_K = 3


def _pairs_from_sigs(sigs, bands=4, num_hashes=NUM_HASHES,
                     max_bucket_size=1000, id_col="doc_id"):
    rows_per_band = num_hashes // bands
    banded = sigs.select(
        F.col(id_col),
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *[
                    F.col("minhash")[b * rows_per_band + r]
                    for r in range(rows_per_band)
                ])).alias("bucket"),
            )
            for b in range(bands)
        ])).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    buckets = (banded.groupBy("band", "bucket")
               .agg(F.array_sort(F.collect_set(id_col)).alias("ids"))
               .filter((F.size("ids") > 1)
                       & (F.size("ids") <= max_bucket_size)))
    pairs = F.flatten(F.transform(
        F.col("ids"),
        lambda x, i: F.transform(
            F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
            lambda y: F.struct(x.alias("id_a"), y.alias("id_b")))))
    return (buckets.select(F.explode(pairs).alias("p"))
            .select("p.id_a", "p.id_b")
            .distinct())


def hof_sigs(docs):
    staged = parallelize_scan(docs).select(
        F.col("doc_id"), _tokens(F.col("text")).alias("__toks"))
    sh = _shingles(F.col("__toks"), SHINGLE_K)
    base = F.transform(
        sh, lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10)
                       .cast("long"))
    hashed = staged.select(F.col("doc_id"), base.alias("__h"))

    def _universal(a, b):
        return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(_MERSENNE_P)

    sig = F.array(*[
        F.array_min(F.transform(F.col("__h"), _universal(a, b)))
        for a, b in _hash_coeffs(NUM_HASHES)
    ])
    return hashed.select(F.col("doc_id"), sig.alias("minhash"))


def agg_sigs(docs):
    staged = parallelize_scan(docs).select(
        F.col("doc_id"), _tokens(F.col("text")).alias("__toks"))
    st2 = staged.select(
        F.col("doc_id"), _shingles(F.col("__toks"), SHINGLE_K).alias("__sh"))
    # guarded explode_outer: keep null-token docs (null signature rows),
    # block expensive-tree inlining below the Generate
    ex = st2.select(
        F.col("doc_id"),
        F.explode_outer(
            F.when(F.size("__sh") >= 0, F.col("__sh"))).alias("__s"))
    h = F.conv(F.substring(F.md5("__s"), 1, 8), 16, 10).cast("long")
    hashed = ex.select(F.col("doc_id"), h.alias("__h"))
    mins = [
        F.min((F.col("__h") * F.lit(a) + F.lit(b)) % F.lit(_MERSENNE_P))
         .alias(f"__m{i}")
        for i, (a, b) in enumerate(_hash_coeffs(NUM_HASHES))
    ]
    return (hashed.groupBy("doc_id").agg(*mins)
            .select("doc_id",
                    F.array(*[F.col(f"__m{i}")
                              for i in range(NUM_HASHES)]).alias("minhash")))


def main() -> None:
    from apache_druid_spark.session import get_spark

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("ab_minhash")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    a = sorted(map(tuple, hof_sigs(docs).collect()))
    b = sorted(map(tuple, agg_sigs(docs).collect()))
    assert a == b, f"signatures disagree: {len(a)} vs {len(b)} rows"
    pa = sorted(map(tuple, _pairs_from_sigs(hof_sigs(docs)).collect()))
    pb = sorted(map(tuple, _pairs_from_sigs(agg_sigs(docs)).collect()))
    assert pa == pb, f"pairs disagree: {len(pa)} vs {len(pb)}"
    print(f"value-identical: {len(a)} sigs, {len(pa)} pairs")
    spark.catalog.clearCache()

    def run(builder, label):
        spark.sparkContext.setJobDescription(f"ab_minhash {label}")
        t0 = time.monotonic()
        _pairs_from_sigs(builder(docs)).write.mode("overwrite") \
            .format("noop").save()
        dt = time.monotonic() - t0
        spark.catalog.clearCache()
        return dt

    run(hof_sigs, "warm")
    run(agg_sigs, "warm")
    olds, news = [], []
    for i in range(rounds):
        olds.append(run(hof_sigs, f"hof#{i}"))
        news.append(run(agg_sigs, f"agg#{i}"))
        print(f"round {i}: hof={olds[-1]:.3f} agg={news[-1]:.3f} "
              f"load1={os.getloadavg()[0]:.1f}")
    print(f"hof: median={statistics.median(olds):.3f} min={min(olds):.3f}")
    print(f"agg: median={statistics.median(news):.3f} min={min(news):.3f}")


if __name__ == "__main__":
    main()
