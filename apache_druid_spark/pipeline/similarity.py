"""Similarity search over embedding columns (array<float>).

  cosine_topk      exact brute force — one scan + TakeOrderedAndProject;
                   the right baseline and linearly scalable (each
                   partition keeps a k-heap, driver merges k*P rows)
  lsh_bucket_topk  random-hyperplane LSH: one scan computes sign-bit
                   buckets, candidates = vectors within a Hamming radius
                   of the query bucket, exact cosine re-rank on the
                   (tiny) candidate set

The hyperplanes are deterministic pseudo-random +-1 weights derived from
md5(f"{bit}-{dim}") so the same buckets can be computed in any engine
(or driver-side in numpy for the query vector)."""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apache_druid_spark.pipeline._util import parallelize_scan


def _dot_literal(vec_col, query: list[float]):
    """dot(vec, literal query) without UDFs: aggregate over zip index."""
    q = F.array(*[F.lit(float(x)) for x in query])
    return F.aggregate(
        F.zip_with(vec_col, q, lambda a, b: a.cast("double") * b),
        F.lit(0.0), lambda acc, x: acc + x)


def _norm(vec_col):
    return F.sqrt(F.aggregate(
        F.transform(vec_col, lambda a: a.cast("double") * a.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(df: DataFrame, query: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id",
                round_to: int | None = 6) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    import math

    df = parallelize_scan(df)
    qnorm = math.sqrt(sum(float(x) * float(x) for x in query)) or 1.0
    score = _dot_literal(F.col(vec_col), query) / (_norm(F.col(vec_col)) * F.lit(qnorm))
    if round_to is not None:
        score = F.round(score, round_to)
    return (df.select(F.col(id_col), score.alias("cosine"))
              .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
              .limit(k))


def hyperplanes(bits: int, dim: int) -> list[list[float]]:
    """Deterministic +-1 hyperplanes from md5 parity (engine-agnostic)."""
    planes = []
    for b in range(bits):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{b}-{d}".encode()).hexdigest()
            row.append(1.0 if int(h[:8], 16) % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-bit bucket id (long) for a vector column."""
    bucket = None
    for i, p in enumerate(planes):
        bit = F.when(_dot_literal(vec_col, p) > 0,
                     F.lit(2 ** i)).otherwise(F.lit(0)).cast("long")
        bucket = bit if bucket is None else (bucket + bit)
    return bucket


def query_bucket(query: list[float], planes: list[list[float]]) -> int:
    out = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query, p)) > 0:
            out |= 1 << i
    return out


def lsh_bucket_topk(df: DataFrame, query: list[float], k: int = 10,
                    bits: int = 12, hamming_radius: int = 3,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    round_to: int | None = 6) -> DataFrame:
    """ANN top-k: prune to vectors whose LSH bucket is within a Hamming
    radius of the query's bucket, then exact cosine on the candidates.

    The scan computes the bucket per vector (codegen) and the filter
    `bit_count(bucket ^ qbucket) <= r` prunes before any sort. At 100 TB
    the bucket would be precomputed at ingest and the table clustered by
    it, turning this into a file-skipping scan."""
    df = parallelize_scan(df)
    planes = hyperplanes(bits, len(query))
    qb = query_bucket(query, planes)
    with_bucket = df.withColumn("__bucket", lsh_bucket(F.col(vec_col), planes))
    candidates = with_bucket.filter(
        F.bit_count(F.col("__bucket").bitwiseXOR(F.lit(qb))) <= hamming_radius)
    return cosine_topk(candidates, query, k, vec_col, id_col, round_to)
