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


def _rank_topk(df: DataFrame, query: list[float], k: int,
               vec_col: str, id_col: str,
               round_to: int | None) -> DataFrame:
    """Exact cosine re-rank (no repartition — callers own layout)."""
    import math

    qnorm = math.sqrt(sum(float(x) * float(x) for x in query)) or 1.0
    score = _dot_literal(F.col(vec_col), query) / (_norm(F.col(vec_col)) * F.lit(qnorm))
    if round_to is not None:
        score = F.round(score, round_to)
    return (df.select(F.col(id_col), score.alias("cosine"))
              .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
              .limit(k))


def cosine_topk(df: DataFrame, query: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id",
                round_to: int | None = 6) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    return _rank_topk(parallelize_scan(df), query, k, vec_col, id_col,
                      round_to)


def hyperplanes(bits: int, dim: int, seed: str = "") -> list[list[float]]:
    """Deterministic +-1 hyperplanes from md5 parity (engine-agnostic).
    ``seed`` prefixes the digest input so callers can derive multiple
    independent plane sets (multi-table LSH)."""
    planes = []
    for b in range(bits):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}{b}-{d}".encode()).hexdigest()
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


def ivf_centroids(n_cells: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random centroids, uniform in [-1, 1).

    Components are md5-derived and rounded to 6 decimals so the exact
    same literals can be embedded in any engine's SQL (the decimal
    string parses to the identical IEEE double everywhere). At 100 TB
    these would instead come from MLlib KMeans over an ingest-time
    sample; everything downstream is unchanged."""
    cells = []
    for c in range(n_cells):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"ivf-{c}-{d}".encode()).hexdigest()
            row.append(round(int(h[:8], 16) / 2.0 ** 31 - 1.0, 6))
        cells.append(row)
    return cells


def ivf_fit(df: DataFrame, n_cells: int = 16, vec_col: str = "embedding",
            sample_fraction: float | None = None, seed: int = 42,
            max_iter: int = 20) -> list[list[float]]:
    """Fit IVF centroids with MLlib KMeans and return them as plain
    literal lists feeding ``ivf_topk(centroids=...)``.

    This is the documented 100 TB path for ``ivf_centroids``: train on
    an ingest-time sample (FAISS-style IVF trains on ~a few hundred
    vectors per cell, not the corpus), materialize the fitted cell id
    per row at ingest, and cluster/partition the table by it so probe
    filters become partition pruning. ``sample_fraction`` sizes that
    sample — at corpus scale pick fraction ~ (256 * n_cells) / N so
    the KMeans input is a few MB regardless of table size.

    Centroid components are rounded to 6 decimals for the same
    engine-portability reason as ``ivf_centroids`` (the decimal string
    parses to the identical IEEE double everywhere). The md5 variant
    remains the deterministic default for oracle entries."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.select(
        array_to_vector(F.col(vec_col).cast("array<double>"))
        .alias("features"))
    if sample_fraction is not None:
        feats = feats.sample(fraction=sample_fraction, seed=seed)
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(feats)
    return [[round(float(x), 6) for x in c] for c in model.clusterCenters()]


def ivf_assign(vec_col, centroids: list[list[float]]):
    """Cell id = argmax over centroids of dot(vec, c)/||c||, computed
    as array_max over (score, cell) structs — ties break to the
    highest cell id, mirrored by the oracle's ORDER BY score DESC,
    cell DESC."""
    import math

    scored = []
    for i, c in enumerate(centroids):
        nrm = math.sqrt(sum(x * x for x in c)) or 1.0
        scored.append(F.struct(
            (_dot_literal(vec_col, c) / F.lit(nrm)).alias("score"),
            F.lit(i).alias("cell")))
    return F.array_max(F.array(*scored)).getField("cell")


def ivf_probe_cells(query: list[float], centroids: list[list[float]],
                    n_probe: int) -> list[int]:
    """Driver-side probe-set selection: the n_probe cells whose
    centroid is closest to the query."""
    import math

    scores = []
    for i, c in enumerate(centroids):
        nrm = math.sqrt(sum(x * x for x in c)) or 1.0
        scores.append((sum(a * b for a, b in zip(query, c)) / nrm, i))
    scores.sort(key=lambda t: (-t[0], -t[1]))
    return sorted(i for _, i in scores[:n_probe])


def ivf_topk(df: DataFrame, query: list[float], k: int = 10,
             n_cells: int = 16, n_probe: int = 4,
             vec_col: str = "embedding", id_col: str = "vec_id",
             round_to: int | None = 6,
             centroids: list[list[float]] | None = None) -> DataFrame:
    """IVF ANN top-k: assign every vector to its nearest of ``n_cells``
    centroids (one codegen scan), prune to the ``n_probe`` cells
    nearest the query, exact cosine re-rank on the survivors.

    Scale path (100 TB): the cell id is materialized at ingest and the
    table is clustered/partitioned by it, so the probe filter becomes
    partition pruning — the scan touches n_probe/n_cells of the files.
    n_probe trades recall for latency exactly as in FAISS-style IVF.

    Reference has no ANN surface; this extends the engine for
    embedding-scale training-data pipelines."""
    df = parallelize_scan(df)
    if centroids is None:
        centroids = ivf_centroids(n_cells, len(query))
    probes = ivf_probe_cells(query, centroids, min(n_probe, len(centroids)))
    with_cell = df.withColumn("__cell", ivf_assign(F.col(vec_col), centroids))
    candidates = with_cell.filter(F.col("__cell").isin(probes))
    return _rank_topk(candidates, query, k, vec_col, id_col, round_to)


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
    return _rank_topk(candidates, query, k, vec_col, id_col, round_to)
