"""SemDeDup: semantic deduplication over embedding columns.

Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" (arXiv:2303.09540): cluster embeddings with
k-means, then inside each cluster drop all but one of every group of
semantically-near-identical points (cosine above a tight threshold).
Unlike lexical dedup (minhash/simhash on tokens) this removes
*paraphrase*-level duplicates that share no n-grams.

Spark-first shape (100 TB):

- Cluster assignment is ONE codegen scan — argmax of dot(vec, centroid)
  over literal centroids (``similarity.ivf_assign``, the same cell
  machinery as IVF ANN). Deterministic md5 centroids make the operator
  oracle-reproducible; at corpus scale the centroids come from
  ``similarity.ivf_fit`` (MLlib KMeans on an ingest-time sample) and
  the cell id is materialized at ingest, clustering the table so the
  within-cell self-join below is co-partitioned.
- The within-cluster pair search is a self-join blocked on the cell id
  — work scales with cell populations (~n^2/n_cells per cell in
  expectation), never |corpus|^2; the SemDeDup paper's whole point is
  that k-means blocking makes web-scale pairwise dedup tractable.
- Degenerate cells (a pile of identical embeddings) are dropped by a
  vector-free (cell) count broadcast as a LEFT ANTI join, exactly like
  ``embedding_cosine_pairs``'s bucket cap: byte-identical duplicates
  are exact_dedup's job, not pair expansion's.
- Keep rule: within every near-dup pair (a < b) drop b — the greedy
  min-id representative. (The paper keeps the point with LOWEST cosine
  to the centroid; min-id is a deterministic, engine-reproducible
  stand-in with the same dedup ratio — documented divergence.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apache_druid_spark.pipeline._util import parallelize_scan


def assign_cells(df: DataFrame, centroids: DataFrame,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 out_col: str = "__cell") -> DataFrame:
    """Nearest-centroid assignment against a centroid *DataFrame*
    ``(cell int, centroid array<double>)`` — the scale path.

    ``similarity.ivf_assign`` inlines every centroid as a literal
    expression: perfect for oracle determinism at tens of cells, but
    the codegen expression grows with n_cells and the paper-scale
    SemDeDup configuration (~100k clusters) would not even compile.
    This variant broadcasts the centroid table (100k x dim doubles is
    tens of MB), scores each (row, centroid) on the map side, and
    reduces to the per-row argmax with a partial/final max aggregate
    keyed on the id — the fan-out never hits the shuffle (map-side
    combine leaves one (id, best, vec) row per input row), and the
    tie-break (score DESC, cell DESC) matches ivf_assign. The vector
    rides along via ``first`` so downstream pair pruning needs no
    re-join."""
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), F.col("centroid"),
                   lambda x, y: x.cast("double") * y),
        F.lit(0.0), lambda acc, x: acc + x)
    cnorm = F.sqrt(F.aggregate(
        F.transform(F.col("centroid"), lambda a: a * a),
        F.lit(0.0), lambda acc, x: acc + x))
    scored = (df.select(F.col(id_col), F.col(vec_col))
              .join(F.broadcast(centroids))
              .select(F.col(id_col), F.col(vec_col),
                      F.struct((dot / cnorm).alias("score"),
                               F.col("cell").alias("cell")).alias("__sc")))
    return (scored.groupBy(id_col)
            .agg(F.max("__sc").alias("__best"),
                 F.first(vec_col).alias(vec_col))
            .select(id_col, vec_col,
                    F.col("__best.cell").alias(out_col)))


def semantic_dedup(df: DataFrame, dim: int, n_cells: int = 16,
                   threshold: float = 0.9, vec_col: str = "embedding",
                   id_col: str = "vec_id",
                   centroids: list[list[float]] | None = None,
                   max_cell_size: int = 10000,
                   round_to: int | None = 6) -> DataFrame:
    """(id, cell, is_kept) for every row: ``is_kept`` is False iff the
    row has a within-cell neighbor with cosine >= ``threshold`` and a
    smaller id. ``df.join(result.filter('is_kept'), id)`` is the
    deduplicated corpus.

    Literal centroids (the default, or ``centroids=[[...], ...]``) keep
    the assignment a single codegen scan — right up to a few hundred
    cells and exactly reproducible by the oracle. Past that (SemDeDup's
    web-scale configuration is ~100k clusters from ``ivf_fit``), build
    a ``(cell, centroid)`` DataFrame and use ``assign_cells`` — the
    broadcast-join argmax — then feed its output through the same
    pair-prune below; the grouping cap applies unchanged."""
    from pyspark import StorageLevel

    from apache_druid_spark.pipeline.similarity import _norm, ivf_assign

    if centroids is None:
        from apache_druid_spark.pipeline.similarity import ivf_centroids

        centroids = ivf_centroids(n_cells, dim)
    base = parallelize_scan(df).select(F.col(id_col), F.col(vec_col))
    # one scan: cell argmax + norm; persisted because it feeds the cap
    # aggregate and both self-join sides (ingest-materialized at 100 TB)
    cells = base.select(
        F.col(id_col), F.col(vec_col),
        ivf_assign(F.col(vec_col), centroids).alias("__cell"),
        _norm(F.col(vec_col)).alias("__nrm"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    oversized = (cells.groupBy("__cell")
                 .agg(F.count(F.lit(1)).alias("__csz"))
                 .filter(F.col("__csz") > max_cell_size)
                 .select("__cell"))
    blocked = cells.join(F.broadcast(oversized), "__cell", "left_anti")
    a, b = blocked.alias("a"), blocked.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    cosine = dot / (F.col("a.__nrm") * F.col("b.__nrm"))
    if round_to is not None:
        cosine = F.round(cosine, round_to)
    # every id that has a smaller-id near-dup in its cell gets dropped
    dropped = (a.join(b, [F.col("a.__cell") == F.col("b.__cell"),
                          F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
               .filter(cosine >= threshold)
               .select(F.col(f"b.{id_col}").alias(id_col))
               .distinct())
    return (cells.select(id_col, F.col("__cell").alias("cell"))
            .join(dropped.withColumn("__drop", F.lit(True)),
                  id_col, "left")
            .select(id_col, "cell",
                    F.coalesce(~F.col("__drop"), F.lit(True))
                    .alias("is_kept")))
