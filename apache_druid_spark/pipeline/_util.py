"""Shared pipeline helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def parallelize_scan(df: DataFrame) -> DataFrame:
    """Spread a narrow scan across the cluster before compute-heavy
    per-row work (hashing, HOF folds).

    A parquet scan can't parallelize past its row-group count; a table
    written as one row group (or a handful of small files) therefore
    pins all downstream map-side compute to a few tasks. One cheap
    round-robin shuffle of the raw rows fixes that. At scale this is a
    no-op: when the source already has >= defaultParallelism partitions
    the input is returned untouched, so well-laid-out 100 TB tables pay
    nothing.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # Input-file count from the catalog, NOT df.rdd.getNumPartitions():
    # the RDD conversion forces a full plan re-derivation per call,
    # which on a 100 TB table is a real planning cost.
    try:
        nfiles = len(df.inputFiles())
    except Exception:
        nfiles = 0
    if nfiles >= target:
        return df
    return df.repartition(target)
