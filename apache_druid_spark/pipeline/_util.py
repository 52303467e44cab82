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
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
