"""Skew-aware aggregation: two-phase salted groupBy.

The reference never faces aggregation skew the way Spark does — its
per-segment engines aggregate locally and the broker merges a stream
per historical (ParallelMergeCombiningSequence.java), so one hot key
costs one merge lane. In Spark a hot grouping key lands every row on
one reducer. AQE splits skewed JOIN partitions but not aggregation
keys, so for exact re-aggregable metrics we salt:

    groupBy(dims + salt) partial   -- spreads the hot key over N tasks
    groupBy(dims) final            -- combines the N partials

Only works for aggregators with a combining form (sum/count/min/max —
the same set `ingest.reaggregate` handles); avg decomposes to
sum+count. Spark's own partial/final hash aggregation already handles
moderate skew (map-side combine); salting matters when the DISTINCT
value count per hot key is huge and partials stay large.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PARTIAL = {
    "count": lambda c: F.count(F.lit(1)),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}

_FINAL = {
    "count": F.sum, "sum": F.sum, "min": F.min, "max": F.max,
}


def salted_groupby(df: DataFrame, dims: list[str],
                   metrics: list[tuple[str, str, str | None]],
                   salt_buckets: int = 32) -> DataFrame:
    """Two-phase aggregation over ``dims``.

    metrics: list of (output_name, agg, input_col) with agg in
    count/sum/min/max (input_col None for count).

    >>> salted_groupby(df, ["k"], [("cnt", "count", None),
    ...                            ("total", "sum", "v")])
    """
    for _, agg, _ in metrics:
        if agg not in _PARTIAL:
            raise ValueError(f"{agg!r} has no combining form; "
                             "salting needs re-aggregable metrics")
    salt = (F.abs(F.crc32(F.concat_ws(
        "\x00", *[F.col(d).cast("string") for d in dims],
        F.monotonically_increasing_id().cast("string")))) % salt_buckets)
    partial = (df.withColumn("__salt", salt)
               .groupBy(*dims, "__salt")
               .agg(*[_PARTIAL[agg](F.col(col) if col else None).alias(name)
                      for name, agg, col in metrics]))
    return (partial.groupBy(*dims)
            .agg(*[_FINAL[agg](F.col(name)).alias(name)
                   for name, agg, _ in metrics]))
