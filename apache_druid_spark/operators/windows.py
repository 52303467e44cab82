"""Scale-safe trailing windows over dense time-bucket grids.

A dimension-less trailing window (``Window.orderBy(time)`` with no
``partitionBy``) makes Spark move every row to ONE task (WindowExec
logs "No Partition Defined"). Fine for a 2k-row pre-aggregate; a
genuine scale-killer at second/minute granularity over years.

The fix implemented here: partition the grid into coarse fixed-size
chunks of consecutive buckets and replicate each chunk's last ``n-1``
rows into the following chunk as helper rows. A trailing ``n``-bucket
window partitioned by chunk then sees full history at every non-helper
row, and the helper outputs are dropped afterward. Matches the
reference's ring-buffer semantics (extensions-contrib/
moving-average-query/.../averagers/BaseAverager.java) while keeping
per-task state bounded at chunk+n rows.

Requires the input to be a dense bucket grid (one row per granularity
bucket, as produced by the zero-fill step) with uniform bucket spacing
in either months or milliseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_CHUNK = 1024  # buckets per window partition (>= 2*n enforced)


def bucket_index(time_col, months: int, millis: int):
    """Strictly-increasing integer index of a grid row's bucket.

    For uniform spacing s, floor(x/s) increments by exactly 1 per
    bucket regardless of grid alignment (floor((t0 + k*s)/s) =
    floor(t0/s) + k), so this needs no knowledge of the grid origin."""
    t = F.col(time_col) if isinstance(time_col, str) else time_col
    if months:
        return F.floor((F.year(t) * 12 + F.month(t) - F.lit(1))
                       / F.lit(months)).cast("long")
    return F.floor(F.unix_millis(t) / F.lit(millis)).cast("long")


def chunked_trailing_window(df: DataFrame, time_col: str, n: int, *,
                            months: int = 0, millis: int = 0,
                            chunk: int = _CHUNK):
    """Return (stitched_df, window_spec) for a trailing n-bucket window
    that never collapses to a single partition.

    Apply window columns over the returned spec, then call
    :func:`finalize_chunked` to drop the replicated helper rows."""
    if not months and not millis:
        raise ValueError("need bucket spacing as months or millis")
    c = max(int(chunk), 2 * n)
    idx = bucket_index(time_col, months, millis)
    cur = (df.withColumn("__chunk", F.floor(idx / F.lit(c)))
             .withColumn("__helper", F.lit(False)))
    stitched = cur
    if n > 1:
        tails = (df.filter(F.pmod(idx, F.lit(c)) >= F.lit(c - (n - 1)))
                   .withColumn("__chunk", F.floor(idx / F.lit(c)) + F.lit(1))
                   .withColumn("__helper", F.lit(True)))
        stitched = cur.unionByName(tails)
    w = (Window.partitionBy("__chunk")
         .orderBy(F.col(time_col).asc())
         .rowsBetween(-(n - 1), 0))
    return stitched, w


def finalize_chunked(df: DataFrame) -> DataFrame:
    """Drop helper rows and chunk bookkeeping after window columns."""
    return df.filter(~F.col("__helper")).drop("__chunk", "__helper")
