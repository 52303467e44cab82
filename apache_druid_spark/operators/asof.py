"""As-of (point-in-time) join — an operator the reference engine and
stock Spark both lack, standard in time-series stores: for every left
row, attach the LATEST right row whose timestamp is <= the left row's
(``direction="backward"``; ``"forward"`` takes the earliest >=),
optionally within a tolerance and per join key.

Spark-first shape — union + window, NOT a range join:

    tag sides -> union -> one shuffle on the key ->
    per-key time-ordered scan carrying "last right payload seen" ->
    keep left rows

A naive inequality join (``l.ts >= r.ts``) explodes to O(|L| * |R|)
per key before aggregation and falls off Spark's equi-join fast path
entirely (BroadcastNestedLoopJoin). The union shape is one shuffle of
(key, ts, payload), one linear window scan per key — the same plan
whether the tables are 10k rows or 100 TB, and AQE's skew handling
applies to the single exchange. Right rows are deduplicated to one per
(key, ts) first (greatest id wins) so the match is deterministic.

Tolerance nulls the payload when the matched right row is further than
``tolerance_seconds`` from the left timestamp — the match is still the
nearest row; it is just reported as missing (pandas.merge_asof
semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: str | list[str] | None = None,
              right_cols: list[str] | None = None,
              direction: str = "backward",
              tolerance_seconds: int | None = None,
              suffix: str = "_r") -> DataFrame:
    """Left as-of join. ``on``: timestamp column present in both sides;
    ``by``: equality key(s); ``right_cols``: right payload columns to
    attach (default: all non-key, non-time columns), renamed with
    ``suffix`` on collision; the matched right timestamp is always
    attached as ``{on}{suffix}``."""
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward', got {direction!r}")
    by_cols = ([by] if isinstance(by, str) else list(by or []))
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in by_cols and c != on]
    # one right row per (key, ts): build the payload struct and take
    # its max — struct ordering is field-by-field, so ordering by the
    # full payload is a deterministic greatest-wins tie-break
    payload = F.struct(F.col(on).alias(on),
                       *[F.col(c).alias(c) for c in right_cols])
    r = (right.groupBy(*by_cols, on)
         .agg(F.max(payload).alias("__payload"))
         .select(*by_cols, F.col(on), F.col("__payload")))
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"))
    r_tagged = r.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in by_cols and c != on],
        *[F.col(c) for c in by_cols], F.col(on),
        F.lit(0).alias("__side"), F.col("__payload"),
    ).select(*l_tagged.columns)  # align column order for the union

    unioned = l_tagged.unionByName(r_tagged)
    ts_order = F.col(on).asc() if direction == "backward" \
        else F.col(on).desc()
    # backward: right rows sort before left at equal ts => `<=` matches;
    # forward: descending scan makes last-seen the earliest `>=` row
    w = (Window.partitionBy(*[F.col(c) for c in by_cols])
         .orderBy(ts_order, F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (unioned
               .withColumn("__match", F.last("__payload", True).over(w))
               .filter(F.col("__side") == 1))
    m = F.col("__match")
    if tolerance_seconds is not None:
        gap = F.abs(F.unix_timestamp(F.col(on))
                    - F.unix_timestamp(m.getField(on)))
        m = F.when(gap <= tolerance_seconds, m)
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(m.getField(on).alias(f"{on}{suffix}"))
    for c in right_cols:
        name = f"{c}{suffix}" if c in left.columns else c
        out_cols.append(m.getField(c).alias(name))
    return matched.select(*out_cols)
