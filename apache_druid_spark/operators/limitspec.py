"""Limit specs: ORDER BY + LIMIT + OFFSET for groupBy results.

Reference: processing/src/main/java/org/apache/druid/query/groupby/orderby/
DefaultLimitSpec.java, OrderByColumnSpec.java; string comparators in
core/src/main/java/org/apache/druid/java/util/common/guava/StringComparators.java
(lexicographic, alphanumeric, numeric, strlen, version).

Sort-key construction: numeric/strlen/version comparators become pure
Catalyst expressions. ``alphanumeric`` (digit runs compared as numbers)
needs per-value tokenization — implemented as a zero-padding expression
chain (still codegen, no UDF): digit runs are left-padded to fixed
width so lexicographic order equals alphanumeric order for runs up to
20 digits.

Spark executes orderBy().limit(k) as TakeOrderedAndProject — each
partition keeps a k-heap and the driver merges, which is exactly
Druid's per-segment topN + broker merge, but exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from apache_druid_spark.operators.util import fcol


def _sort_key(col: Column, comparator: str) -> Column:
    c = comparator or "lexicographic"
    if c == "numeric":
        # StringComparators.NUMERIC: NULL first, then parseable values
        # by numeric value, then non-numeric strings lexicographically
        # (testGroupByOrderLimitNumeric orders the non-numeric quality
        # aliases alphabetically; testAggregateOnLongNumericNull puts
        # the null group first)
        d = col.cast("double")
        flag = (F.when(col.isNull(), F.lit(-1))
                .when(d.isNull(), F.lit(1)).otherwise(F.lit(0)))
        return F.struct(flag, d, col.cast("string"))
    if c == "strlen":
        # order by length, then value
        return F.struct(F.length(col.cast("string")), col.cast("string"))
    if c == "version":
        # dotted components compared numerically, then lexicographically
        parts = F.split(col.cast("string"), r"[.\-]")
        nums = F.transform(parts, lambda p: F.lpad(
            F.when(p.rlike(r"^\d+$"), p).otherwise(F.lit("0")), 12, "0"))
        return F.struct(F.array_join(nums, "."), col.cast("string"))
    if c == "alphanumeric":
        # Alphanum chunking (StringComparators.java:105-258): digit
        # runs compare numerically, non-digit runs compare CASE-
        # INSENSITIVELY (String.CASE_INSENSITIVE_ORDER), and a digit
        # run sorts BEFORE a non-digit run ('10' < '-2000',
        # BoundFilterTest.testAlphaNumericMatchWithNegatives). Key:
        # lowercase, zero-pad each digit run to 20 chars, then prefix
        # the run with \x01 so it sorts below any text chunk (all real
        # text is >= \x02). Pure codegen — no UDF. Runs over 20 digits
        # and strings containing \x00/\x01 are out of key range
        # (documented divergence, same as before).
        s = F.lower(col.cast("string"))
        padded = F.regexp_replace(s, r"(\d+)", r"00000000000000000000$1")
        # keep only the last 20 chars of each run: (\d{20,}) -> trim left
        trimmed = F.regexp_replace(padded, r"0*(\d{20})", r"$1")
        return F.regexp_replace(trimmed, r"(\d{20})", "\x01$1")
    return col.cast("string")


def apply_limit_spec(df: DataFrame, spec: dict | None,
                     default_order: list[Column] | None = None,
                     dim_names: list[str] | None = None,
                     time_first: bool = False) -> DataFrame:
    """``dim_names`` (the query's grouping dimensions) break metric
    ties in natural dimension order — DefaultLimitSpec appends the
    remaining grouping columns to its comparator chain, so equal
    metric values order by dimension
    (GroupByQueryRunnerTest.testGroupByWithOrderOnHyperUnique: upfront
    and total_market tie on uniques and come back
    dimension-ascending). ``time_first``: with a non-ALL granularity
    the merged result streams time-bucket-major, so the bucket
    outranks the limitSpec columns unless they order __time
    explicitly (testGroupByWithAlphaNumericDimensionOrder pins
    day-major rows)."""
    if spec is None:
        return df
    t = spec.get("type", "default")
    if t == "noop" or t == "NoopLimitSpec":
        return df
    if t != "default":
        raise ValueError(f"unknown limitSpec type: {t!r}")
    for k in ("limit", "offset"):
        if spec.get(k) is not None and int(spec[k]) < 0:
            # DefaultLimitSpec validation (testMergeResultsWith
            # NegativeLimit: build-time IllegalArgumentException)
            raise ValueError(f"{k}[{spec[k]}] must be >= 0")

    order_cols = []
    ordered_dims = set()
    for oc in spec.get("columns", []):
        if isinstance(oc, str):
            oc = {"dimension": oc}
        dim = oc["dimension"]
        ordered_dims.add(dim)
        direction = oc.get("direction", "ascending").lower()
        comparator = oc.get("dimensionOrder")
        from pyspark.sql import types as _T
        if dim in df.columns and isinstance(
                df.schema[dim].dataType, _T.ArrayType):
            # an ARRAY-typed grouping key orders element-wise in its
            # natural (per-element) order whatever the comparator
            # names — GroupByQueryRunnerTest.testGroupByWithLongArrays
            # sorts single-element numeric arrays NUMERICALLY; string
            # comparators would need per-element transforms the
            # reference does not apply either
            key = fcol(dim)
        elif comparator is None and dim_names is not None \
                and dim not in dim_names:
            # a METRIC/post-agg column with no explicit comparator
            # orders by the aggregator's NATURAL comparator, not the
            # lexicographic dimension default (DefaultLimitSpec.
            # makeComparator; testMergeResultsAcrossMultipleDaysWith
            # LimitAndOrderBy: longSum 78 sorts below 2900)
            key = fcol(dim)
        else:
            key = _sort_key(fcol(dim), comparator or "lexicographic")
        order_cols.append(key.desc() if direction.startswith("desc") else key.asc())

    if order_cols:
        for d in dim_names or []:
            if d not in ordered_dims:
                order_cols.append(fcol(d).asc())
        if time_first and "__time" not in ordered_dims \
                and "__time" in df.columns:
            order_cols = [fcol("__time").asc()] + order_cols
        df = df.orderBy(*order_cols)
    elif default_order:
        df = df.orderBy(*default_order)

    offset = int(spec.get("offset", 0) or 0)
    limit = spec.get("limit")
    if offset:
        df = df.offset(offset)
    if limit is not None:
        df = df.limit(int(limit))
    return df
