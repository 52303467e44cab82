"""Post-aggregators: expressions over aggregate results.

Reference registry: processing/src/main/java/org/apache/druid/jackson/
AggregatorsModule.java:133-143; implementations in
processing/.../aggregation/post/*.java. In Spark these are plain column
expressions applied with a ``select`` after ``.agg(...)`` — no special
machinery, they run in the same stage as the final aggregation.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from apache_druid_spark.operators.expressions import compile_expression
from apache_druid_spark.operators.util import fcol


def compile_post_aggregator(spec: dict, registry=None) -> Column:
    t = spec["type"]
    name = spec.get("name")

    if t == "arithmetic":
        fn = spec["fn"]
        fields = [compile_post_aggregator(f, registry) for f in spec["fields"]]
        if fn == "+":
            c = reduce(lambda a, b: a + b, fields)
        elif fn == "-":
            c = reduce(lambda a, b: a - b, fields)
        elif fn == "*":
            c = reduce(lambda a, b: a * b, fields)
        elif fn == "/":
            # Druid arithmetic '/' returns 0 on division by zero
            # (processing/.../aggregation/post/ArithmeticPostAggregator.java)
            c = reduce(lambda a, b: F.when(b == 0, F.lit(0.0)).otherwise(a / b),
                       fields)
        elif fn == "quotient":
            c = reduce(lambda a, b: a / b, fields)
        else:
            raise ValueError(f"unknown arithmetic fn {fn!r}")
    elif t in ("fieldAccess", "finalizingFieldAccess"):
        c = fcol(spec["fieldName"])
    elif t == "constant":
        c = F.lit(spec["value"])
    elif t == "expression":
        c = compile_expression(spec["expression"], registry)
    elif t in ("doubleGreatest", "longGreatest"):
        c = F.greatest(*[compile_post_aggregator(f, registry)
                         for f in spec["fields"]])
    elif t in ("doubleLeast", "longLeast"):
        c = F.least(*[compile_post_aggregator(f, registry)
                      for f in spec["fields"]])
    elif t == "hyperUniqueCardinality":
        c = fcol(spec["fieldName"])
    elif t == "javascript":
        raise NotImplementedError("javascript post-aggregators unsupported")
    else:
        raise ValueError(f"unknown post-aggregator type: {t!r}")

    return c.alias(name) if name else c


def apply_post_aggregations(df: DataFrame, specs: list[dict],
                            registry=None) -> DataFrame:
    """Append post-aggregator columns to an aggregated DataFrame. A
    post-aggregator named like an existing output column (a dimension,
    an aggregator, or a prior post-aggregator) is an ERROR — the
    reference's Queries.prepareAggregations (used by the groupBy/topN/
    timeseries constructors) throws "[name] already defined" on any
    output-name collision
    (processing/.../query/Queries.java:113,130;
    GroupByQueryRunnerTest.testGroupByWithUniquesAndPostAggWithSameName
    is @Test(expected = IllegalArgumentException.class))."""
    from apache_druid_spark.operators.aggregations import (
        _HIDDEN_SKETCH_PREFIX,
    )

    hidden = [c for c in df.columns
              if c.startswith(_HIDDEN_SKETCH_PREFIX)]
    if not specs:
        return df.drop(*hidden) if hidden else df
    seen = set(df.columns)
    cols = [F.col(c) for c in df.columns
            if not c.startswith(_HIDDEN_SKETCH_PREFIX)]
    for s in specs:
        if not isinstance(s, dict):
            continue
        name = s.get("name")
        if name in seen:
            raise ValueError(f"[{name}] already defined")
        if name is not None:
            seen.add(name)
        if s.get("type") == "computed":
            # a pre-built Column from the sketch post-agg synthesis
            # (operators/aggregations.py synthesize_quantile_postaggs)
            cols.append(s["__column"].alias(name))
        else:
            cols.append(compile_post_aggregator(s, registry))
    return df.select(*cols)
