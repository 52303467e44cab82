"""Having specs — post-aggregation filters for groupBy queries.

Reference: processing/src/main/java/org/apache/druid/query/groupby/having/
*.java (13 files: EqualTo/GreaterThan/LessThan/And/Or/Not/DimSelector/
DimFilter having specs). Compiles to a plain ``.filter`` after the
aggregation — same stage, no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from apache_druid_spark.operators.util import fcol


def compile_having(spec: dict | None, df=None, registry=None) -> Column:
    if spec is None:
        return F.lit(True)
    t = spec["type"]
    if t == "equalTo":
        return fcol(spec["aggregation"]) == F.lit(spec["value"])
    if t == "greaterThan":
        return fcol(spec["aggregation"]) > F.lit(spec["value"])
    if t == "lessThan":
        return fcol(spec["aggregation"]) < F.lit(spec["value"])
    if t == "dimSelector":
        v = spec.get("value")
        c = fcol(spec["dimension"])
        return c.isNull() if v is None else c.cast("string") == F.lit(str(v))
    if t == "and":
        out = F.lit(True)
        for s in spec["havingSpecs"]:
            out = out & compile_having(s, df, registry)
        return out
    if t == "or":
        out = F.lit(False)
        for s in spec["havingSpecs"]:
            out = out | compile_having(s, df, registry)
        return out
    if t == "not":
        return ~compile_having(spec["havingSpec"], df, registry)
    if t == "filter":
        from apache_druid_spark.operators.filters import compile_filter
        return compile_filter(spec["filter"], df, registry)
    raise ValueError(f"unknown having spec: {t!r}")
