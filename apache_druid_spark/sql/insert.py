"""SQL-driven batch ingest: INSERT/REPLACE INTO ... SELECT ... FROM
TABLE(EXTERN(...)) PARTITIONED BY <granularity>.

Reference: parser sql/src/main/java/org/apache/druid/sql/calcite/parser/
DruidSqlInsert.java; EXTERN table function
sql/.../external/ExternalOperatorConversion.java:50-56; validation
(__time required, PARTITIONED BY mandatory) DruidPlanner.java:151-152.

Spark shape: EXTERN's (inputSource, inputFormat, signature) JSON args
feed ingest.read_input, the signature becomes casts, the SELECT runs
through spark.sql over a temp view, and the write is a
segment-granularity-partitioned parquet publish — dynamic partition
overwrite for REPLACE (segment versioning collapsed into the table
format).
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_druid_spark.model.datasource import TIME_COLUMN

_INSERT_RE = re.compile(
    r"^\s*(INSERT|REPLACE)\s+INTO\s+([A-Za-z_][\w.]*)\s+"
    r"(?:OVERWRITE\s+ALL\s+)?(.*?)\s*"
    r"PARTITIONED\s+BY\s+(\w+|'[^']+')\s*"
    r"(?:CLUSTERED\s+BY\s+(.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_EXTERN_RE = re.compile(
    r"TABLE\s*\(\s*EXTERN\s*\(\s*'((?:[^']|'')*)'\s*,\s*'((?:[^']|'')*)'\s*"
    r"(?:,\s*'((?:[^']|'')*)'\s*)?\)\s*\)",
    re.IGNORECASE | re.DOTALL,
)

_DRUID_TO_SPARK_TYPE = {
    "string": "string", "long": "bigint", "double": "double",
    "float": "float",
}


def parse_insert(text: str) -> dict | None:
    m = _INSERT_RE.match(text)
    if not m:
        return None
    verb, target, select, gran, clustered = m.groups()
    return {
        "verb": verb.upper(), "target": target, "select": select,
        "granularity": gran.strip("'").lower(),
        "clustered_by": ([c.strip() for c in clustered.split(",")]
                         if clustered else []),
    }


def _extern_df(spark: SparkSession, select: str) -> tuple[str, str]:
    """Replace TABLE(EXTERN(...)) with a registered temp view; returns
    the rewritten SELECT and the view name."""
    m = _EXTERN_RE.search(select)
    if not m:
        return select, ""
    src_json, fmt_json, sig_json = m.groups()
    src = json.loads(src_json.replace("''", "'"))
    fmt = json.loads(fmt_json.replace("''", "'"))
    from apache_druid_spark.ingest.batch import read_input

    df = read_input(spark, {"inputSource": src, "inputFormat": fmt})
    if sig_json:
        sig = json.loads(sig_json.replace("''", "'"))
        cols = []
        for c in sig:
            name, typ = c["name"], str(c.get("type", "string")).lower()
            cols.append(F.col(name).cast(
                _DRUID_TO_SPARK_TYPE.get(typ, typ)).alias(name))
        df = df.select(*cols)
    view = "__extern_input"
    df.createOrReplaceTempView(view)
    return select[:m.start()] + view + select[m.end():], view


def druid_sql_insert(spark: SparkSession, text: str, registry,
                     base_path: str) -> DataFrame:
    """Execute a Druid INSERT/REPLACE statement; returns the written
    DataFrame and registers the target as a datasource."""
    from apache_druid_spark.ingest.batch import write_segments
    from apache_druid_spark.sql.dialect import druid_sql

    spec = parse_insert(text)
    if spec is None:
        raise ValueError("not an INSERT/REPLACE statement")
    # target validation (DruidSqlInsert/IngestHandler: only the druid
    # schema is writable — CalciteInsertDmlTest testInsertIntoSystemTable
    # / IntoView / IntoNonexistentSchema all reject)
    target = spec["target"]
    if "." in target:
        schema, _, bare = target.partition(".")
        if schema.lower() != "druid":
            raise ValueError(
                f"Cannot {spec['verb']} into [{target}]: only the "
                f"'druid' schema is writable (sys/INFORMATION_SCHEMA/"
                f"lookup/view targets are read-only)")
        spec["target"] = bare
    select, _ = _extern_df(spark, spec["select"])
    out = druid_sql(spark, select, registry)
    if TIME_COLUMN not in out.columns:
        raise ValueError(
            "INSERT requires a __time column in the SELECT "
            "(DruidPlanner.java:151-152 validation)")
    out = out.withColumn(TIME_COLUMN, F.col(TIME_COLUMN).cast("timestamp"))
    if spec["clustered_by"]:
        out = out.repartitionByRange(*[F.col(c) for c in spec["clustered_by"]])
    path = f"{base_path}/{spec['target']}"
    # DruidSqlInsert semantics: INSERT *appends* segments to the
    # datasource; REPLACE overwrites — and only the touched
    # segment-granularity chunks (dynamic partition overwrite), matching
    # OVERWRITE WHERE/ALL timeline overshadowing.
    mode = "append" if spec["verb"] == "INSERT" else "overwrite"
    write_segments(out, path, segment_granularity=spec["granularity"],
                   mode=mode)
    df = spark.read.parquet(path).drop("__segment")
    registry.register(spec["target"], df)
    registry.record_segments(spec["target"], path, spec["granularity"])
    return df
