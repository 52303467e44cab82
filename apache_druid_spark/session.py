"""SparkSession factory tuned for the engine.

Local testing runs on local[N]; the same configuration scales to a real
cluster — AQE handles runtime re-planning (partition coalescing, skew
joins, dynamic broadcast), and UTC session time zone pins Druid's
millis-since-epoch semantics (reference:
core/src/main/java/org/apache/druid/java/util/common/DateTimes.java).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "apache_druid_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Defaults favor the local[32] test rig but every knob here is the
    one you would also set on a 1000-executor cluster: AQE on, UTC,
    Arrow for the pandas paths, shuffle partitions sized to the
    parallelism at hand rather than the 200 default.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: ~cores; on a real cluster this would be
        # 2-3x total executor cores (set via extra_conf).
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Druid's expression evaluation never throws on coercion
        # (processing/.../math/expr/ExprEval.java: malformed numeric
        # strings evaluate to null/0, casts truncate through decimal,
        # '10.1' = 10 compares numerically) — Spark's legacy (non-ANSI)
        # semantics match that contract; ANSI mode would hard-fail a
        # 100 TB scan on one malformed row
        .config("spark.sql.ansi.enabled", "false")
        # non-ANSI flips size(NULL) to legacy -1; Druid's
        # array_length(null) is null (ArrayLengthExprMacro) — keep the
        # null-propagating form
        .config("spark.sql.legacy.sizeOfNull", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # parquet TIMESTAMP(NANOS) (e.g. pandas-written data) reads as
        # long nanos; sources convert to TimestampType on registration
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # INT96 timestamps carry no footer statistics — write MICROS so
        # published segments answer extent/min-max from metadata
        # (plans/compiler._footer_extent) and prune on row-group stats
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
