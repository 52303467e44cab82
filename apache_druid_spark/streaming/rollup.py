"""Streaming rollup ingestion.

Reference: SeekableStreamSupervisor / SeekableStreamIndexTaskRunner
(indexing-service/.../seekablestream/ — supervisor spawns
partition-assigned tasks, rows roll up in OnheapIncrementalIndex
sinks, offsets commit transactionally with segment publish at
SeekableStreamIndexTaskRunner.java:951).

Spark mapping: ONE streaming query replaces the whole topology —
source offsets live in the checkpoint, the windowed aggregation is the
incremental-index rollup, and an idempotent sink commit is the
transactional publish. Watermarks replace lateMessageRejectionPeriod
(SeekableStreamSupervisorIOConfig.java:47-48): the watermark bounds
state like Druid bounds open sinks, plus an optional hard filter for
strict rejection parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from apache_druid_spark.model.datasource import TIME_COLUMN
from apache_druid_spark.model.granularity import granularity_to_duration
from apache_druid_spark.operators.aggregations import compile_aggregations


def kafka_stream(spark: SparkSession, bootstrap: str, topic: str,
                 value_schema, starting_offsets: str = "earliest") -> DataFrame:
    """Kafka source (KafkaRecordSupplier analogue): JSON value payload
    parsed against an explicit schema. Offsets are checkpoint-managed —
    the partition-offset bookkeeping of KafkaIndexTask, for free."""
    raw = (spark.readStream.format("kafka")
           .option("kafka.bootstrap.servers", bootstrap)
           .option("subscribe", topic)
           .option("startingOffsets", starting_offsets)
           .load())
    return raw.select(
        F.from_json(F.col("value").cast("string"), value_schema).alias("r")
    ).select("r.*")


def file_stream(spark: SparkSession, path: str, schema,
                time_column: str, glob: str | None = None) -> DataFrame:
    """File-drop source with the engine's ``__time`` normalization
    (TIMESTAMP(NANOS) parquet arrives as long under nanosAsLong)."""
    reader = spark.readStream.schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.parquet(path)
    c = F.col(time_column)
    dt = df.schema[time_column].dataType
    if isinstance(dt, T.LongType):
        c = F.timestamp_micros(F.expr(f"`{time_column}` div 1000"))
    elif isinstance(dt, T.TimestampNTZType):
        c = c.cast("timestamp")  # session pinned UTC: value-preserving
    return df.withColumn(TIME_COLUMN, c)


def stream_rollup(stream: DataFrame, dimensions: list[str],
                  metrics: list[dict], query_granularity="hour",
                  watermark: str | None = "1 hour",
                  reject_before: str | None = None) -> DataFrame:
    """Event-time tumbling-window rollup of a stream.

    ``watermark`` bounds aggregation state (late rows beyond it are
    dropped — lateMessageRejectionPeriod semantics); ``reject_before``
    adds the hard cutoff filter for strict parity. The window start
    becomes ``__time`` so rolled-up streaming output is
    indistinguishable from batch rollup output."""
    df = stream
    if reject_before:
        df = df.filter(
            F.col(TIME_COLUMN) >=
            F.current_timestamp() - F.expr(f"INTERVAL {reject_before}"))
    if watermark:
        df = df.withWatermark(TIME_COLUMN, watermark)
    dur = granularity_to_duration(query_granularity)
    aggs = compile_aggregations(metrics, df)
    out = (df.groupBy(F.window(F.col(TIME_COLUMN), dur), *dimensions)
             .agg(*aggs))
    return out.select(F.col("window.start").alias(TIME_COLUMN),
                      *dimensions,
                      *[c for c in out.columns
                        if c not in ("window", *dimensions)])


def stream_dedup(stream: DataFrame, key_cols: list[str] | None = None,
                 content_col: str | None = None,
                 watermark: str | None = "1 hour",
                 time_col: str = TIME_COLUMN) -> DataFrame:
    """Streaming exact dedup — the ingest-time counterpart to
    pipeline.exact_dedup: drop records whose key (or content hash) was
    already seen.

    With a ``watermark`` the dedup state is BOUNDED
    (dropDuplicatesWithinWatermark): a duplicate arriving within the
    watermark horizon of the original is dropped, state older than the
    horizon is evicted — the only formulation that survives an
    unbounded 100 TB/day stream. ``watermark=None`` falls back to
    global dropDuplicates (exact across all time, state grows with
    distinct keys — only for bounded replays).

    ``content_col`` hashes document text to a 16-byte md5 key first —
    the state store holds hashes, not documents."""
    df = stream
    keys = list(key_cols or [])
    if content_col is not None:
        df = df.withColumn("__content_hash", F.md5(F.col(content_col)))
        keys.append("__content_hash")
    if not keys:
        raise ValueError("stream_dedup needs key_cols or content_col")
    if watermark:
        df = df.withWatermark(time_col, watermark)
        out = df.dropDuplicatesWithinWatermark(keys)
    else:
        out = df.dropDuplicates(keys)
    return out.drop("__content_hash")


def realtime_union(historical: DataFrame, realtime: DataFrame) -> DataFrame:
    """The lambda view: committed history UNION ALL in-flight rows —
    the reference's queryable-before-publish behavior
    (server/.../appenderator/SinkQuerySegmentWalker.java) expressed as
    a plain union the optimizer prunes like any other."""
    return historical.unionByName(realtime, allowMissingColumns=True)


def run_to_table(rolled: DataFrame, table: str, checkpoint: str,
                 output_mode: str = "append", available_now: bool = False):
    """Start the streaming query with an exactly-once sink commit
    (checkpointed offsets + idempotent table append = the reference's
    one-transaction offset+segment publish)."""
    w = (rolled.writeStream.outputMode(output_mode)
         .option("checkpointLocation", checkpoint))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.toTable(table)
