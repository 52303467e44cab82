"""Streaming rollup: file source -> windowed rollup -> sink, checked
against the equivalent batch rollup (streaming/batch agreement is the
SURVEY §5 parameterized-run requirement)."""

from __future__ import annotations

import pyspark.sql.functions as F

from apache_druid_spark.model.datasource import TIME_COLUMN
from apache_druid_spark.streaming import file_stream, stream_rollup

SF_DIR = "/root/testdata/sf0.001"

METRICS = [
    {"type": "count", "name": "cnt"},
    {"type": "doubleSum", "name": "total_value", "fieldName": "value"},
]


def test_run_to_table_exactly_once(spark, tmp_path):
    """Checkpointed sink restart is idempotent: a second availableNow
    run over the same source with the same checkpoint commits nothing
    new (the offsets+publish single-transaction analogue,
    SeekableStreamIndexTaskRunner.java:951)."""
    from apache_druid_spark.streaming import run_to_table

    spark.conf.set("spark.sql.streaming.schemaInference", "false")
    batch_schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    ckpt = str(tmp_path / "ckpt")
    spark.sql("DROP TABLE IF EXISTS t_once")
    # a stale managed-table location from a previous session survives
    # the DROP (metadata is per-catalog, the dir is not)
    import os
    import shutil

    shutil.rmtree(os.path.join(os.getcwd(), "spark-warehouse", "t_once"),
                  ignore_errors=True)

    def run():
        stream = file_stream(spark, SF_DIR, batch_schema, "ts",
                             glob="events.parquet")
        rolled = stream_rollup(stream, ["event_type"], METRICS,
                               query_granularity="hour",
                               watermark="30 minutes")
        q = run_to_table(rolled, "t_once", ckpt, output_mode="append",
                         available_now=True)
        q.awaitTermination()
        return spark.table("t_once").count()

    first = run()
    assert first > 0  # finalized windows emitted via the no-data batch
    second = run()
    assert second == first  # nothing reprocessed


def test_stream_rollup_matches_batch(spark, tmp_path):
    batch_schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    stream = file_stream(spark, SF_DIR, batch_schema, "ts",
                         glob="events.parquet")
    rolled = stream_rollup(stream, ["event_type"], METRICS,
                           query_granularity="hour", watermark=None)
    q = (rolled.writeStream.format("memory").queryName("t_stream_rollup")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r[TIME_COLUMN], r["event_type"]): (r["cnt"], r["total_value"])
           for r in spark.table("t_stream_rollup").collect()}

    from pyspark.sql import types as T

    raw = spark.read.parquet(f"{SF_DIR}/events.parquet")
    if isinstance(raw.schema["ts"].dataType, T.LongType):
        tcol = F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    else:
        tcol = F.col("ts").cast("timestamp")
    raw = raw.withColumn(TIME_COLUMN, tcol)
    want = {(r[TIME_COLUMN], r["event_type"]): (r["cnt"], r["total_value"])
            for r in (raw.groupBy(F.date_trunc("hour", F.col(TIME_COLUMN))
                                  .alias(TIME_COLUMN), "event_type")
                      .agg(F.count(F.lit(1)).alias("cnt"),
                           F.sum("value").alias("total_value"))).collect()}
    assert set(got) == set(want)
    for k, (cnt, tv) in want.items():
        assert got[k][0] == cnt
        assert abs(got[k][1] - tv) < 1e-6


def test_stateful_running_rollup_carries_state(spark, registry, tmp_path):
    """applyInPandasWithState: final per-key state equals the batch
    aggregate, and state provably crosses micro-batch boundaries."""
    from pyspark.sql import functions as F

    from apache_druid_spark.streaming import (
        final_state, run_updates_to_memory, running_rollup,
    )

    src = registry.table("events").select("event_type", "value")
    path = str(tmp_path / "src")
    src.repartition(2).write.parquet(path)
    schema = spark.read.parquet(path).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(path))
    updates = running_rollup(stream, "event_type", "value")
    run_updates_to_memory(updates, "t_stateful", str(tmp_path / "ckpt"))

    log = spark.table("t_stateful")
    # at least one key must have been updated in 2+ micro-batches
    multi = (log.groupBy("event_type").count()
             .filter(F.col("count") > 1).count())
    assert multi > 0

    got = {r["event_type"]: (r["cnt"], round(r["total"], 4))
           for r in final_state(spark, "t_stateful", "event_type").collect()}
    want = {r["event_type"]: (r["cnt"], round(r["total"], 4))
            for r in src.groupBy("event_type")
                        .agg(F.count(F.lit(1)).alias("cnt"),
                             F.sum("value").alias("total")).collect()}
    assert got == want


def test_stream_dedup_drops_duplicates(spark, tmp_path):
    """Streaming exact dedup: duplicated content within the watermark
    horizon is dropped; output matches batch exact-dedup survivors."""
    import datetime as dt

    from apache_druid_spark.streaming import stream_dedup

    src = str(tmp_path / "docs_stream")
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(20):
        # ids 10..19 duplicate the text of 0..9 a few minutes later
        rows.append((i, f"text {i % 10}",
                     base + dt.timedelta(minutes=i)))
    spark.createDataFrame(
        rows, "doc_id long, text string, ts timestamp"
    ).write.mode("overwrite").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema).parquet(src)
              .withColumn("__time", F.col("ts")))
    deduped = stream_dedup(stream, content_col="text",
                           watermark="2 hours")
    q = (deduped.writeStream.format("memory").queryName("dedup_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    out = spark.table("dedup_out").collect()
    assert len(out) == 10
    texts = sorted(r["text"] for r in out)
    assert texts == sorted(f"text {i}" for i in range(10))
    assert "__content_hash" not in spark.table("dedup_out").columns
