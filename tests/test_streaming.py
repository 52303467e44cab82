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


def test_kinesis_supervisor_spec_ingest(spark, tmp_path):
    # KinesisSupervisorSpec (extensions-core/kinesis-indexing-service/
    # KinesisSupervisorIOConfig.java): the user's exact supervisor
    # document drives ingestion — here over the file-stream double
    # (no shard endpoint in the rig), the same treatment the Kafka
    # path has always had. lateMessageRejectionPeriod becomes the
    # watermark; dataSchema configures the rollup.
    from apache_druid_spark.streaming import (parse_supervisor_spec,
                                              supervisor_ingest)

    spec = {
        "type": "kinesis",
        "spec": {
            "ioConfig": {
                "stream": "events",
                "endpoint": "kinesis.us-east-2.amazonaws.com",
                "useEarliestSequenceNumber": True,
                "lateMessageRejectionPeriod": "PT2H",
            },
            "dataSchema": {
                "dataSource": "events_rollup",
                "timestampSpec": {"column": "ts", "format": "auto"},
                "dimensionsSpec": {"dimensions": ["event_type"]},
                "metricsSpec": METRICS,
                "granularitySpec": {"queryGranularity": "hour",
                                    "segmentGranularity": "day"},
            },
        },
    }
    cfg = parse_supervisor_spec(spec)
    assert cfg["kind"] == "kinesis"
    assert cfg["source"]["options"]["streamName"] == "events"
    assert cfg["source"]["options"]["startingposition"] == "TRIM_HORIZON"
    assert cfg["watermark"] == "2 hours"

    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    stream = file_stream(spark, SF_DIR, batch.schema, "ts",
                         glob="events.parquet")
    rolled = supervisor_ingest(spark, spec, source_df=stream)
    import shutil

    spark.sql("DROP TABLE IF EXISTS kinesis_rollup_t")
    shutil.rmtree("spark-warehouse/kinesis_rollup_t",
                  ignore_errors=True)
    q = (rolled.writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True)
         .toTable("kinesis_rollup_t"))
    q.awaitTermination(120)
    got = spark.table("kinesis_rollup_t")
    from pyspark.sql import types as T

    tcol = (F.timestamp_micros(F.expr("ts div 1000"))
            if isinstance(batch.schema["ts"].dataType, T.LongType)
            else F.col("ts").cast("timestamp"))
    want = (batch
            .withColumn(TIME_COLUMN, tcol)
            .groupBy(F.date_trunc("hour", TIME_COLUMN)
                     .alias(TIME_COLUMN), "event_type")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.sum("value").alias("total_value")))
    # append mode only emits windows CLOSED by the final watermark, so
    # the trailing <=2h of buckets stay held back — every emitted
    # bucket must match the batch rollup exactly, and the only
    # missing buckets are that unclosed tail
    n_got, n_want = got.count(), want.count()
    assert 0 <= n_want - n_got <= 4 * batch.select(
        "event_type").distinct().count()
    joined = (got.alias("g").join(
        want.alias("w"), ["__time", "event_type"])
        .where("g.cnt <> w.cnt OR abs(g.total_value - w.total_value) "
               "> 1e-6"))
    assert joined.count() == 0
    missing = want.join(got, ["__time", "event_type"], "left_anti")
    max_emitted = got.agg(F.max(TIME_COLUMN)).first()[0]
    assert all(r[TIME_COLUMN] > max_emitted
               for r in missing.collect())


def test_kafka_supervisor_spec_parse():
    # KafkaSupervisorSpec ioConfig -> Spark kafka source options
    from apache_druid_spark.streaming import parse_supervisor_spec

    cfg = parse_supervisor_spec({
        "type": "kafka",
        "spec": {
            "ioConfig": {
                "topic": "wiki",
                "consumerProperties": {
                    "bootstrap.servers": "broker:9092"},
                "useEarliestOffset": False,
            },
            "dataSchema": {
                "dataSource": "wiki",
                "timestampSpec": {"column": "time", "format": "iso"},
                "dimensionsSpec": {"dimensions": [
                    {"name": "channel"}, "page"]},
                "granularitySpec": {"queryGranularity": "none"},
            },
        },
    })
    assert cfg["source"]["format"] == "kafka"
    assert cfg["source"]["options"]["subscribe"] == "wiki"
    assert cfg["source"]["options"]["kafka.bootstrap.servers"] \
        == "broker:9092"
    assert cfg["source"]["options"]["startingOffsets"] == "latest"
    assert cfg["dimensions"] == ["channel", "page"]
    assert cfg["query_granularity"] == "none"


def test_kinesis_source_jar_gated(spark):
    # without the connector jar the source fails LOUDLY with guidance
    import pytest as _pytest

    from apache_druid_spark.streaming import supervisor_ingest
    from pyspark.sql import types as T

    spec = {"type": "kinesis",
            "spec": {"ioConfig": {"stream": "s"},
                     "dataSchema": {
                         "timestampSpec": {"column": "ts"},
                         "granularitySpec": {
                             "queryGranularity": "none"}}}}
    schema = T.StructType([T.StructField("ts", T.StringType())])
    with _pytest.raises(NotImplementedError, match="connector jar"):
        supervisor_ingest(spark, spec, value_schema=schema)
