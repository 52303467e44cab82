"""Supervisor-spec ingestion — the Kafka/Kinesis supervisor JSON as
the streaming entry point.

Reference: indexing-service/.../seekablestream/supervisor/
SeekableStreamSupervisorSpec.java with the two concrete specs,
KafkaSupervisorSpec (extensions-core/kafka-indexing-service/) and
KinesisSupervisorSpec (extensions-core/kinesis-indexing-service/
KinesisSupervisorIOConfig.java: stream, endpoint,
useEarliestSequenceNumber, lateMessageRejectionPeriod). A user's
supervisor document — the exact JSON they POST to
/druid/indexer/v1/supervisor — drives ingestion here unchanged:
ioConfig picks the source, dataSchema's timestampSpec/dimensionsSpec/
metricsSpec/granularitySpec configure the rollup, and
lateMessageRejectionPeriod becomes the watermark.

Spark mapping: ONE structured-streaming query replaces the
supervisor + task topology. Kafka uses Spark's built-in source; the
Kinesis source is JAR-GATED (no first-party Spark connector — the
qubole/awslabs ``kinesis`` format is tried, with a clear error
otherwise), exactly like the reference gates Kinesis behind its
extension. Both specs accept a ``source_df`` injection so rigs
without brokers test the full spec-to-rollup path over a file-stream
double — the same treatment the Kafka path has used since round 3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_druid_spark.model.datasource import TIME_COLUMN
from apache_druid_spark.streaming.rollup import stream_rollup


def _iso_period_to_interval(period: str) -> str | None:
    """PT1H / P1D -> a Spark interval string (watermark horizon).

    ISO-8601 designators are position-sensitive: 'M' is MONTHS in the
    date part (P1M) and MINUTES only after 'T' (PT1M); Y/W/D belong to
    the date part only, H/S to the time part only. Anything else
    (e.g. 'PT1D') is invalid and falls back to None so the caller's
    default applies."""
    if not period:
        return None
    p = str(period).upper()
    import re
    m = re.fullmatch(r"P(\d+)([YMWD])", p)
    if m:
        date_units = {"Y": "years", "M": "months", "W": "weeks",
                      "D": "days"}
        return f"{m.group(1)} {date_units[m.group(2)]}"
    m = re.fullmatch(r"PT(\d+)([HMS])", p)
    if m:
        time_units = {"H": "hours", "M": "minutes", "S": "seconds"}
        return f"{m.group(1)} {time_units[m.group(2)]}"
    return None


def parse_supervisor_spec(spec: dict) -> dict:
    """Normalize a supervisor document into source + rollup config.

    Accepts both the top-level shape ({"type": ..., "spec": {...}})
    and a bare inner spec ({"ioConfig": ..., "dataSchema": ...})."""
    kind = spec.get("type")
    inner = spec.get("spec", spec)
    io = inner.get("ioConfig") or {}
    schema = inner.get("dataSchema") or {}
    kind = kind or ("kinesis" if "stream" in io else "kafka")

    ts_spec = schema.get("timestampSpec") or {}
    dims_spec = schema.get("dimensionsSpec") or {}
    dims = [d if isinstance(d, str) else d.get("name")
            for d in dims_spec.get("dimensions", []) or []]
    gran = (schema.get("granularitySpec") or {})
    out = {
        "kind": kind,
        "dataSource": schema.get("dataSource"),
        "time_column": ts_spec.get("column", "timestamp"),
        "time_format": ts_spec.get("format", "auto"),
        "dimensions": dims,
        "metrics": schema.get("metricsSpec") or [],
        "query_granularity": gran.get("queryGranularity") or "none",
        "segment_granularity": gran.get("segmentGranularity") or "day",
        "watermark": _iso_period_to_interval(
            io.get("lateMessageRejectionPeriod")) or "1 hour",
    }
    if kind == "kafka":
        props = io.get("consumerProperties") or {}
        out["source"] = {
            "format": "kafka",
            "options": {
                "kafka.bootstrap.servers": props.get(
                    "bootstrap.servers", ""),
                "subscribe": io.get("topic", ""),
                "startingOffsets": ("earliest"
                                    if io.get("useEarliestOffset", True)
                                    else "latest"),
            },
        }
    elif kind == "kinesis":
        out["source"] = {
            # the community spark-sql-kinesis connector's format name;
            # jar-gated like the reference's kinesis extension
            "format": "kinesis",
            "options": {
                "streamName": io.get("stream", ""),
                "endpointUrl": io.get(
                    "endpoint", "kinesis.us-east-1.amazonaws.com"),
                "startingposition": (
                    "TRIM_HORIZON"
                    if io.get("useEarliestSequenceNumber", True)
                    else "LATEST"),
            },
        }
    else:
        raise ValueError(f"unknown supervisor type: {kind!r}")
    return out


def _source_stream(spark: SparkSession, cfg: dict, value_schema
                   ) -> DataFrame:
    src = cfg["source"]
    reader = spark.readStream.format(src["format"])
    for k, v in src["options"].items():
        reader = reader.option(k, v)
    try:
        raw = reader.load()
    except Exception as e:  # noqa: BLE001 — connector availability
        raise NotImplementedError(
            f"the {src['format']!r} streaming source needs its "
            "connector jar on the classpath (the reference gates "
            f"{cfg['kind']} behind the "
            f"{cfg['kind']}-indexing-service extension the same "
            f"way); pass source_df= to ingest from another source: "
            f"{e}") from e
    # both kafka and kinesis deliver the payload in a binary
    # ``data``/``value`` column; JSON-decode against the schema
    payload = "value" if "value" in raw.columns else "data"
    return raw.select(
        F.from_json(F.col(payload).cast("string"),
                    value_schema).alias("r")).select("r.*")


def supervisor_ingest(spark: SparkSession, spec: dict,
                      value_schema=None,
                      source_df: DataFrame | None = None) -> DataFrame:
    """A supervisor document -> the rolled-up streaming DataFrame.

    ``source_df`` substitutes the broker/shard source (rigs without
    Kafka/Kinesis test the spec-to-rollup path over a file stream);
    otherwise ``value_schema`` decodes the stream's JSON payload."""
    cfg = parse_supervisor_spec(spec)
    if source_df is not None:
        df = source_df
    else:
        if value_schema is None:
            raise ValueError("value_schema required to decode the "
                             "stream payload")
        df = _source_stream(spark, cfg, value_schema)
    tcol = cfg["time_column"]
    if TIME_COLUMN not in df.columns:
        c = F.col(tcol)
        fmt = cfg["time_format"]
        if fmt in ("millis",):
            c = F.timestamp_millis(c.cast("long"))
        elif fmt in ("posix",):
            c = F.col(tcol).cast("long").cast("timestamp")
        elif fmt == "auto":
            # Druid's 'auto' accepts ISO strings AND epoch-millis
            # numbers (TimestampSpec's auto detection). Spark's
            # numeric->timestamp cast reads SECONDS, so numeric
            # source columns must go through timestamp_millis.
            import pyspark.sql.types as T
            src_type = df.schema[tcol].dataType
            if isinstance(src_type, (T.LongType, T.IntegerType,
                                     T.DoubleType, T.FloatType,
                                     T.ShortType, T.DecimalType)):
                c = F.timestamp_millis(c.cast("long"))
            else:
                c = c.cast("timestamp")
        elif fmt == "iso":
            c = c.cast("timestamp")
        else:  # joda/java pattern
            c = F.to_timestamp(c, fmt)
        df = df.withColumn(TIME_COLUMN, c)
    gran = cfg["query_granularity"]
    if str(gran).lower() in ("none", "all"):
        # no rollup bucket: pass rows through (ingestion without
        # rollup), watermarked for downstream stateful ops
        return df.withWatermark(TIME_COLUMN, cfg["watermark"])
    return stream_rollup(df, cfg["dimensions"], cfg["metrics"],
                         query_granularity=gran,
                         watermark=cfg["watermark"])
