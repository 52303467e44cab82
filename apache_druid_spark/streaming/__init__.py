"""Structured Streaming ingestion — the reference's supervisor/task
pipeline (SURVEY §2.15) collapsed into declarative streaming queries."""

from apache_druid_spark.streaming.rollup import (
    file_stream, kafka_stream, realtime_union, run_to_table,
    stream_dedup, stream_rollup,
)
from apache_druid_spark.streaming.stateful import (
    final_state, run_updates_to_memory, running_rollup,
)
from apache_druid_spark.streaming.supervisor import (
    parse_supervisor_spec, supervisor_ingest,
)

__all__ = ["file_stream", "kafka_stream", "realtime_union",
           "run_to_table", "stream_dedup", "stream_rollup",
           "running_rollup", "run_updates_to_memory", "final_state",
           "parse_supervisor_spec", "supervisor_ingest"]
