"""Ingestion: batch and streaming writers with Druid rollup semantics."""

from apache_druid_spark.ingest.batch import (
    apply_flatten_spec, apply_timestamp_spec, apply_transform_spec,
    finalize_metrics, ingest, reaggregate, rollup, write_segments,
)

__all__ = [
    "apply_flatten_spec", "apply_timestamp_spec", "apply_transform_spec",
    "finalize_metrics", "ingest", "reaggregate", "rollup",
    "write_segments",
]
