"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery here is REAL and tested: schemas, Arrow-batched
mapInPandas operators, partition sizing. The codec step itself is a
STUB — the container has no image/audio libraries — marked with
``_decode_stub``; swap in PIL/torchaudio/ffmpeg per modality in a real
deployment without touching the plan shape.

Design for 100 TB: binaries stay opaque through the engine; decode
happens once, inside mapInPandas (Arrow batches, no per-row pickling),
emitting fixed-size feature columns so everything downstream is
columnar again. Partition sizing: keep batches << executor memory via
spark.sql.files.maxPartitionBytes / maxRecordsPerBatch, not per-row
Python calls.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:long>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, "
    "byte_mean double, byte_entropy_q double, feature array<float>"
)


def attach_fake_payload(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Deterministic stand-in media table: payload = utf-8 bytes of the
    text, metadata derived from its length. Gives the decode pipeline a
    real binary column with reproducible content."""
    n = F.length(F.col(text_col))
    return df.select(
        F.col(id_col).alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, F.lit("image"))
         .when(F.col(id_col) % 3 == 1, F.lit("audio"))
         .otherwise(F.lit("video")).alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            (n % 1920).cast("int").alias("width"),
            (n % 1080).cast("int").alias("height"),
            (n * 10).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """STUB: real deployments decode the media here (PIL / torchaudio /
    pyav) and emit an embedding or pixel features. This deterministic
    fake hashes byte positions so tests exercise the full Arrow path.

    Raises NotImplementedError for kinds a real codec would reject."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no codec for kind={kind!r}")
    if payload is None:
        return [0.0] * 8
    return [float(payload[i % len(payload)]) / 255.0 if payload else 0.0
            for i in range(8)]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    mapInPandas: one Python worker per partition, pandas DataFrames in
    Arrow batches — the per-row cost is a numpy-level loop, not a
    pickled UDF call. Output is fixed-width columnar features."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: 0 if b is None else len(b))
            byte_mean = payloads.map(
                lambda b: float(sum(b)) / len(b) if b else 0.0)
            # cheap entropy proxy: distinct-byte ratio
            entropy_q = payloads.map(
                lambda b: len(set(b)) / 256.0 if b else 0.0)
            feats = [
                _decode_stub(p, k)
                for p, k in zip(payloads, pdf["kind"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": n_bytes,
                "byte_mean": byte_mean,
                "byte_entropy_q": entropy_q,
                "feature": feats,
            })

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int = 224,
                  height: int = 224) -> DataFrame:
    """Image-resize plumbing: filter to image payloads, emit the
    resized payload + updated metadata through the same Arrow-batched
    mapInPandas shape as extract_features. The pixel resample itself is
    the codec STUB (no PIL in this rig): the fake 'resized' payload is
    the input truncated/cycled to width*height bytes, and resized_hash
    is deterministic arithmetic over (n_bytes, w, h) so the plumbing is
    oracle-checkable end to end. Swap ``_resize_stub`` for a real
    PIL/cv2 resample without touching the plan."""
    w, h = int(width), int(height)

    def _resize_stub(p: bytes | None) -> bytes:
        if not p:
            return b"\x00" * (w * h)
        reps = (w * h + len(p) - 1) // len(p)
        return (bytes(p) * reps)[:w * h]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [_resize_stub(p) for p in pdf["payload"]]
            n_in = [0 if p is None else len(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": w, "height": h,
                "resized_n_bytes": [len(r) for r in resized],
                "resized_hash": [(n * 131 + w * h) % 2 ** 31
                                 for n in n_in],
                "payload": resized,
            })

    return media.filter(F.col("kind") == "image").mapInPandas(
        op, schema="media_id long, width int, height int, "
                   "resized_n_bytes long, resized_hash long, "
                   "payload binary")


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per
    sampled timestamp. The frame decode is the same stub; the plan shape
    (explode of a timestamp sequence, then batched decode) is the real
    one."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms"),
                       F.lit(int(every_ms)))
        ).alias("frame_ms"),
        "payload",
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "frame_ms": pdf["frame_ms"],
                # STUB: real impl seeks+decodes the frame at frame_ms
                "frame_hash": [
                    0 if p is None else (len(p) * 31 + t) % 2**31
                    for p, t in zip(pdf["payload"], pdf["frame_ms"])
                ],
            })

    return frames.mapInPandas(
        op, schema="media_id long, frame_ms long, frame_hash long")
