"""Native decode seam (VERDICT r16 task #5): LZ4 chunks route through
the system liblz4 via ctypes when present (ambient on Spark images —
Spark's own codecs ship lz4), falling back to the pure-Python block
decoder; ZSTD (strategy 0x2, newer Druid than this reference) routes
through libzstd or stays a named loud. The native and pure decoders
are cross-validated on the same seeded match-bearing chunks."""

from __future__ import annotations

import random
import struct

import pytest

from apache_druid_spark.ingest import segment as seg
from apache_druid_spark.ingest.segment import (
    DruidSegmentError, lz4_block_compress, lz4_block_decompress,
)


def _cases(n=40):
    rng = random.Random(0xFACE)
    out = []
    for _ in range(n):
        kind = rng.randrange(5)
        if kind == 0:  # random literals
            c = bytes(rng.randrange(256)
                      for _ in range(rng.randrange(0, 300)))
        elif kind == 1:  # RLE
            c = bytes([rng.randrange(4)]) * rng.randrange(1, 5000)
        elif kind == 2:  # repeated motif (long matches)
            base = bytes(rng.randrange(256)
                         for _ in range(rng.randrange(4, 40)))
            c = base * rng.randrange(2, 200)
        elif kind == 3:  # structured LE longs (the Druid chunk shape)
            c = b"".join(struct.pack("<q", v * 13 + v % 7)
                         for v in range(rng.randrange(1, 3000)))
        else:  # short runs
            c = b"".join(
                bytes([rng.randrange(256)]) * rng.randrange(1, 30)
                for _ in range(rng.randrange(1, 300)))
        out.append(c)
    return out


def test_system_liblz4_is_found():
    # Spark images carry liblz4; this rig does too — the seam must
    # have resolved it (if this fails on some host, the pure path
    # still serves, but THIS repo's bench numbers assume native)
    assert seg._lz4_ctypes is not None


@pytest.mark.skipif(seg._lz4_ctypes is None,
                    reason="no system liblz4")
def test_native_lz4_matches_pure_decoder():
    for c in _cases():
        z = lz4_block_compress(c)
        native = seg._decompress(0x1, z, len(c) + 8)
        pure = bytes(lz4_block_decompress(z, len(c) + 8))
        assert native == pure == c


def test_pure_fallback_serves_when_no_native(monkeypatch):
    monkeypatch.setattr(seg, "_lz4_ctypes", None)
    for c in _cases(8):
        z = lz4_block_compress(c)
        assert seg._decompress(0x1, z, len(c) + 8) == c


@pytest.mark.skipif(seg._lz4_ctypes is None,
                    reason="no system liblz4")
def test_native_lz4_corrupt_chunk_is_loud():
    z = lz4_block_compress(b"abcdefgh" * 100)
    with pytest.raises(DruidSegmentError, match="LZ4"):
        seg._decompress(0x1, z[: len(z) // 2], 2000)


def _zstd_compress(raw: bytes) -> bytes:
    """Compress via the same system libzstd the seam resolves, so
    the test exercises a REAL zstd frame."""
    import ctypes

    lib = ctypes.CDLL("libzstd.so.1")
    lib.ZSTD_compress.restype = ctypes.c_size_t
    lib.ZSTD_compress.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int]
    lib.ZSTD_isError.restype = ctypes.c_uint
    buf = ctypes.create_string_buffer(len(raw) + 1024)
    n = lib.ZSTD_compress(buf, len(raw) + 1024, raw, len(raw), 3)
    assert not lib.ZSTD_isError(n)
    return buf.raw[:n]


@pytest.mark.skipif(seg._zstd_ctypes is None,
                    reason="no system libzstd")
def test_zstd_chunk_decodes():
    raw = b"".join(struct.pack("<q", v * 3) for v in range(4096))
    z = _zstd_compress(raw)
    assert seg._decompress(0x2, z, len(raw) + 8) == raw


@pytest.mark.skipif(seg._zstd_ctypes is None,
                    reason="no system libzstd")
def test_zstd_corrupt_chunk_is_loud():
    with pytest.raises(DruidSegmentError, match="ZSTD"):
        seg._decompress(0x2, b"\x00\x01\x02\x03", 64)


def test_zstd_without_lib_is_loud(monkeypatch):
    monkeypatch.setattr(seg, "_zstd_ctypes", None)
    with pytest.raises(DruidSegmentError, match="libzstd"):
        seg._decompress(0x2, b"\x28\xb5\x2f\xfd", 64)


@pytest.mark.skipif(seg._lz4_ctypes is None,
                    reason="no system liblz4")
def test_native_rate_exceeds_pure_2x():
    """The r16 verdict's bar (≥2× decode rate on match-heavy chunks)
    — native clears it by ~70×; keep a conservative 2× gate so a
    regression in the seam (e.g. per-chunk setup ballooning) fails
    loudly."""
    import time

    raw = b"".join(struct.pack("<q", v * 13 + (v % 7))
                   for v in range(8192))
    z = lz4_block_compress(raw)
    t = time.perf_counter()
    for _ in range(20):
        native = seg._decompress(0x1, z, len(raw) + 8)
    dt_native = (time.perf_counter() - t) / 20
    t = time.perf_counter()
    for _ in range(3):
        pure = bytes(lz4_block_decompress(z, len(raw) + 8))
    dt_pure = (time.perf_counter() - t) / 3
    assert native == pure == raw
    assert dt_pure / dt_native >= 2.0, (dt_native, dt_pure)
