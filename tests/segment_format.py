"""Shared writer-side helpers for synthetic Druid v9 container bytes
used across the segment test files (single source for the
GenericIndexed v1 layout — r17 review #7)."""

from __future__ import annotations

import struct


def generic_indexed_v1(elements, sorted_flag: bool = False) -> bytes:
    """GenericIndexed v1 blob: version, allowReverseLookup (1 for a
    sorted writer -- range pushdown needs it on dictionaries),
    totalSize, numElements, end-offset header, 4-byte-size-prefixed
    values (size -1 marks a null element)."""
    ends, acc = [], 0
    payload = []
    for e in elements:
        if e is None:
            acc += 4
            payload.append(struct.pack(">i", -1))
        else:
            acc += 4 + len(e)
            payload.append(struct.pack(">i", len(e)) + e)
        ends.append(acc)
    header = b"".join(struct.pack(">i", e) for e in ends)
    values = b"".join(payload)
    total = 4 + len(header) + len(values)
    flag = b"\x01" if sorted_flag else b"\x00"
    return (b"\x01" + flag + struct.pack(">ii", total, len(elements))
            + header + values)


def roaring_array(vals) -> bytes:
    """Portable roaring serialization, array containers only
    (cards <= 4096 per 65536-bucket)."""
    vals = sorted(vals)
    buckets: dict[int, list[int]] = {}
    for v in vals:
        buckets.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(buckets)
    out = struct.pack("<ii", 12346, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(buckets[k]) - 1)
    out += b"\x00" * (4 * len(keys))  # offset header (reader skips)
    for k in keys:
        out += b"".join(struct.pack("<H", v) for v in buckets[k])
    return out
