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
