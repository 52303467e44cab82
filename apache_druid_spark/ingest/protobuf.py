"""Protobuf inputFormat — pure wire-format decoder (reference:
extensions-core/protobuf-extensions/src/main/java/org/apache/druid/
data/input/protobuf/ProtobufInputFormat.java + ProtobufReader.java).

The reference decodes one protobuf message per record against a
descriptor and flattens top-level fields into the row. Two paths here:

- ``ingest/batch.py:decode_protobuf`` wires spark-protobuf's
  ``from_protobuf`` (JVM-side, vectorized) for descriptor files — the
  preferred path when the spark-protobuf jar is on the cluster.
- This module is the jar-free fallback: a decoder for the public
  protobuf wire format (varint / fixed64 / length-delimited / fixed32
  — developers.google.com/protocol-buffers/docs/encoding), driven by
  the same declarative (field_number, name, type) spec shape the
  thrift inputFormat uses. Runs through Arrow-batched ``mapInPandas``;
  Python touches opaque payload bytes only, never query-path rows.

Supported types: bool, int32, int64, uint32, uint64, sint32, sint64,
float, double, fixed32, fixed64, sfixed32, sfixed64, string, bytes,
and repeated<numeric/string> (both packed and unpacked encodings).
Nested messages are not flattened in v1 — declare them as ``bytes``
and decode downstream, as the reference's flattenSpec path does.

Robustness contract (same as thrift.py): malformed bytes — truncated
varints, out-of-bounds lengths — raise inside the per-row try/except
and yield a null row; wire/declared type mismatches null the single
field. No input can hang or kill a batch.

Scale note: one shuffle-free pass, Arrow batches, decode cost linear
in payload bytes. The spark-protobuf jar path is the optimization if
protobuf ever sits in a hot loop; ingest-once semantics rarely need it.
"""

from __future__ import annotations

import struct as _struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_VARINT, _FIX64, _LEN, _SGROUP, _EGROUP, _FIX32 = 0, 1, 2, 3, 4, 5

_SPARK_TYPES = {
    "bool": T.BooleanType(),
    "int32": T.IntegerType(), "sint32": T.IntegerType(),
    "sfixed32": T.IntegerType(),
    "int64": T.LongType(), "sint64": T.LongType(),
    "sfixed64": T.LongType(), "uint32": T.LongType(),
    "uint64": T.LongType(), "fixed32": T.LongType(),
    "fixed64": T.LongType(),
    "float": T.FloatType(), "double": T.DoubleType(),
    "string": T.StringType(), "bytes": T.BinaryType(),
}


def _read_varint(buf: bytes, off: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if off >= len(buf):
            raise ValueError("truncated varint")
        b = buf[off]
        off += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, off
        shift += 7
        if shift > 63:
            raise ValueError("varint exceeds 10 bytes")


def parse_message(buf: bytes) -> dict[int, list[tuple[int, object]]]:
    """One pass over the wire format: {field_number: [(wire_type, raw)]}.
    Raw is the undecoded payload (int for varint/fixed, bytes for
    length-delimited); interpretation happens against the declared
    type. Unknown fields are kept, groups (deprecated) are rejected."""
    fields: dict[int, list[tuple[int, object]]] = {}
    off = 0
    n = len(buf)
    while off < n:
        tag, off = _read_varint(buf, off)
        fnum, wt = tag >> 3, tag & 7
        if fnum == 0:
            raise ValueError("field number 0 is invalid")
        if wt == _VARINT:
            val, off = _read_varint(buf, off)
        elif wt == _FIX64:
            if off + 8 > n:
                raise ValueError("truncated fixed64")
            val = buf[off:off + 8]
            off += 8
        elif wt == _LEN:
            ln, off = _read_varint(buf, off)
            if ln < 0 or off + ln > n:
                raise ValueError(f"length {ln} out of bounds")
            val = bytes(buf[off:off + ln])
            off += ln
        elif wt == _FIX32:
            if off + 4 > n:
                raise ValueError("truncated fixed32")
            val = buf[off:off + 4]
            off += 4
        else:  # groups (3/4) are deprecated pre-proto2 wire relics
            raise ValueError(f"unsupported wire type {wt}")
        fields.setdefault(fnum, []).append((wt, val))
    return fields


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


_INT_RANGES = {
    "int32": (-2 ** 31, 2 ** 31 - 1), "sint32": (-2 ** 31, 2 ** 31 - 1),
    "sfixed32": (-2 ** 31, 2 ** 31 - 1),
    "int64": (-2 ** 63, 2 ** 63 - 1), "sint64": (-2 ** 63, 2 ** 63 - 1),
    "sfixed64": (-2 ** 63, 2 ** 63 - 1),
    "uint32": (0, 2 ** 32 - 1), "fixed32": (0, 2 ** 32 - 1),
    # uint64/fixed64 beyond long range null out via the range check —
    # the same declared-type contract as the thrift decoder
    "uint64": (0, 2 ** 63 - 1), "fixed64": (0, 2 ** 63 - 1),
}


def _scalar(wt: int, raw, ftype: str):
    """Interpret one raw wire value against a declared scalar type;
    None for any wire/declared mismatch."""
    if ftype in ("int32", "int64", "uint32", "uint64", "bool"):
        if wt != _VARINT:
            return None
        v = raw if ftype.startswith("uint") else _signed64(raw)
        if ftype == "bool":
            return v != 0
        lo, hi = _INT_RANGES[ftype]
        return v if lo <= v <= hi else None
    if ftype in ("sint32", "sint64"):
        if wt != _VARINT:
            return None
        v = _zigzag(raw)
        lo, hi = _INT_RANGES[ftype]
        return v if lo <= v <= hi else None
    if ftype == "double":
        return _struct.unpack("<d", raw)[0] if wt == _FIX64 else None
    if ftype == "float":
        return _struct.unpack("<f", raw)[0] if wt == _FIX32 else None
    if ftype == "fixed64":
        if wt != _FIX64:
            return None
        v = _struct.unpack("<Q", raw)[0]
        return v if v <= 2 ** 63 - 1 else None
    if ftype == "sfixed64":
        return _struct.unpack("<q", raw)[0] if wt == _FIX64 else None
    if ftype == "fixed32":
        return _struct.unpack("<I", raw)[0] if wt == _FIX32 else None
    if ftype == "sfixed32":
        return _struct.unpack("<i", raw)[0] if wt == _FIX32 else None
    if ftype == "string":
        return (raw.decode("utf-8", errors="replace")
                if wt == _LEN else None)
    if ftype == "bytes":
        return raw if wt == _LEN else None
    raise ValueError(f"unsupported protobuf type {ftype!r}")


_PACKED_FIXED = {"double": ("<d", 8), "fixed64": ("<Q", 8),
                 "sfixed64": ("<q", 8), "float": ("<f", 4),
                 "fixed32": ("<I", 4), "sfixed32": ("<i", 4)}


def _unpack_packed(payload: bytes, inner: str) -> list:
    """Packed repeated encoding: the LEN payload is a concatenation of
    raw scalar encodings."""
    out = []
    if inner in _PACKED_FIXED:
        fmt, width = _PACKED_FIXED[inner]
        if len(payload) % width:
            raise ValueError("packed payload not a multiple of width")
        for i in range(0, len(payload), width):
            out.append(_scalar(_FIX64 if width == 8 else _FIX32,
                               payload[i:i + width], inner))
        return out
    # varint family
    off = 0
    while off < len(payload):
        v, off = _read_varint(payload, off)
        out.append(_scalar(_VARINT, v, inner))
    return out


def _field_value(entries: list[tuple[int, object]] | None, ftype: str):
    """Decode the collected wire entries for one field number against
    its declared type. Scalars take the LAST occurrence (proto3
    last-one-wins); repeated<> concatenates, expanding packed runs."""
    if not entries:
        return None
    if ftype.startswith("repeated<") and ftype.endswith(">"):
        inner = ftype[9:-1]
        out = []
        packable = inner not in ("string", "bytes")
        for wt, raw in entries:
            if wt == _LEN and packable:
                out.extend(_unpack_packed(raw, inner))
            else:
                out.append(_scalar(wt, raw, inner))
        return out
    wt, raw = entries[-1]
    return _scalar(wt, raw, ftype)


def protobuf_struct_type(fields: list[tuple[int, str, str]]) -> T.StructType:
    """Spark schema for a field spec [(field_number, name, type)];
    ``repeated<x>`` spells an array of scalar ``x``."""
    out = []
    for _fnum, name, ftype in fields:
        if ftype.startswith("repeated<") and ftype.endswith(">"):
            out.append(T.StructField(name,
                                     T.ArrayType(_SPARK_TYPES[ftype[9:-1]])))
        else:
            out.append(T.StructField(name, _SPARK_TYPES[ftype]))
    return T.StructType(out)


def decode_protobuf_wire(df: DataFrame,
                         fields: list[tuple[int, str, str]],
                         bin_col: str = "content",
                         keep_cols: list[str] | None = None) -> DataFrame:
    """Decode a protobuf-wire binary column into typed columns via
    Arrow-batched mapInPandas. ``fields`` is the declarative
    projection [(field_number, name, type)]; unparseable records
    yield a null row, mismatched fields yield a null field."""
    import pandas as pd

    keep = keep_cols or []
    schema = T.StructType(
        [df.schema[c] for c in keep] + list(protobuf_struct_type(fields)))
    names = [n for _, n, _ in fields]

    def _batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                base = [row[c] for c in keep]
                try:
                    raw = parse_message(bytes(row[bin_col]))
                    rows.append(base + [
                        _field_value(raw.get(fnum), ftype)
                        for fnum, _n, ftype in fields])
                except Exception:
                    rows.append(base + [None] * len(fields))
            yield pd.DataFrame(rows, columns=keep + names)

    return df.mapInPandas(_batches, schema=schema)


def read_protobuf(spark, paths, fields: list[tuple[int, str, str]],
                  recursive: bool = True) -> DataFrame:
    """One serialized message per file via the binaryFile source (the
    same container shape as read_thrift)."""
    reader = spark.read.format("binaryFile")
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    raw = reader.load(paths)
    return decode_protobuf_wire(raw, fields, bin_col="content")
