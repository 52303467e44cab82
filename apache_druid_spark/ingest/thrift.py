"""Thrift inputFormat (reference: extensions-contrib/thrift-extensions/
src/main/java/org/apache/druid/data/input/thrift/ThriftInputRowParser.java).

The reference deserializes one Thrift struct per record and hands the
flattened fields to the row parser. Here the decode is a pure function
over TBinaryProtocol bytes, run through Arrow-batched ``mapInPandas``
(the multimodal-codec pattern — Python touches opaque payload bytes
only, never query-path rows). The field *schema* is declarative: the
caller names (field_id, name, type) the same way the reference's
parseSpec names Thrift fields.

Supported types: bool, byte, i16, i32, i64, double, string, binary,
and list<primitive>. Nested structs decode as their raw field maps are
not exposed in v1 — flatten upstream, as the reference's flattenSpec
path does for JSON.

Scale note: one shuffle-free pass, ~batch-size Python invocations per
partition (Arrow), decode cost linear in payload bytes. A JVM-side
codegen decoder (the spark-protobuf approach) is the optimization path
if Thrift ever sits in a hot loop; ingest-once semantics rarely need it.
"""

from __future__ import annotations

import struct as _struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# TBinaryProtocol wire type ids (public Thrift spec)
_STOP, _BOOL, _BYTE, _DOUBLE, _I16, _I32, _I64, _STR, _STRUCT, _LIST = (
    0, 2, 3, 4, 6, 8, 10, 11, 12, 15)

_SPARK_TYPES = {
    "bool": T.BooleanType(), "byte": T.ByteType(), "i16": T.ShortType(),
    "i32": T.IntegerType(), "i64": T.LongType(),
    "double": T.DoubleType(), "string": T.StringType(),
    "binary": T.BinaryType(),
}


def _read_value(buf: bytes, off: int, ttype: int):
    if ttype == _BOOL:
        return buf[off] != 0, off + 1
    if ttype == _BYTE:
        return _struct.unpack_from(">b", buf, off)[0], off + 1
    if ttype == _DOUBLE:
        return _struct.unpack_from(">d", buf, off)[0], off + 8
    if ttype == _I16:
        return _struct.unpack_from(">h", buf, off)[0], off + 2
    if ttype == _I32:
        return _struct.unpack_from(">i", buf, off)[0], off + 4
    if ttype == _I64:
        return _struct.unpack_from(">q", buf, off)[0], off + 8
    if ttype == _STR:
        n = _struct.unpack_from(">i", buf, off)[0]
        off += 4
        # a crafted negative length would move `off` BACKWARDS and can
        # cycle the field loop forever; bad records must raise into the
        # caller's null-row path, never hang the executor task
        if n < 0 or off + n > len(buf):
            raise ValueError(f"thrift string length {n} out of bounds")
        return bytes(buf[off:off + n]), off + n
    if ttype == _STRUCT:
        return _read_struct(buf, off)
    if ttype == _LIST:
        etype = buf[off]
        n = _struct.unpack_from(">i", buf, off + 1)[0]
        off += 5
        if n < 0 or off + n > len(buf):  # every element is >= 1 byte
            raise ValueError(f"thrift list length {n} out of bounds")
        out = []
        for _ in range(n):
            v, off = _read_value(buf, off, etype)
            out.append(v)
        return out, off
    raise ValueError(f"unsupported thrift wire type {ttype}")


def _read_struct(buf: bytes, off: int = 0):
    """Decode one struct: {field_id: raw value}. Unknown fields are
    kept (the spec projects later); unsupported types raise."""
    fields: dict[int, object] = {}
    while True:
        ttype = buf[off]
        off += 1
        if ttype == _STOP:
            return fields, off
        fid = _struct.unpack_from(">h", buf, off)[0]
        off += 2
        val, off = _read_value(buf, off, ttype)
        fields[fid] = val
    return fields, off


def thrift_struct_type(fields: list[tuple[int, str, str]]) -> T.StructType:
    """Spark schema for a thrift field spec [(field_id, name, type)];
    ``list<x>`` spells an array of primitive ``x``."""
    out = []
    for _fid, name, ftype in fields:
        if ftype.startswith("list<") and ftype.endswith(">"):
            elem = _SPARK_TYPES[ftype[5:-1]]
            out.append(T.StructField(name, T.ArrayType(elem)))
        else:
            out.append(T.StructField(name, _SPARK_TYPES[ftype]))
    return T.StructType(out)


def _convert(val, ftype: str):
    if val is None:
        return None
    if ftype == "string":
        # wire/declared mismatch (non-bytes) falls through for _coerce
        # to null the single field rather than raising out the row
        if isinstance(val, (bytes, bytearray)):
            return val.decode("utf-8", errors="replace")
        return val
    if ftype.startswith("list<"):
        if not isinstance(val, list):
            return val
        inner = ftype[5:-1]
        return [_convert(v, inner) for v in val]
    return val


_INT_RANGES = {
    "byte": (-2 ** 7, 2 ** 7 - 1), "i16": (-2 ** 15, 2 ** 15 - 1),
    "i32": (-2 ** 31, 2 ** 31 - 1), "i64": (-2 ** 63, 2 ** 63 - 1),
}


def _coerce(val, ftype: str):
    """Null out wire/declared type mismatches that survive _convert
    (e.g. a field declared i32 but wire-encoded i64 out of int32
    range). Without this the error surfaces at pandas->Arrow
    serialization OUTSIDE the per-row try/except and kills the whole
    batch instead of nulling the one bad value."""
    if val is None:
        return None
    if ftype in _INT_RANGES:
        if isinstance(val, bool) or not isinstance(val, int):
            return None
        lo, hi = _INT_RANGES[ftype]
        return val if lo <= val <= hi else None
    if ftype == "bool":
        return val if isinstance(val, bool) else None
    if ftype == "double":
        if isinstance(val, bool) or not isinstance(val, (int, float)):
            return None
        return float(val)
    if ftype == "string":
        return val if isinstance(val, str) else None
    if ftype == "binary":
        return bytes(val) if isinstance(val, (bytes, bytearray)) else None
    if ftype.startswith("list<"):
        if not isinstance(val, list):
            return None
        inner = ftype[5:-1]
        return [_coerce(v, inner) for v in val]
    return val


def decode_thrift(df: DataFrame, fields: list[tuple[int, str, str]],
                  bin_col: str = "content",
                  keep_cols: list[str] | None = None) -> DataFrame:
    """Decode a TBinaryProtocol struct column into typed columns.

    ``fields`` is the declarative projection [(field_id, name, type)];
    bytes that fail to parse yield a null row (logged per batch the
    way the reference's parser skips unparseable rows)."""
    import pandas as pd

    keep = keep_cols or []
    schema = T.StructType(
        [df.schema[c] for c in keep] + list(thrift_struct_type(fields)))
    names = [n for _, n, _ in fields]

    def _batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                base = [row[c] for c in keep]
                try:
                    raw, _ = _read_struct(bytes(row[bin_col]))
                    rows.append(base + [
                        _coerce(_convert(raw.get(fid), ftype), ftype)
                        for fid, _n, ftype in fields])
                except Exception:
                    rows.append(base + [None] * len(fields))
            yield pd.DataFrame(rows, columns=keep + names)

    return df.mapInPandas(_batches, schema=schema)


def read_thrift(spark, paths, fields: list[tuple[int, str, str]],
                recursive: bool = True) -> DataFrame:
    """One serialized struct per file via the binaryFile source."""
    reader = spark.read.format("binaryFile")
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    raw = reader.load(paths)
    return decode_thrift(raw, fields, bin_col="content")


def read_thrift_sequence(spark, paths,
                         fields: list[tuple[int, str, str]]) -> DataFrame:
    """Thrift structs packed in Hadoop SequenceFiles — the container
    the reference's thrift extension actually ships
    (extensions-contrib/thrift-extensions pairs ThriftInputRowParser
    with SequenceFile/LZO inputs): one TBinaryProtocol struct per
    record VALUE, keys ignored.

    The sequenceFile read deserializes BytesWritable records; the RDD
    hop exists only to reach Hadoop's container reader and converts to
    a binary-column DataFrame immediately (per-partition, no driver
    collect) — decode then follows the standard Arrow-batched path.
    LZO-compressed inputs additionally need the hadoop-lzo codec jar
    on the cluster (not bundled here); absence surfaces as Hadoop's
    own 'codec not found' error."""
    from pyspark.sql import types as T

    rdd = spark.sparkContext.sequenceFile(
        paths if isinstance(paths, str) else ",".join(paths))
    rows = rdd.map(lambda kv: (bytes(kv[1]),))
    raw = spark.createDataFrame(
        rows, T.StructType([T.StructField("content", T.BinaryType())]))
    return decode_thrift(raw, fields, bin_col="content")
