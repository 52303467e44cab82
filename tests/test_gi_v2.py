"""GenericIndexed VERSION 2 (multi-smoosh) reader — the >2 GB-column
layout (GenericIndexed.createGenericIndexedVersionTwo /
GenericIndexedWriter.writeToMultiFiles): inline META only
([0x2][allowReverseLookup][int bagSizePower][int numElements]
[prefixed name]), element bytes split across ``<name>_value_<i>``
smoosh members (1<<bagSizePower elements each, same
[int marker][bytes] framing as v1), and a ``<name>_header`` member of
NATIVE-order int32 end offsets that restart per value file
(writeHeaderLong's long→int relative conversion).

Validated against a faithful test-side port of the WRITER's
multi-file split + header conversion, plus a full container
round-trip (v2 string dictionary feeding scan + metadata +
bound-pushdown)."""

from __future__ import annotations

import json
import random
import struct

import pytest

from apache_druid_spark.ingest.segment import (
    DruidSegmentError, _Buf, read_generic_indexed, read_segment_dir,
    segment_metadata,
)
from segment_format import generic_indexed_v1 as _gi


def write_gi_v2(files: dict, name: str, elements, bag_power: int,
                sorted_flag: bool = False, header_order: str = "<"):
    """Port of GenericIndexedWriter's multi-file write: returns the
    inline meta bytes and adds ``<name>_value_<i>`` / name_header
    members to ``files``."""
    per = 1 << bag_power
    framed, header_ends, cum = [], [], 0
    for e in elements:
        b = (struct.pack(">i", -1) if e is None
             else struct.pack(">i", 0) + e)
        framed.append(b)
        cum += len(b)
        header_ends.append(cum)
    n = len(elements)
    n_files = (n + per - 1) // per
    blob_all = b"".join(framed)
    prev = 0
    for i in range(n_files):
        last = min((i + 1) * per, n) - 1
        files[f"{name}_value_{i}"] = blob_all[prev:header_ends[last]]
        prev = header_ends[last]
    hdr = bytearray()
    rel_base = 0
    for pos in range(n):
        if pos % per == 0:
            rel_base = header_ends[pos - 1] if pos else 0
        hdr += struct.pack(f"{header_order}i",
                           header_ends[pos] - rel_base)
    files[f"{name}_header"] = bytes(hdr)
    nm = name.encode()
    return (b"\x02" + (b"\x01" if sorted_flag else b"\x00")
            + struct.pack(">ii", bag_power, n)
            + struct.pack(">i", len(nm)) + nm)


class _DictMapper:
    def __init__(self, files):
        self.files = files

    def file(self, name):
        return self.files[name]


def test_v2_roundtrip_basic():
    files = {}
    elems = [b"alpha", b"beta", None, b"", b"delta"]
    meta = write_gi_v2(files, "col", elems, bag_power=1)
    out = read_generic_indexed(_Buf(meta), _DictMapper(files))
    assert out == elems


def test_v2_without_mapper_is_loud():
    files = {}
    meta = write_gi_v2(files, "col", [b"x"], bag_power=0)
    with pytest.raises(DruidSegmentError, match="mapper"):
        read_generic_indexed(_Buf(meta))


def test_v2_property_sweep():
    """Seeded sweep across bag sizes, element shapes, null/empty
    density, and element counts that land exactly on / off file
    boundaries."""
    rng = random.Random(0x61F2)
    for case in range(60):
        bag_power = rng.randrange(0, 7)
        per = 1 << bag_power
        n = rng.choice([1, per, per + 1, 3 * per,
                        rng.randrange(1, 200)])
        elems = []
        for _ in range(n):
            r = rng.random()
            if r < 0.1:
                elems.append(None)
            elif r < 0.2:
                elems.append(b"")
            else:
                elems.append(bytes(rng.randrange(256) for _ in
                                   range(rng.randrange(1, 40))))
        files = {}
        meta = write_gi_v2(files, f"c{case}", elems, bag_power)
        got = read_generic_indexed(_Buf(meta), _DictMapper(files))
        assert got == elems, (case, bag_power, n)


def test_v2_big_endian_header_fallback():
    """A big-endian writer's header parses via the BE retry."""
    files = {}
    elems = [b"abcdef" * 10, b"x", None, b"yy"]
    meta = write_gi_v2(files, "col", elems, bag_power=1,
                       header_order=">")
    out = read_generic_indexed(_Buf(meta), _DictMapper(files))
    assert out == elems


def test_v2_corrupt_header_is_loud():
    files = {}
    meta = write_gi_v2(files, "col", [b"abc", b"defg"], bag_power=2)
    hdr = bytearray(files["col_header"])
    struct.pack_into("<i", hdr, 0, 100)  # decreasing in both orders
    struct.pack_into("<i", hdr, 4, 7)
    files["col_header"] = bytes(hdr)
    with pytest.raises(DruidSegmentError, match="byte order"):
        read_generic_indexed(_Buf(meta), _DictMapper(files))


def test_v2_truncated_value_file_is_loud():
    files = {}
    meta = write_gi_v2(files, "col", [b"abcdefgh"], bag_power=0)
    files["col_value_0"] = files["col_value_0"][:6]
    with pytest.raises(DruidSegmentError, match="either byte order"):
        read_generic_indexed(_Buf(meta), _DictMapper(files))


# -- full container: v2 string dictionary ------------------------------------


N_ROWS = 32


def _build_v2_dict_container(tmp_path):
    """8-row-chunk container whose dim dictionary is a v2
    GenericIndexed split across 2 value files; ids + bitmaps v1."""
    d = tmp_path / "seg"
    d.mkdir()
    files = {}
    t0 = 1_400_000_000_000
    time_chunks = []
    for i in range(0, N_ROWS, 8):
        time_chunks.append(b"".join(
            struct.pack("<q", t0 + (i + j) * 1000) for j in range(8)))
    desc = json.dumps({"valueType": "LONG",
                       "hasMultipleValues": False,
                       "parts": [{"type": "long",
                                  "byteOrder": "LITTLE_ENDIAN"}]}) \
        .encode()
    files["__time"] = (struct.pack(">i", len(desc)) + desc
                       + b"\x02" + struct.pack(">ii", N_ROWS, 8)
                       + b"\xff" + _gi(time_chunks))
    values = ["v00", "v01", "v02", "v03"]
    dict_meta = write_gi_v2(files, "dim",
                            [v.encode() for v in values],
                            bag_power=1, sorted_flag=True)
    ids = [i // 8 for i in range(N_ROWS)]
    ids_blob = (b"\x02\x02" + struct.pack(">ii", N_ROWS, 8)
                + b"\xff" + _gi([b"".join(
                    struct.pack("<H", v) for v in ids[i:i + 8])
                    for i in range(0, N_ROWS, 8)]))
    from segment_format import roaring_array
    bitmaps = _gi([roaring_array([r for r in range(N_ROWS)
                                  if ids[r] == k])
                   for k in range(len(values))])
    sdesc = json.dumps({"valueType": "STRING",
                        "hasMultipleValues": False,
                        "parts": [{"type": "stringDictionary",
                                   "bitmapSerdeFactory":
                                       {"type": "roaring"},
                                   "byteOrder": "LITTLE_ENDIAN"}]}) \
        .encode()
    files["dim"] = (struct.pack(">i", len(sdesc)) + sdesc
                    + b"\x02" + struct.pack(">i", 0) + dict_meta
                    + ids_blob + bitmaps)
    bm = json.dumps({"type": "roaring"}).encode()
    files["index.drd"] = (_gi([b"dim"]) + _gi([b"dim"])
                          + struct.pack(">qq", t0,
                                        t0 + N_ROWS * 1000)
                          + struct.pack(">i", len(bm)) + bm)
    (d / "version.bin").write_bytes(struct.pack(">i", 9))
    blob = b"".join(files.values())
    (d / "00000.smoosh").write_bytes(blob)
    lines = ["v1,2147483647,1"]
    pos = 0
    for name, b in files.items():
        lines.append(f"{name},0,{pos},{pos + len(b)}")
        pos += len(b)
    (d / "meta.smoosh").write_text("\n".join(lines) + "\n")
    return str(d)


def test_container_with_v2_dictionary(tmp_path):
    path = _build_v2_dict_container(tmp_path)
    pdf, info = read_segment_dir(path)
    assert len(pdf) == N_ROWS
    assert pdf["dim"].tolist() == [f"v{i // 8:02d}"
                                   for i in range(N_ROWS)]
    # metadata peek handles the v2 dictionary meta
    m = segment_metadata(path)
    assert m["columns"]["dim"]["cardinality"] == 4
    assert m["columns"]["dim"]["minValue"] == "v00"
    assert m["columns"]["dim"]["maxValue"] == "v03"
    # bound pushdown works over the v2 dictionary too
    got, pinfo = read_segment_dir(path, dim_filter={
        "type": "bound", "dimension": "dim",
        "lower": "v01", "upper": "v02"})
    assert pinfo["pushdown_rows"] == 16
    assert set(got["dim"]) == {"v01", "v02"}
