"""Legacy v8 container support (IndexIO.java
DefaultIndexIOHandler.mapDir:313-420) — the last enumerated format
loud, retired in r17. Validated against a test-side port of the v8
WRITER layout: index.drd ([0x8][GI dims][GI mets][prefixed ISO
interval]), time_<ORDER>.drd compressed longs, met_<name>_<ORDER>.drd
MetricHolder (float / complex), dim_<name>.drd (prefixed name + GI
dictionary + VSizeColumnarMultiInts), with inverted.drd CONCISE
bitmaps present-but-skipped, all inside an ordinary smoosh."""

from __future__ import annotations

import json
import math
import struct

import pytest

from apache_druid_spark.ingest.segment import (
    DruidSegmentError, read_segment_dir, scan_segments,
    segment_metadata, segment_schema,
)
from segment_format import generic_indexed_v1 as _gi

N_ROWS = 24
T0 = 1_300_000_000_000


def _pstr(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">i", len(b)) + b


def _longs_envelope(vals, size_per=8) -> bytes:
    chunks = [b"".join(struct.pack("<q", v)
                       for v in vals[i:i + size_per])
              for i in range(0, len(vals), size_per)]
    return (b"\x02" + struct.pack(">ii", len(vals), size_per)
            + b"\xff" + _gi(chunks))


def _floats_envelope(vals, size_per=8) -> bytes:
    chunks = [b"".join(struct.pack("<f", v)
                       for v in vals[i:i + size_per])
              for i in range(0, len(vals), size_per)]
    return (b"\x02" + struct.pack(">ii", len(vals), size_per)
            + b"\xff" + _gi(chunks))


def _vsize_multi(rows_of_ids) -> bytes:
    """VSizeColumnarMultiInts v1: numBytes=1, END byte offsets, then
    1-byte BE ids."""
    values = b"".join(bytes(r) for r in rows_of_ids)
    ends, acc = [], 0
    for r in rows_of_ids:
        acc += len(r)
        ends.append(acc)
    inner = (struct.pack(">i", len(rows_of_ids))
             + b"".join(struct.pack(">i", e) for e in ends) + values)
    return b"\x01\x01" + struct.pack(">i", len(inner)) + inner


def _concise_literal(rows) -> bytes:
    """Single-word-per-block CONCISE for small row counts."""
    words = []
    word = 0
    for r in rows:
        word |= 1 << (r % 31)
    words.append(0x80000000 | word)
    return b"".join(struct.pack(">I", w) for w in words)


def _build_v8(tmp_path, with_version_bin=False):
    d = tmp_path / "v8seg"
    d.mkdir()
    files = {}
    files["index.drd"] = (b"\x08" + _gi([b"page", b"lang"])
                          + _gi([b"score", b"sketch"])
                          + _pstr("2011-01-12T00:00:00.000Z/"
                                  "2011-01-14T00:00:00.000Z"))
    files["time_LITTLE_ENDIAN.drd"] = _longs_envelope(
        [T0 + i * 1000 for i in range(N_ROWS)])
    # page: multi-value rows cycling over a 3-value dictionary
    page_dict = _gi([b"About", b"Main", b"Talk"])
    page_rows = [[i % 3] if i % 4 else [i % 3, (i + 1) % 3]
                 for i in range(N_ROWS)]
    files["dim_page.drd"] = (_pstr("page") + page_dict
                             + _vsize_multi(page_rows))
    lang_dict = _gi([b"en", b"fr"])
    lang_rows = [[i % 2] for i in range(N_ROWS)]
    files["dim_lang.drd"] = (_pstr("lang") + lang_dict
                             + _vsize_multi(lang_rows))
    files["met_score_LITTLE_ENDIAN.drd"] = (
        b"\x00" + _pstr("score") + _pstr("float")
        + _floats_envelope([i * 0.5 for i in range(N_ROWS)]))
    from apache_druid_spark.ingest.hllc import collector_of

    blobs = [collector_of([f"u{i % 5}"]).to_bytes()
             for i in range(N_ROWS)]
    files["met_sketch_LITTLE_ENDIAN.drd"] = (
        b"\x00" + _pstr("sketch") + _pstr("hyperUnique")
        + _gi(blobs))
    # inverted.drd present (CONCISE) — parsed past by the scan
    inv = b""
    for dim, dic, rows in (("page", 3, page_rows),
                           ("lang", 2, lang_rows)):
        inv += _pstr(dim) + _gi([
            _concise_literal([r for r in range(N_ROWS)
                              if k in rows[r]])
            for k in range(dic)])
    files["inverted.drd"] = inv
    blob = b"".join(files.values())
    (d / "00000.smoosh").write_bytes(blob)
    lines = ["v1,2147483647,1"]
    pos = 0
    for name, b in files.items():
        lines.append(f"{name},0,{pos},{pos + len(b)}")
        pos += len(b)
    (d / "meta.smoosh").write_text("\n".join(lines) + "\n")
    if with_version_bin:
        (d / "version.bin").write_bytes(struct.pack(">i", 8))
    return str(d)


def test_v8_reads_all_columns(tmp_path):
    pdf, info = read_segment_dir(_build_v8(tmp_path))
    assert info.get("v8") is True
    assert info["rows"] == N_ROWS
    assert pdf["__time"].tolist()[0] == T0
    assert pdf["page"].tolist()[0] == ["About", "Main"]
    assert pdf["page"].tolist()[1] == ["Main"]
    assert pdf["lang"].tolist()[:2] == [["en"], ["fr"]]
    assert pdf["score"].tolist()[:3] == [0.0, 0.5, 1.0]
    assert info["complex"] == {"sketch": "hyperUnique"}
    from apache_druid_spark.ingest.hllc import estimate_bytes

    assert abs(estimate_bytes(bytes(pdf["sketch"][0])) - 1.0) < 0.01


def test_v8_version_bin_variant(tmp_path):
    # SegmentUtils reads version.bin when present — value 8 routes
    # the same way as the index.drd byte
    pdf, info = read_segment_dir(_build_v8(tmp_path,
                                           with_version_bin=True))
    assert info.get("v8") is True and len(pdf) == N_ROWS


def test_v8_interval_and_projection(tmp_path):
    path = _build_v8(tmp_path)
    pdf, info = read_segment_dir(
        path, interval=(T0 + 4000, T0 + 10_000),
        columns={"score"})
    assert info["pushdown_rows"] == 6
    assert list(pdf.columns) == ["__time", "score"]
    assert pdf["score"].tolist() == [2.0, 2.5, 3.0, 3.5, 4.0, 4.5]


def test_v8_schema_and_spark_scan(spark, tmp_path):
    path = _build_v8(tmp_path)
    schema, info = segment_schema(path)
    kinds = {f.name: f.dataType.simpleString() for f in schema.fields}
    assert kinds == {"__time": "timestamp",
                     "page": "array<string>",
                     "lang": "array<string>",
                     "score": "double", "sketch": "binary"}
    df = scan_segments(spark, [path])
    rows = df.orderBy("__time").collect()
    assert len(rows) == N_ROWS
    assert rows[0]["page"] == ["About", "Main"]
    assert rows[2]["score"] == 1.0


def test_v8_metadata(tmp_path):
    m = segment_metadata(_build_v8(tmp_path))
    assert m["v8"] is True and m["rows"] == N_ROWS
    assert m["dimensions"] == ["page", "lang"]
    assert m["columns"]["page"]["cardinality"] == 3
    assert m["columns"]["lang"]["cardinality"] == 2
    assert m["columns"]["score"]["type"] == "FLOAT"
    assert m["columns"]["sketch"]["complexType"] == "hyperUnique"
    assert m["interval_start_ms"] == 1294790400000


def test_v8_reingestion_input_source(spark, tmp_path):
    from apache_druid_spark.ingest.batch import read_input

    path = _build_v8(tmp_path)
    df = read_input(spark, {"inputSource": {
        "type": "druid", "segments": [path],
        "filter": {"type": "selector", "dimension": "lang",
                   "value": "fr"}}})
    rows = df.collect()
    assert len(rows) == N_ROWS // 2
    assert all(r["lang"] == ["fr"] for r in rows)


def test_v8_damaged_metric_lenient(tmp_path):
    path = _build_v8(tmp_path)
    # corrupt the score member in place
    meta = (tmp_path / "v8seg" / "meta.smoosh").read_text()
    for line in meta.splitlines():
        if line.startswith("met_score"):
            _, _, start, end = line.split(",")
    smoosh = tmp_path / "v8seg" / "00000.smoosh"
    data = bytearray(smoosh.read_bytes())
    data[int(start):int(start) + 8] = b"\xde\xad\xbe\xef" * 2
    smoosh.write_bytes(bytes(data))
    with pytest.raises(DruidSegmentError):
        read_segment_dir(path)
    pdf, info = read_segment_dir(path, lenient=True)
    assert "score" in info["column_errors"]
    assert pdf["score"].tolist() == [None] * N_ROWS
    assert pdf["page"].tolist()[1] == ["Main"]  # others recover


def test_non_segment_version_still_loud(tmp_path):
    d = tmp_path / "v7"
    d.mkdir()
    files = {"index.drd": b"\x07" + _gi([b"d"])}
    (d / "00000.smoosh").write_bytes(files["index.drd"])
    (d / "meta.smoosh").write_text(
        "v1,2147483647,1\nindex.drd,0,0,"
        f"{len(files['index.drd'])}\n")
    with pytest.raises(DruidSegmentError, match="version 7"):
        read_segment_dir(str(d))


def test_v8_discovered_under_base_dir(spark, tmp_path):
    """True v8 dirs have NO version.bin — baseDir discovery keys on
    meta.smoosh, which both layouts share."""
    from apache_druid_spark.ingest.batch import read_input

    base = tmp_path / "store"
    base.mkdir()
    _build_v8(base)  # creates base/v8seg WITHOUT version.bin
    df = read_input(spark, {"inputSource": {
        "type": "druid", "baseDir": str(base)}})
    assert df.count() == N_ROWS
