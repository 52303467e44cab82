"""Druid v9 segment-container reader (ingest/segment.py) against the
reference's OWN committed binary fixtures — external validation, not
round-trip self-confirmation:

- indexing-hadoop test-segment/index.zip: a real 2015 deep-storage
  segment whose contents are documented in the adjacent `note` file
  (3 rows; __time 2014-10-22T00/01/02Z; host a/b/c.example.com;
  visited_sum 100/150/200; unique_hosts = HLL sketches of
  cardinality 1) — every value pinned below.
- processing v8SegmentPersistDir: a v9 container with MULTI-VALUE
  dimensions (compressed MULTI_VALUE layout,
  CompressedVSizeColumnarMultiIntsSupplier.java:81).
- processing v9SegmentPersistDir/segmentWithDamagedFile: the fixture
  V9IndexLoaderTest.testLoadSegmentDamagedFileWithLazy loads with a
  deliberately broken `count` column — strict mode must fail loudly
  naming the column, lenient mode must recover every OTHER column
  (the reference test's exact expectation).
"""

from __future__ import annotations

import json
import struct

import pytest

from apache_druid_spark.ingest.segment import (
    DruidSegmentError, SmooshedFiles, lz4_block_decompress,
    read_roaring, read_segment_dir, read_segment_zip, scan_segments,
    segment_schema,
)

GOLDEN_ZIP = ("/root/reference/indexing-hadoop/src/test/resources/"
              "test-segment/index.zip")
V8_DIR = ("/root/reference/processing/src/test/resources/"
          "v8SegmentPersistDir")
DAMAGED_DIR = ("/root/reference/processing/src/test/resources/"
               "v9SegmentPersistDir/segmentWithDamagedFile")


# -- the documented golden segment -------------------------------------------


@pytest.fixture(scope="module")
def golden():
    return read_segment_zip(GOLDEN_ZIP)


def test_golden_segment_structure(golden):
    pdf, info = golden
    assert info["rows"] == 3
    assert info["columns"] == ["host", "unique_hosts", "visited_sum"]
    assert info["dimensions"] == ["host"]
    assert info["bitmap_type"] == "concise"
    assert info["complex"] == {"unique_hosts": "hyperUnique"}
    # index.drd stores the DATA interval as written by the 2015
    # merger (start degenerate-0 in this fixture, end = max row time
    # + 1 ms) — the LOGICAL interval lives in descriptor.json, which
    # deep storage keeps beside the zip, not inside it
    assert info["interval_start_ms"] == 0
    assert info["interval_end_ms"] == 1413943200001


def test_golden_segment_values(golden):
    pdf, _ = golden
    assert pdf["__time"].tolist() == [
        1413936000000, 1413939600000, 1413943200000]  # 00/01/02 UTC
    assert pdf["host"].tolist() == [
        "a.example.com", "b.example.com", "c.example.com"]
    assert pdf["visited_sum"].tolist() == [100, 150, 200]


def test_golden_segment_hll_feeds_hllc(golden):
    """The stored hyperUnique COMPLEX blobs are HyperLogLogCollector
    wire state — ingest/hllc.py reads them: each row estimates 1,
    and folding all three estimates 3 distinct hosts."""
    from apache_druid_spark.ingest.hllc import (
        HllcCollector, estimate_bytes,
    )

    pdf, _ = golden
    blobs = [bytes(b) for b in pdf["unique_hosts"]]
    for b in blobs:
        assert abs(estimate_bytes(b) - 1.0) < 0.001
    folded = HllcCollector()
    for b in blobs:
        folded.fold(HllcCollector.from_bytes(b))
    assert abs(folded.estimate() - 3.0) < 0.01


def test_golden_zip_rejects_non_segment(tmp_path):
    import zipfile

    bogus = tmp_path / "not_a_segment.zip"
    with zipfile.ZipFile(bogus, "w") as z:
        z.writestr("hello.txt", "nope")
    with pytest.raises(DruidSegmentError, match="meta.smoosh"):
        read_segment_zip(str(bogus))


# -- multi-value dimensions (v8PersistDir fixture) ---------------------------


def test_multivalue_segment(golden):
    pdf, info = read_segment_dir(V8_DIR)
    assert info["rows"] == 6
    assert info["dimensions"] == ["dim0", "dim1"]
    # dim0 is MULTI-VALUE: rows 0/2 hold two values, row 1 a single
    # empty string, the rest zero values — stored distinctly and
    # preserved distinctly
    assert pdf["dim0"].tolist() == [
        ["dim00", "dim01"], [""], ["dim00", "dim01"], [], [], []]
    assert pdf["dim1"].tolist() == [
        "dim10", "dim10", "", "", "dim10", ""]
    assert pdf["count"].tolist() == [1] * 6


# -- damaged container (V9IndexLoaderTest parity) ----------------------------


def test_damaged_column_strict_raises():
    with pytest.raises(DruidSegmentError, match="count"):
        read_segment_dir(DAMAGED_DIR)


def test_damaged_column_lenient_recovers_others():
    pdf, info = read_segment_dir(DAMAGED_DIR, lenient=True)
    assert list(info["column_errors"]) == ["count"]
    assert pdf["count"].tolist() == [None]
    # every OTHER column loads (the reference test's assertion)
    assert pdf["srcIP"].tolist() == ["1.1.1.1"]
    assert pdf["dstIP"].tolist() == ["2.2.2.2"]
    assert pdf["sum_bytes"].tolist() == [9024]
    assert pdf["sum_packets"].tolist() == [20]


def test_version_guard(tmp_path):
    # v8 is SUPPORTED since r17 (tests/test_v8.py) — the guard now
    # fires for genuinely unknown versions, and a version-8 marker
    # with no index.drd is loud about the missing member
    seg = tmp_path / "v7seg"
    seg.mkdir()
    (seg / "version.bin").write_bytes(struct.pack(">i", 7))
    (seg / "meta.smoosh").write_text("v1,2147483647,1\n")
    with pytest.raises(DruidSegmentError, match="version 7"):
        read_segment_dir(str(seg))
    seg2 = tmp_path / "v8seg"
    seg2.mkdir()
    (seg2 / "version.bin").write_bytes(struct.pack(">i", 8))
    (seg2 / "meta.smoosh").write_text("v1,2147483647,1\n")
    with pytest.raises(DruidSegmentError, match="index.drd"):
        read_segment_dir(str(seg2))


def test_smoosh_overrun_is_loud(tmp_path):
    seg = tmp_path / "trunc"
    seg.mkdir()
    (seg / "meta.smoosh").write_text(
        "v1,2147483647,1\n__time,0,0,500\n")
    (seg / "00000.smoosh").write_bytes(b"\x00" * 100)
    with pytest.raises(DruidSegmentError, match="overruns"):
        SmooshedFiles(str(seg)).file("__time")


# -- decoder unit pins -------------------------------------------------------


def test_lz4_block_roundtrip_forms():
    # literal-only block
    assert bytes(lz4_block_decompress(b"\x30abc", 10)) == b"abc"
    # match with overlap (RLE): 1 literal + copy offset 1
    out = bytes(lz4_block_decompress(b"\x1fa\x01\x00\x05", 50))
    assert out == b"a" * 25  # 1 literal + (15+5+4)=24 match
    with pytest.raises(DruidSegmentError):
        lz4_block_decompress(b"\x10", 10)  # truncated literal


def test_roaring_decode_array_and_bitmap():
    import numpy as np

    # hand-built portable roaring: no-run cookie, 1 array container,
    # key 0, cardinality 3, offsets header, values [1, 5, 100]
    blob = struct.pack("<ii", 12346, 1) + struct.pack("<HH", 0, 2) \
        + struct.pack("<i", 16) + struct.pack("<HHH", 1, 5, 100)
    assert read_roaring(blob).tolist() == [1, 5, 100]
    # run-container cookie with 1 run [10, 13]
    cookie = 12347 | (0 << 16)
    blob = struct.pack("<i", cookie) + b"\x01" \
        + struct.pack("<HH", 0, 3) + struct.pack("<H", 1) \
        + struct.pack("<HH", 10, 3)
    assert read_roaring(blob).tolist() == [10, 11, 12, 13]


def test_unpack_bits_sizes():
    import numpy as np

    from apache_druid_spark.ingest.segment import _unpack_bits

    # 4-bit values 1..6 packed MSB-first: 0x12 0x34 0x56
    assert _unpack_bits(b"\x12\x34\x56", 4, 6).tolist() == \
        [1, 2, 3, 4, 5, 6]
    # 12-bit values: 0xABC, 0x123 -> bytes AB C1 23
    assert _unpack_bits(b"\xab\xc1\x23", 12, 2).tolist() == \
        [0xABC, 0x123]
    assert _unpack_bits(struct.pack(">4H", 7, 65535, 300, 0),
                        16, 4).tolist() == [7, 65535, 300, 0]


# -- Spark surface -----------------------------------------------------------


def test_segment_schema_and_scan(spark):
    from pyspark.sql import types as T

    schema, info = segment_schema(GOLDEN_ZIP)
    by_name = {f.name: f.dataType for f in schema.fields}
    assert isinstance(by_name["__time"], T.TimestampType)
    assert isinstance(by_name["host"], T.StringType)
    assert isinstance(by_name["visited_sum"], T.LongType)
    assert isinstance(by_name["unique_hosts"], T.BinaryType)

    # two containers -> one DataFrame, one segment per task
    df = scan_segments(spark, [GOLDEN_ZIP, GOLDEN_ZIP])
    rows = df.orderBy("__time", "host").collect()
    assert len(rows) == 6
    assert rows[0]["host"] == "a.example.com"
    assert rows[0]["visited_sum"] == 100
    assert str(rows[0]["__time"]).startswith("2014-10-22 00:00")


def test_scanned_segment_queryable_via_native_path(spark):
    """The migration story end-to-end: containers -> scan_segments ->
    DatasourceRegistry -> a NATIVE groupBy with the legacy
    hyperUnique aggregator over the stored COMPLEX column."""
    from pyspark.sql import functions as F

    from apache_druid_spark.model.datasource import DatasourceRegistry
    from apache_druid_spark.plans.compiler import compile_query

    reg = DatasourceRegistry(spark)
    reg.register("druid_seg", scan_segments(spark, [GOLDEN_ZIP]))
    out = compile_query({
        "queryType": "groupBy", "dataSource": "druid_seg",
        "granularity": "all", "dimensions": [],
        "aggregations": [
            {"type": "longSum", "name": "visits",
             "fieldName": "visited_sum"},
            {"type": "hyperUnique", "name": "uniq",
             "fieldName": "unique_hosts", "legacy": True}],
    }, reg).collect()
    assert len(out) == 1
    assert out[0]["visits"] == 450
    assert abs(out[0]["uniq"] - 3.0) < 0.01


from segment_format import (  # noqa: E402 (shared writer helper)
    generic_indexed_v1 as _generic_indexed_v1,
)


def _pack_bits(vals, bits):
    s = "".join(format(v, f"0{bits}b") for v in vals)
    s += "0" * (-len(s) % 8)
    return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))


def test_delta_encoded_longs_column():
    """Synthetic DELTA-encoded compressed-longs blob per the writer
    format (CompressionFactory.java:75 DELTA header; flagged
    compression id = id - 126 in byte arithmetic): version 0x2,
    totalSize, sizePer, flagged-UNCOMPRESSED id 0x81, encoding DELTA
    0x0, (version 1, base long, bits int), then a GenericIndexed of
    raw bit-packed chunks."""
    from apache_druid_spark.ingest.segment import (
        _Buf, read_compressed_longs,
    )

    base, bits = 1_400_000_000_000, 4
    vals = [base + d for d in (0, 3, 7, 15, 1, 2, 9)]
    size_per = 4  # 2 chunks: 4 + 3 values
    chunks = [_pack_bits([v - base for v in vals[:4]], bits),
              _pack_bits([v - base for v in vals[4:]], bits)]
    blob = (b"\x02" + struct.pack(">ii", len(vals), size_per)
            + b"\x81"                      # UNCOMPRESSED (0xFF) - 126
            + b"\x00"                      # DELTA
            + b"\x01" + struct.pack(">qi", base, bits)
            + _generic_indexed_v1(chunks))
    assert read_compressed_longs(_Buf(blob)).tolist() == vals


def test_table_encoded_longs_column():
    from apache_druid_spark.ingest.segment import (
        _Buf, read_compressed_longs,
    )

    table = [100, -7, 9999]       # 3 entries -> 2 bits per id
    ids = [0, 2, 1, 1, 0]
    blob = (b"\x02" + struct.pack(">ii", len(ids), 8)
            + b"\x81" + b"\x01"           # TABLE
            + b"\x01" + struct.pack(">i", len(table))
            + b"".join(struct.pack(">q", t) for t in table)
            + _generic_indexed_v1([_pack_bits(ids, 2)]))
    assert read_compressed_longs(_Buf(blob)).tolist() == \
        [table[i] for i in ids]


def _roaring_array(vals):
    blob = struct.pack("<ii", 12346, 1) \
        + struct.pack("<HH", 0, len(vals) - 1) \
        + struct.pack("<i", 16) \
        + b"".join(struct.pack("<H", v) for v in vals)
    return blob


def test_longv2_column_with_roaring_nulls():
    """Synthetic longV2 column blob (LongNumericColumnPartSerdeV2
    .java:143: int offset, compressed longs, then a 4-byte-size
    roaring bitmap of null rows) through read_column."""
    import numpy as np

    from apache_druid_spark.ingest.segment import read_column

    desc = json.dumps({"valueType": "LONG", "hasMultipleValues": False,
                       "parts": [{"type": "longV2",
                                  "byteOrder": "LITTLE_ENDIAN"}]}) \
        .encode()
    vals = [10, 0, 30, 0, 50]
    chunk = b"".join(struct.pack("<q", v) for v in vals)
    longs = (b"\x02" + struct.pack(">ii", len(vals), 8) + b"\xff"
             + _generic_indexed_v1([chunk]))
    nulls = _roaring_array([1, 3])
    part = struct.pack(">i", len(longs)) + longs \
        + struct.pack(">i", len(nulls)) + nulls
    blob = struct.pack(">i", len(desc)) + desc + part
    col = read_column("m", blob, "roaring")
    assert col["values"].tolist() == [10, None, 30, None, 50]


def test_doublev2_column_nulls_become_nan():
    import math

    from apache_druid_spark.ingest.segment import read_column

    desc = json.dumps({"valueType": "DOUBLE",
                       "hasMultipleValues": False,
                       "parts": [{"type": "doubleV2",
                                  "byteOrder": "LITTLE_ENDIAN"}]}) \
        .encode()
    vals = [1.5, 0.0, -2.25]
    chunk = b"".join(struct.pack("<d", v) for v in vals)
    dbls = (b"\x02" + struct.pack(">ii", len(vals), 8) + b"\xff"
            + _generic_indexed_v1([chunk]))
    nulls = _roaring_array([1])
    part = struct.pack(">i", len(dbls)) + dbls \
        + struct.pack(">i", len(nulls)) + nulls
    blob = struct.pack(">i", len(desc)) + desc + part
    col = read_column("d", blob, "roaring")
    out = col["values"].tolist()
    assert out[0] == 1.5 and out[2] == -2.25 and math.isnan(out[1])


def test_float_column_lz4_chunks():
    """FLOAT column with a real LZ4-compressed chunk (compressed by
    hand as a literal-only block) — exercises the float reader AND
    the LZ4 path end-to-end."""
    from apache_druid_spark.ingest.segment import read_column

    desc = json.dumps({"valueType": "FLOAT", "hasMultipleValues": False,
                       "parts": [{"type": "float",
                                  "byteOrder": "LITTLE_ENDIAN"}]}) \
        .encode()
    vals = [0.5, -1.25, 3.0]
    raw = b"".join(struct.pack("<f", v) for v in vals)
    # literal-only LZ4 block: token litlen=12 -> 0xC0
    lz4 = bytes([0xC0]) + raw
    floats = (b"\x02" + struct.pack(">ii", len(vals), 4) + b"\x01"
              + _generic_indexed_v1([lz4]))
    blob = struct.pack(">i", len(desc)) + desc + floats
    col = read_column("f", blob, "roaring")
    assert col["values"].tolist() == [0.5, -1.25, 3.0]


def test_concise_null_bitmap_decodes():
    """The r16 loud retired (VERDICT r16 task #2): concise-serde null
    bitmaps now decode — full coverage in tests/test_concise.py, this
    pins the read_column wiring."""
    from apache_druid_spark.ingest.segment import read_column

    desc = json.dumps({"valueType": "LONG", "hasMultipleValues": False,
                       "parts": [{"type": "longV2",
                                  "byteOrder": "LITTLE_ENDIAN"}]}) \
        .encode()
    vals = [7, 0, 9]
    chunk = b"".join(struct.pack("<q", v) for v in vals)
    longs = (b"\x02" + struct.pack(">ii", len(vals), 8) + b"\xff"
             + _generic_indexed_v1([chunk]))
    # CONCISE literal word with bit 1 set → row 1 is null
    nulls = struct.pack(">I", 0x80000002)
    part = struct.pack(">i", len(longs)) + longs \
        + struct.pack(">i", len(nulls)) + nulls
    blob = struct.pack(">i", len(desc)) + desc + part
    col = read_column("m", blob, "concise")
    assert col["values"].tolist() == [7, None, 9]


# -- the reference's {"type": "druid"} re-ingestion input source -------------


def test_druid_input_source_reingestion(spark):
    """DruidInputSource parity (indexing-service/.../input/
    DruidInputSource.java:150): re-ingest FROM segment containers with
    interval + DimFilter + dimension/metric projection, through the
    ordinary ioConfig surface."""
    from apache_druid_spark.ingest.batch import read_input

    df = read_input(spark, {"inputSource": {
        "type": "druid",
        "segments": [GOLDEN_ZIP],
        "interval": "2014-10-22T00:30:00/2014-10-23",
        "filter": {"type": "not", "field": {
            "type": "selector", "dimension": "host",
            "value": "c.example.com"}},
        "dimensions": ["host"], "metrics": ["visited_sum"],
    }})
    rows = df.collect()
    # interval drops the 00:00 row, filter drops host c
    assert len(rows) == 1
    assert rows[0]["host"] == "b.example.com"
    assert rows[0]["visited_sum"] == 150
    assert df.columns == ["__time", "host", "visited_sum"]


def test_druid_input_source_base_dir(spark, tmp_path):
    import shutil
    import zipfile

    base = tmp_path / "store"
    base.mkdir()
    # one extracted dir + one zip + one irrelevant file
    seg_dir = base / "seg_a"
    seg_dir.mkdir()
    with zipfile.ZipFile(GOLDEN_ZIP) as z:
        z.extractall(seg_dir)
    shutil.copy(GOLDEN_ZIP, base / "seg_b.zip")
    (base / "README.txt").write_text("not a segment")

    from apache_druid_spark.ingest.batch import read_input

    df = read_input(spark, {"inputSource": {"type": "druid",
                                            "baseDir": str(base)}})
    assert df.count() == 6  # both containers, 3 rows each


def test_druid_input_source_requires_paths(spark):
    from apache_druid_spark.ingest.batch import read_input
    from apache_druid_spark.ingest.segment import DruidSegmentError

    with pytest.raises(DruidSegmentError, match="coordinator"):
        read_input(spark, {"inputSource": {"type": "druid",
                                           "dataSource": "wiki"}})


def test_scan_segments_multivalue_through_arrow(spark):
    """MV dimensions must survive the Arrow batch path as
    array<string> (the v8PersistDir fixture's dim0)."""
    df = scan_segments(spark, [V8_DIR])
    rows = df.orderBy("__time").collect()
    assert len(rows) == 6
    assert rows[0]["dim0"] == ["dim00", "dim01"]
    assert rows[1]["dim0"] == [""]
    assert rows[3]["dim0"] == []
    assert rows[0]["dim1"] == "dim10"
    # MV column is queryable with the engine's any-element semantics
    from pyspark.sql import functions as F

    hits = df.filter(F.array_contains("dim0", "dim01")).count()
    assert hits == 2


def test_property_decoder_sweep():
    """Seeded randomized sweep over the column decoders using
    writer-format synthetic blobs: GenericIndexed element integrity,
    compressed-longs chunking at random sizePer (LONGS/DELTA/TABLE),
    VSize id widths 1-4, roaring sets across container kinds."""
    import random

    import numpy as np

    from apache_druid_spark.ingest.segment import (
        _Buf, read_compressed_longs, read_generic_indexed,
        read_roaring, read_vsize_ints,
    )

    rng = random.Random(20260817)
    for _ in range(60):
        # GenericIndexed with random elements incl. empty + null
        elems = [rng.randbytes(rng.randrange(0, 40))
                 for _ in range(rng.randrange(1, 20))]
        got = read_generic_indexed(_Buf(_generic_indexed_v1(elems)))
        assert [g or b"" for g in got] == elems

        # longs: random values, random chunking, random encoding
        n = rng.randrange(1, 200)
        size_per = 2 ** rng.randrange(0, 8)
        enc = rng.choice(("longs", "delta", "table"))
        if enc == "longs":
            vals = [rng.randrange(-2**62, 2**62) for _ in range(n)]
            chunks = [b"".join(struct.pack("<q", v)
                               for v in vals[i:i + size_per])
                      for i in range(0, n, size_per)]
            blob = (b"\x02" + struct.pack(">ii", n, size_per)
                    + b"\xff" + _generic_indexed_v1(chunks))
        elif enc == "delta":
            base = rng.randrange(-2**40, 2**40)
            bits = rng.choice((1, 2, 4, 8, 12, 16, 20, 24, 32))
            vals = [base + rng.randrange(0, 2**bits)
                    for _ in range(n)]
            chunks = [_pack_bits([v - base
                                  for v in vals[i:i + size_per]], bits)
                      for i in range(0, n, size_per)]
            blob = (b"\x02" + struct.pack(">ii", n, size_per)
                    + b"\x81\x00\x01" + struct.pack(">qi", base, bits)
                    + _generic_indexed_v1(chunks))
        else:
            table = [rng.randrange(-2**50, 2**50)
                     for _ in range(rng.randrange(1, 30))]
            bits = 1
            for cand in (1, 2, 4, 8, 12):
                if 2 ** cand >= len(table):
                    bits = cand
                    break
            ids = [rng.randrange(len(table)) for _ in range(n)]
            vals = [table[i] for i in ids]
            chunks = [_pack_bits(ids[i:i + size_per], bits)
                      for i in range(0, n, size_per)]
            blob = (b"\x02" + struct.pack(">ii", n, size_per)
                    + b"\x81\x01\x01" + struct.pack(">i", len(table))
                    + b"".join(struct.pack(">q", t) for t in table)
                    + _generic_indexed_v1(chunks))
        assert read_compressed_longs(_Buf(blob)).tolist() == vals

        # VSize uncompressed ids: random byte width
        nb = rng.randrange(1, 5)
        ids = [rng.randrange(0, 2 ** (8 * nb)) for _ in
               range(rng.randrange(1, 50))]
        raw = b"".join(v.to_bytes(nb, "big") for v in ids) \
            + bytes(4 - nb)
        blob = b"\x00" + bytes([nb]) + struct.pack(">i", len(raw)) \
            + raw
        assert read_vsize_ints(_Buf(blob)).tolist() == ids

        # roaring: random sparse + dense sets
        univ = rng.choice((300, 70000))
        vals = sorted(rng.sample(range(univ),
                                 rng.randrange(1, min(univ, 6000))))
        by_key = {}
        for v in vals:
            by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
        keys = sorted(by_key)
        blob = struct.pack("<ii", 12346, len(keys))
        for k in keys:
            blob += struct.pack("<HH", k, len(by_key[k]) - 1)
        blob += b"\x00" * (4 * len(keys))  # offsets (unused)
        for k in keys:
            lows = by_key[k]
            if len(lows) > 4096:
                bits = np.zeros(65536, dtype=np.uint8)
                bits[lows] = 1
                blob += np.packbits(bits, bitorder="little").tobytes()
            else:
                blob += b"".join(struct.pack("<H", x) for x in lows)
        assert read_roaring(blob).tolist() == vals


# -- r16 in-round review findings --------------------------------------------


def test_scan_segments_correct_in_non_utc_session(spark):
    """__time is UTC epoch ms in the container; a session pinned to
    another timeZone must read the same INSTANT (the r16 review
    found tz-naive pandas timestamps being reinterpreted in the
    session zone — a silent shift)."""
    from pyspark.sql import functions as F

    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone",
                       "America/New_York")
        df = scan_segments(spark, [GOLDEN_ZIP])
        ms = [r["ms"] for r in df.select(
            F.unix_millis("__time").alias("ms"))
            .orderBy("ms").collect()]
        assert ms == [1413936000000, 1413939600000, 1413943200000]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_lenient_catches_truncated_chunk_indexerror(tmp_path):
    """A chunk truncated mid-sequence raises IndexError from the byte
    cursors — lenient mode must degrade that column like any other
    damage instead of aborting the container."""
    import shutil
    import zipfile as zf

    seg = tmp_path / "trunc_col"
    seg.mkdir()
    with zf.ZipFile(GOLDEN_ZIP) as z:
        z.extractall(seg)
    # truncate the chunk file mid-way through the LAST column's bytes
    # (visited_sum per meta.smoosh order) but keep meta.smoosh intact
    # by padding with zeros to the declared size
    chunk = seg / "00000.smoosh"
    data = bytearray(chunk.read_bytes())
    # zero out the tail of visited_sum's range (752..1161) so its
    # LZ4 stream is garbage mid-sequence
    data[900:1161] = bytes(1161 - 900)
    chunk.write_bytes(bytes(data))
    pdf, info = read_segment_dir(str(seg), lenient=True)
    assert "visited_sum" in info["column_errors"]
    assert pdf["host"].tolist() == [
        "a.example.com", "b.example.com", "c.example.com"]
    with pytest.raises(Exception):
        read_segment_dir(str(seg))  # strict still aborts


def test_zip_read_does_not_extract(tmp_path, monkeypatch):
    """read_segment_zip streams members in memory — nothing lands on
    disk (the r16 review found full extractall per read)."""
    import tempfile

    monkeypatch.setattr(tempfile, "tempdir", str(tmp_path))
    before = set((tmp_path).iterdir())
    pdf, _ = read_segment_zip(GOLDEN_ZIP)
    assert len(pdf) == 3
    assert set((tmp_path).iterdir()) == before


def test_druid_input_source_dedups_overlapping_paths(spark, tmp_path):
    import shutil

    base = tmp_path / "store"
    base.mkdir()
    shutil.copy(GOLDEN_ZIP, base / "seg.zip")
    from apache_druid_spark.ingest.batch import read_input

    df = read_input(spark, {"inputSource": {
        "type": "druid",
        "segments": [str(base / "seg.zip")],
        "baseDir": str(base)}})
    assert df.count() == 3  # NOT 6 — same container named twice


def test_segment_metadata_analyses():
    """SegmentMetadataQuery analyses from the container itself (no
    chunk decompression): cardinality, sorted-dictionary MINMAX,
    size, interval, rows — plus metadata.drd aggregators/rollup
    verbatim where present."""
    from apache_druid_spark.ingest.segment import segment_metadata

    m = segment_metadata(GOLDEN_ZIP)
    assert m["rows"] == 3
    assert m["dimensions"] == ["host"]
    host = m["columns"]["host"]
    assert host["cardinality"] == 3
    assert host["minValue"] == "a.example.com"
    assert host["maxValue"] == "c.example.com"
    assert m["columns"]["unique_hosts"]["complexType"] == "hyperUnique"
    assert m["columns"]["visited_sum"]["rows"] == 3
    assert m["columns"]["host"]["size"] == 581  # meta.smoosh range

    m2 = segment_metadata(V8_DIR)
    assert m2["rows"] == 6
    assert m2["rollup"] is True
    assert m2["aggregators"][0]["type"] == "longSum"
    assert m2["queryGranularity"] == {"type": "none"}
    d0 = m2["columns"]["dim0"]
    assert d0["hasMultipleValues"] and d0["cardinality"] == 3


def test_lz4_compressor_roundtrip_property():
    """Seeded round-trip sweep through the greedy LZ4 encoder — the
    match-bearing streams (overlapping copies, long runs, structured
    LE-long chunks) exercise decoder paths the literal-only fixtures
    can't."""
    import random

    from apache_druid_spark.ingest.segment import (
        lz4_block_compress, lz4_block_decompress,
    )

    rng = random.Random(20260818)
    cases = [b"", b"x", bytes(4096), b"abcd" * 1000,
             (b"ab" * 7 + b"xyz") * 300]
    for _ in range(40):
        kind = rng.randrange(3)
        if kind == 0:  # random (incompressible)
            c = bytes(rng.randrange(256)
                      for _ in range(rng.randrange(1, 3000)))
        elif kind == 1:  # repetitive phrases (matches + overlaps)
            words = [rng.randbytes(rng.randrange(2, 9))
                     for _ in range(4)]
            c = b"".join(words[rng.randrange(4)]
                         for _ in range(rng.randrange(10, 800)))
        else:  # structured ascending longs (a real chunk shape)
            base = rng.randrange(2**40)
            c = b"".join(struct.pack("<q", base + i * 1000)
                         for i in range(rng.randrange(1, 600)))
        cases.append(c)
    for c in cases:
        z = lz4_block_compress(c)
        assert bytes(lz4_block_decompress(z, len(c) + 8)) == c


def test_generic_indexed_overrun_is_loud():
    """r16 review: the vectorized element walk must raise on
    header offsets past the buffer, not silently truncate."""
    from apache_druid_spark.ingest.segment import (
        _Buf, read_generic_indexed,
    )

    good = _generic_indexed_v1([b"abc", b"defg"])
    # corrupt the LAST end-offset to point far past the value area
    bad = bytearray(good)
    struct.pack_into(">i", bad, 2 + 4 + 4 + 4, 10_000)
    with pytest.raises(DruidSegmentError, match="offsets reach"):
        read_generic_indexed(_Buf(bytes(bad)))


def test_segment_metadata_never_reads_full_columns(monkeypatch):
    """r16 review: the metadata peek must stay bounded — dictionary
    prefix only, never the id/bitmap regions (SmooshedFiles.file is
    not called at all; only prefix/read_aux are)."""
    from apache_druid_spark.ingest import segment as seg_mod

    calls = []
    orig = seg_mod.SmooshedFiles.file

    def spy(self, name):
        calls.append(name)
        return orig(self, name)

    monkeypatch.setattr(seg_mod.SmooshedFiles, "file", spy)
    m = seg_mod.segment_metadata(V8_DIR)
    assert m["columns"]["dim0"]["cardinality"] == 3
    # only the tiny index/metadata files go through file(); every
    # COLUMN read is a bounded prefix
    assert set(calls) <= {"index.drd", "metadata.drd"}
