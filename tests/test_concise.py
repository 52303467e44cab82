"""CONCISE bitmap decoder validation (VERDICT r16 task #2).

``read_concise`` is validated the same way roaring was: hand-built
golden word arrays pinned to the reference's expansion semantics
(extendedset/.../BitIterator.java:208-281), plus a seeded property
sweep against a faithful test-side port of the reference's WRITER
(ConciseSet.java:433 append / :492 appendLiteral / :543 appendFill —
the exact ascending-add path Druid's indexer uses to build null
bitmaps), so the decoder and the model are independent codebases
meeting on the wire format.
"""

from __future__ import annotations

import json
import random
import struct

import pytest

from apache_druid_spark.ingest.segment import (
    DruidSegmentError, read_concise,
)

ALL_ZEROS = 0x80000000  # literal word, no bits set
ALL_ONES = 0xFFFFFFFF
SEQ_BIT = 0x40000000
U32 = 0xFFFFFFFF


def _ntz(w: int) -> int:
    """Integer.numberOfTrailingZeros for a 32-bit word."""
    w &= U32
    return (w & -w).bit_length() - 1 if w else 32


def _one_bit(w: int) -> bool:
    return w != 0 and (w & (w - 1)) == 0


class _ConciseWriter:
    """Faithful port of the reference's append-only build path
    (ConciseSet.java append/appendLiteral/appendFill, simulateWAH
    false). Positions MUST be added in strictly ascending order —
    exactly how a null bitmap is built during indexing."""

    def __init__(self):
        self.words: list[int] = []
        self.last = -1

    def add(self, i: int) -> None:
        assert i > self.last, "ascending adds only"
        if not self.words:
            zero_blocks = i // 31
            if zero_blocks == 1:
                self.words.append(ALL_ZEROS)
            elif zero_blocks > 1:
                self.words.append(zero_blocks - 1)
            self.words.append((ALL_ZEROS | (1 << (i % 31))) & U32)
            self.last = i
            return
        bit = self.last % 31 + i - self.last
        if bit >= 31:
            zero_blocks = bit // 31 - 1
            bit %= 31
            if zero_blocks > 0:
                self._append_fill(zero_blocks, 0)
            self._append_literal((ALL_ZEROS | (1 << bit)) & U32)
        else:
            self.words[-1] = (self.words[-1] | (1 << bit)) & U32
            if self.words[-1] == ALL_ONES:
                self.words.pop()
                self._append_literal(ALL_ONES)
        self.last = i

    def _append_literal(self, word: int) -> None:
        w = self.words
        if len(w) == 1 and word == ALL_ZEROS and w[0] == 0x01FFFFFF:
            return
        if not w:
            w.append(word)
            return
        lw = w[-1]
        if word == ALL_ZEROS:
            if lw == ALL_ZEROS:
                w[-1] = 1
            elif (lw & 0xC0000000) == 0:  # zero sequence
                w[-1] += 1
            elif _one_bit(lw & 0x7FFFFFFF) and (lw & 0x80000000):
                w[-1] = (1 | ((1 + _ntz(lw)) << 25)) & U32
            else:
                w.append(word)
        elif word == ALL_ONES:
            if lw == ALL_ONES:
                w[-1] = SEQ_BIT | 1
            elif (lw & 0xC0000000) == SEQ_BIT:  # one sequence
                w[-1] += 1
            elif (lw & 0x80000000) and _one_bit((~lw) & U32):
                w[-1] = (SEQ_BIT | 1
                         | ((1 + _ntz((~lw) & U32)) << 25)) & U32
            else:
                w.append(word)
        else:
            w.append(word)

    def _append_fill(self, length: int, fill_type: int) -> None:
        assert length > 0
        fill_type &= SEQ_BIT
        if length == 1:
            self._append_literal(
                ALL_ZEROS if fill_type == 0 else ALL_ONES)
            return
        w = self.words
        if not w:
            w.append(fill_type | (length - 1))
            return
        lw = w[-1]
        if lw & 0x80000000:  # literal
            if fill_type == 0 and lw == ALL_ZEROS:
                w[-1] = length
            elif fill_type == SEQ_BIT and lw == ALL_ONES:
                w[-1] = SEQ_BIT | length
            elif fill_type == 0 and _one_bit(lw & 0x7FFFFFFF):
                w[-1] = (length | ((1 + _ntz(lw)) << 25)) & U32
            elif fill_type == SEQ_BIT and _one_bit((~lw) & U32):
                w[-1] = (SEQ_BIT | length
                         | ((1 + _ntz((~lw) & U32)) << 25)) & U32
            else:
                w.append(fill_type | (length - 1))
        else:
            if (lw & 0xC0000000) == fill_type:
                w[-1] += length
            else:
                w.append(fill_type | (length - 1))

    def to_bytes(self) -> bytes:
        # ImmutableConciseSet.toBytes: the raw big-endian word array
        return b"".join(struct.pack(">I", x & U32) for x in self.words)


def _words_bytes(words) -> bytes:
    return b"".join(struct.pack(">I", w & U32) for w in words)


# -- golden word arrays (expansion semantics pinned to BitIterator) ---------


def test_empty_blob():
    assert read_concise(b"").tolist() == []


def test_single_literal():
    # literal with bits 0, 3, 30
    w = ALL_ZEROS | 1 | (1 << 3) | (1 << 30)
    assert read_concise(_words_bytes([w])).tolist() == [0, 3, 30]


def test_zero_sequence_plain_then_literal():
    # 0x00000004: zero seq, no flip, 5 blocks of 31 zeros; then
    # literal bit 1 → position 5*31 + 1 = 156
    out = read_concise(_words_bytes([0x00000004, ALL_ZEROS | 2]))
    assert out.tolist() == [156]


def test_zero_sequence_with_flipped_bit():
    # 0x02000004: flip=((w&0x3FFFFFFF)>>25)-1 = 0 → position 0 set,
    # 5 blocks zeros otherwise (BitIterator
    # literalAndZeroFillResetZeroSequence)
    out = read_concise(_words_bytes([0x02000004, ALL_ZEROS | 1]))
    assert out.tolist() == [0, 155]


def test_one_sequence_plain():
    # 0x40000001: one seq, 2 blocks → positions 0..61
    out = read_concise(_words_bytes([0x40000001]))
    assert out.tolist() == list(range(62))


def test_one_sequence_with_flipped_bit():
    # 0x42000004 (the dirty one-fill of testWordIteratorNext /
    # testCompactOneLitDirtyOneFill): flip=0 → position 0 UNSET,
    # 5 blocks of ones otherwise → 1..154
    out = read_concise(_words_bytes([0x42000004]))
    assert out.tolist() == list(range(1, 155))


def test_one_sequence_flip_mid_block():
    # flip=17 → (17+1)<<25 | SEQ | count 1 → positions 0..61 minus 17
    w = SEQ_BIT | (18 << 25) | 1
    out = read_concise(_words_bytes([w]))
    assert out.tolist() == [i for i in range(62) if i != 17]


def test_literal_after_one_sequence_offsets():
    # one seq 1 block (via writer path it'd compact, but raw words
    # are legal): 0x40000000 is count+1=1 block of ones → 0..30,
    # then literal bit 0 → 31
    out = read_concise(_words_bytes([0x40000000, ALL_ZEROS | 1]))
    assert out.tolist() == list(range(31)) + [31]


def test_truncated_blob_is_loud():
    with pytest.raises(DruidSegmentError, match="32-bit"):
        read_concise(b"\x01\x02\x03")


# -- writer-model cross-validation ------------------------------------------


def _roundtrip(positions):
    wr = _ConciseWriter()
    for p in positions:
        wr.add(p)
    got = read_concise(wr.to_bytes())
    assert got.tolist() == list(positions), (
        f"decode mismatch for {len(positions)} positions; words="
        f"{[hex(w) for w in wr.words[:8]]}...")


def test_writer_examples_from_reference_tests():
    # the shapes ImmutableConciseSetTest builds via ConciseSet.add
    _roundtrip([33, 100000])          # testUnion1 set1
    _roundtrip([34, 200000])          # testUnion2 set2
    _roundtrip(list(range(62, 10001)))   # testUnion3 set1
    _roundtrip(list(range(63, 10002)))   # testUnion3 set2
    _roundtrip([0])
    _roundtrip([30])
    _roundtrip([31])
    _roundtrip([62])
    _roundtrip(list(range(31)))       # exactly one full literal
    _roundtrip(list(range(32)))       # full block + 1


def test_property_sweep_seeded():
    """120 seeded cases across the shapes null bitmaps take: sparse
    singletons, dense runs (all-ones compaction), single-bit blocks
    (flip-bit compaction), long gaps (zero fills), and mixes."""
    rng = random.Random(0xC01)  # deterministic
    for case in range(120):
        shape = case % 5
        pos: set[int] = set()
        if shape == 0:  # sparse
            n = rng.randrange(1, 60)
            pos = {rng.randrange(0, 500_000) for _ in range(n)}
        elif shape == 1:  # dense runs
            for _ in range(rng.randrange(1, 6)):
                s = rng.randrange(0, 100_000)
                pos.update(range(s, s + rng.randrange(1, 400)))
        elif shape == 2:  # single-bit blocks far apart
            for _ in range(rng.randrange(1, 20)):
                pos.add(rng.randrange(0, 40) * 31
                        + rng.randrange(0, 31)
                        + rng.randrange(0, 30) * 31 * 64)
        elif shape == 3:  # long gap then dense tail
            s = rng.randrange(1_000_000, 3_000_000)
            pos.update(range(s, s + rng.randrange(40, 200)))
            if rng.random() < 0.5:
                pos.add(rng.randrange(0, 31))
        else:  # mixed
            for _ in range(rng.randrange(2, 8)):
                s = rng.randrange(0, 200_000)
                pos.update(range(s, s + rng.randrange(1, 80)))
            pos.update(rng.randrange(0, 200_000)
                       for _ in range(rng.randrange(0, 30)))
        _roundtrip(sorted(pos))


def test_full_prefix_run():
    # 0..6199: compacts to a single one-sequence — the all-null-
    # prefix shape
    _roundtrip(list(range(6200)))


def test_alternating_block_parity():
    # every even position of 4 blocks — incompressible literals
    _roundtrip([i for i in range(124) if i % 2 == 0])


# -- end-to-end: longV2 column with CONCISE nulls ---------------------------


from segment_format import (
    generic_indexed_v1 as _generic_indexed_v1,
)


def test_longv2_column_with_concise_nulls():
    """The migration shape the r16 verdict named: a V2 numeric column
    written under the concise serde now decodes (was a named loud)."""
    from apache_druid_spark.ingest.segment import read_column

    desc = json.dumps({"valueType": "LONG", "hasMultipleValues": False,
                       "parts": [{"type": "longV2",
                                  "byteOrder": "LITTLE_ENDIAN"}]}) \
        .encode()
    vals = [10, 0, 30, 0, 50]
    chunk = b"".join(struct.pack("<q", v) for v in vals)
    longs = (b"\x02" + struct.pack(">ii", len(vals), 8) + b"\xff"
             + _generic_indexed_v1([chunk]))
    wr = _ConciseWriter()
    wr.add(1)
    wr.add(3)
    nulls = wr.to_bytes()
    part = struct.pack(">i", len(longs)) + longs \
        + struct.pack(">i", len(nulls)) + nulls
    blob = struct.pack(">i", len(desc)) + desc + part
    col = read_column("m", blob, "concise")
    assert col["values"].tolist() == [10, None, 30, None, 50]


def test_unknown_bitmap_serde_is_loud():
    from apache_druid_spark.ingest.segment import read_column

    desc = json.dumps({"valueType": "LONG", "hasMultipleValues": False,
                       "parts": [{"type": "longV2",
                                  "byteOrder": "LITTLE_ENDIAN"}]}) \
        .encode()
    chunk = struct.pack("<q", 7)
    longs = (b"\x02" + struct.pack(">ii", 1, 8) + b"\xff"
             + _generic_indexed_v1([chunk]))
    nulls = b"\x01\x02\x03\x04"
    part = struct.pack(">i", len(longs)) + longs \
        + struct.pack(">i", len(nulls)) + nulls
    blob = struct.pack(">i", len(desc)) + desc + part
    with pytest.raises(DruidSegmentError, match="unknown null-bitmap"):
        read_column("m", blob, "wah")


def test_corrupt_huge_sequence_is_loud():
    """r17 review #4: a damaged one-sequence word with a huge block
    count must raise, not materialize gigabytes."""
    # one-seq, count = 0x01FFFFFF -> 2^25 blocks ~ 1.04e9 positions
    w = struct.pack(">I", 0x40000000 | 0x01FFFFFF)
    with pytest.raises(DruidSegmentError, match="plausible"):
        read_concise(w, max_rows=1000)
    # two of them exceed even the format's own MAX_ALLOWED_INTEGER
    with pytest.raises(DruidSegmentError, match="plausible"):
        read_concise(w + w)


def test_max_rows_slack_allows_legit_padding():
    # last set bit at row 999 of a 1000-row segment: zero-fill +
    # literal spans to the block boundary — within the slack
    wr = _ConciseWriter()
    wr.add(999)
    assert read_concise(wr.to_bytes(),
                        max_rows=1000).tolist() == [999]
