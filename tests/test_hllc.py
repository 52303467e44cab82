"""Legacy HyperLogLogCollector wire support (ingest/hllc.py).

Ports the reference's own verification:
- HyperLogLogCollectorTest.testEstimation — 13 BIT-EXACT estimate pins
  over a replicated java.util.Random(0) stream hashed with
  murmur3_128, through 2,000,000 adds (register offset reaches 7 and
  the overflow slot engages along the way)
- testFoldWithDifferentOffsets1/2, testSparseFoldWithDifferentOffsets1,
  testFoldWithUpperNibbleTriggersOffsetChange — wire-form pins of the
  offset-alignment fold mechanics
- CalciteJoinQueryTest:1126's pinned COMPLEX literal "AQAAAEAAAA=="
  (the collector of one empty-string add — murmur3_128("") is all
  zeros, rho 64 lands in the overflow slot) — reproduced from first
  principles and estimated to the reference's 0.0
- murmur3_x64_128 parity against the JVM's own Guava implementation

plus the Spark-side readers (with_hllc_estimate / hllc_rollup) against
driver-side ground truth.

testFoldWithArbitraryInitialPositions is not ported: it exercises
ByteBuffer position/limit mechanics that a bytes-in/bytes-out API does
not have.
"""

from __future__ import annotations

import base64
import random
import struct

import pytest
from pyspark.sql import functions as F

from apache_druid_spark.ingest.hllc import (
    HEADER_NUM_BYTES, HllcCollector, collector_of, estimate_bytes,
    hash_value, hllc_rollup, murmur3_x64_128, with_hllc_estimate)


class JavaRandom:
    """java.util.Random LCG replica (public contract: seed scramble
    0x5DEECE66D, 48-bit state, nextLong = (next(32) << 32) + next(32)
    with signed 32-bit halves)."""

    def __init__(self, seed: int):
        self.seed = (seed ^ 0x5DEECE66D) & ((1 << 48) - 1)

    def _next(self, bits: int) -> int:
        self.seed = (self.seed * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
        return self.seed >> (48 - bits)

    def next_long(self) -> int:
        hi = self._next(32)
        lo = self._next(32)
        hi_s = hi - (1 << 32) if hi >= (1 << 31) else hi
        lo_s = lo - (1 << 32) if lo >= (1 << 31) else lo
        return ((hi_s << 32) + lo_s) & 0xFFFFFFFFFFFFFFFF


def _nnz_byte(b: int) -> int:
    return (1 if b & 0x0F else 0) + (1 if b & 0xF0 else 0)


def make_collector_buffer(offset: int, initial_bytes, remaining: int) -> bytes:
    """HyperLogLogCollectorTest.makeCollectorBuffer(:484): a dense V1
    blob with the given register offset, leading payload bytes, and a
    fill byte; numNonZero computed like computeNumNonZero."""
    if isinstance(initial_bytes, int):
        initial_bytes = bytes([initial_bytes])
    initial_bytes = bytes(initial_bytes)
    nnz = sum(_nnz_byte(b) for b in initial_bytes) \
        + (1024 - len(initial_bytes)) * _nnz_byte(remaining)
    return struct.pack(">BBhBh", 1, offset, nnz, 0, 0) \
        + initial_bytes + bytes([remaining]) * (1024 - len(initial_bytes))


# -- murmur3 parity --------------------------------------------------------


def test_murmur3_matches_guava(spark):
    hf = spark._jvm.com.google.common.hash.Hashing.murmur3_128()
    rnd = random.Random(42)
    cases = [b"", b"a", b"abc", b"hello world", b"0123456789abcdef",
             b"0123456789abcdefX", bytes(range(256))]
    cases += [bytes(rnd.randrange(256) for _ in range(rnd.randrange(1, 64)))
              for _ in range(40)]
    for case in cases:
        assert murmur3_x64_128(case) == bytes(hf.hashBytes(case).asBytes())


def test_murmur3_empty_is_zero():
    assert murmur3_x64_128(b"") == bytes(16)


# -- the reference's own estimate pins, bit-exact --------------------------


def test_estimation_bit_exact_2m():
    """HyperLogLogCollectorTest.testEstimation (:587): exact doubles
    at 13 cardinalities through 2M adds of Random(0) longs hashed with
    murmur3_128 (Guava hashLong = the little-endian 8 bytes)."""
    vals = [10, 20, 50, 100, 1000, 2000, 5000, 10000, 20000, 50000,
            100000, 1000000, 2000000]
    expected = [11.029647221949576, 21.108407720752034,
                51.64575281885815, 100.42231726408892,
                981.8579991802412, 1943.1337257462792,
                4946.192042635218, 9935.088157579434,
                20366.1486889433, 49433.56029693898,
                100615.26273314281, 980831.624899156000,
                1982408.2608981386]
    r = JavaRandom(0)
    c = HllcCollector()
    idx = 0
    for i in range(vals[-1]):
        c.add_hash(murmur3_x64_128(struct.pack("<Q", r.next_long())))
        if idx < len(vals) and i == vals[idx]:
            assert c.estimate() == expected[idx], (vals[idx], c.estimate())
            idx += 1
    assert c.estimate() == expected[idx]
    # the stream drove the deep-state machinery the small tests can't
    assert c.offset >= 5
    assert c.max_overflow_value > 15


# -- wire-form fold pins ----------------------------------------------------


def test_fold_with_different_offsets_1():
    """testFoldWithDifferentOffsets1 (:277), both fold orders."""
    bigger = make_collector_buffer(1, 0x00, 0x11)
    smaller = make_collector_buffer(0, 0x20, 0x00)
    want = struct.pack(">BBhBh", 1, 1, 2047, 0, 0) \
        + b"\x10" + b"\x11" * 1023
    for order in ((bigger, smaller), (smaller, bigger)):
        c = HllcCollector()
        for blob in order:
            c.fold(HllcCollector.from_bytes(blob))
        assert c.to_bytes() == want, order


def test_fold_with_different_offsets_2():
    """testFoldWithDifferentOffsets2 (:382): the fold saturates all
    2048 buckets, bumps the offset to 2, and decrements every nibble
    to zero — the wire form collapses to a bare header."""
    bigger = make_collector_buffer(1, 0x01, 0x11)
    smaller = make_collector_buffer(0, 0x20, 0x00)
    want = struct.pack(">BBhBh", 1, 2, 0, 0, 0)
    for order in ((bigger, smaller), (smaller, bigger)):
        c = HllcCollector()
        for blob in order:
            c.fold(HllcCollector.from_bytes(blob))
        assert c.to_bytes() == want, order


def test_sparse_fold_with_different_offsets_1():
    """testSparseFoldWithDifferentOffsets1 (:446): folding a SPARSE
    wire form through the offset-alignment path."""
    bigger = make_collector_buffer(1, bytes([0x11, 0x10]), 0x11)
    sparse = HllcCollector.from_bytes(
        make_collector_buffer(0, bytes([0x00, 0x02]), 0x00)).to_bytes()
    # sanity: it IS sparse — one (position, byte) triple
    assert len(sparse) == HEADER_NUM_BYTES + 3
    want = struct.pack(">BBhBh", 1, 2, 0, 0, 0)
    for order in ((bigger, sparse), (sparse, bigger)):
        c = HllcCollector()
        for blob in order:
            c.fold(HllcCollector.from_bytes(blob))
        assert c.to_bytes() == want, order


def test_fold_with_upper_nibble_triggers_offset_change():
    """testFoldWithUpperNibbleTriggersOffsetChange (:414): the merge
    fills the last zero nibble, the offset bumps mid-fold, and the
    other collector's (garbage-filled) overflow slot rides through
    add()'s overflow path without touching a register."""
    b1 = bytearray(b"\x11" * (HEADER_NUM_BYTES + 1024))
    b1[0:7] = struct.pack(">BBhBh", 1, 0, 2047, 0, 0)
    b1[HEADER_NUM_BYTES] = 0x01
    b2 = bytearray(b"\x11" * (HEADER_NUM_BYTES + 1024))
    b2[0] = 1
    b2[1] = 0
    struct.pack_into(">h", b2, 2, 2048)
    # bytes 4-6 stay 0x11: maxOverflowValue 0x11, register 0x1111 —
    # exactly what the reference test constructs
    c = HllcCollector.from_bytes(bytes(b1))
    c.fold(HllcCollector.from_bytes(bytes(b2)))
    out = c.to_bytes()
    assert out[:4] == struct.pack(">BBh", 1, 1, 0)
    assert len(out) == HEADER_NUM_BYTES  # empty sparse payload
    assert c.max_overflow_value == 0x11
    assert c.max_overflow_register == 0x1111


# -- the CalciteJoinQueryTest COMPLEX literal -------------------------------


def test_calcite_join_wire_literal_roundtrip():
    """CalciteJoinQueryTest.java:1126 pins unique_dim1's wire form for
    the dim1='' row as "AQAAAEAAAA==". murmur3_128('') is all zeros,
    so rho=64 lands in the overflow slot with an otherwise empty
    collector — reproduced from first principles, and its estimate is
    the reference's 0.0 (the sparse estimate path never applies an
    overflow with no pair at its position)."""
    c = HllcCollector()
    c.add_value("")
    assert base64.b64encode(c.to_bytes()).decode() == "AQAAAEAAAA=="
    blob = base64.b64decode("AQAAAEAAAA==")
    assert estimate_bytes(blob) == 0.0
    # round trip preserves the wire form
    assert HllcCollector.from_bytes(blob).to_bytes() == blob


# -- semantic invariants ----------------------------------------------------


def test_fold_equals_combined():
    a = collector_of(str(i) for i in range(1000))
    b = collector_of(str(i) for i in range(500, 1500))
    combined = collector_of(str(i) for i in range(1500))
    assert a.fold(b).estimate() == combined.estimate()


def test_accuracy_within_5_pct():
    # HyperLogLogCollectorTest:140's contract at n=5000
    est = collector_of(str(i) for i in range(5000)).estimate()
    assert abs(est - 5000) < 5000 * 0.05


def test_wire_round_trips():
    small = collector_of(str(i) for i in range(20))
    assert HllcCollector.from_bytes(small.to_bytes()).to_bytes() \
        == small.to_bytes()
    big = collector_of(str(i) for i in range(3000))
    assert len(big.to_bytes()) == HEADER_NUM_BYTES + 1024  # dense
    assert HllcCollector.from_bytes(big.to_bytes()).to_bytes() \
        == big.to_bytes()


def test_version_zero_rejected():
    with pytest.raises(NotImplementedError, match="version"):
        HllcCollector.from_bytes(bytes([0x0] * 9))


def test_hash_value_strings_as_utf8():
    assert hash_value("abc") == murmur3_x64_128("abc".encode())


# -- Spark-side readers ------------------------------------------------------


@pytest.fixture(scope="module")
def legacy_df(spark):
    """A 'legacy segment': per (event_type, hour-ish bucket) collector
    blobs over synthetic user ids, exactly what a Druid hyperUnique
    COMPLEX column holds after rollup."""
    rows = []
    truth = {}
    for et in ("click", "view", "purchase"):
        for bucket in range(4):
            users = [f"{et}-u{i}" for i in range(bucket * 7,
                                                 bucket * 7 + 25)]
            truth.setdefault(et, set()).update(users)
            rows.append((et, bucket,
                         bytearray(collector_of(users).to_bytes())))
    df = spark.createDataFrame(
        rows, "event_type string, bucket int, uniq_state binary")
    df.truth = truth  # stashed for tests
    return df


def test_with_hllc_estimate_matches_driver(spark, legacy_df):
    got = {(r["event_type"], r["bucket"]): r["est"]
           for r in with_hllc_estimate(
               legacy_df, "uniq_state", "est").collect()}
    for r in legacy_df.collect():
        want = estimate_bytes(bytes(r["uniq_state"]))
        assert got[(r["event_type"], r["bucket"])] == want


def test_hllc_rollup_blobs_matches_driver_fold(spark, legacy_df):
    out = {r["event_type"]: r["uniq"]
           for r in hllc_rollup(legacy_df, ["event_type"], "uniq_state",
                                mode="blobs", out_col="uniq",
                                finalize=True).collect()}
    for et in ("click", "view", "purchase"):
        blobs = [bytes(r["uniq_state"]) for r in legacy_df.collect()
                 if r["event_type"] == et]
        c = HllcCollector()
        for b in blobs:
            c.fold(HllcCollector.from_bytes(b))
        assert out[et] == c.estimate()
        # ~46 distinct per type; HLL at 2048 buckets is near-exact here
        n_true = len(legacy_df.truth[et])
        assert abs(out[et] - n_true) < n_true * 0.05


def test_hllc_rollup_partial_equals_unpartial(spark, legacy_df):
    a = {r["event_type"]: r["uniq"]
         for r in hllc_rollup(legacy_df, ["event_type"], "uniq_state",
                              out_col="uniq", finalize=True,
                              partial=True).collect()}
    b = {r["event_type"]: r["uniq"]
         for r in hllc_rollup(legacy_df, ["event_type"], "uniq_state",
                              out_col="uniq", finalize=True,
                              partial=False).collect()}
    assert a == b


def test_hllc_rollup_values_builds_state(spark):
    df = spark.createDataFrame(
        [("a", f"u{i % 40}") for i in range(200)]
        + [("b", f"v{i}") for i in range(10)],
        "g string, user string")
    out = {r["g"]: r for r in hllc_rollup(
        df, ["g"], "user", mode="values", out_col="state",
        finalize=False).collect()}
    est_a = estimate_bytes(bytes(out["a"]["state"]))
    assert abs(est_a - 40) < 40 * 0.05
    # state equals a driver-built collector over the same values
    want = collector_of(f"u{i % 40}" for i in range(200)).to_bytes()
    assert bytes(out["a"]["state"]) == want


def test_hllc_rollup_state_then_blob_requery(spark, legacy_df):
    """The migration shape: fold stored state WITHOUT finalizing,
    publish, then re-query the published state — estimates agree with
    folding the original blobs directly."""
    staged = hllc_rollup(legacy_df, ["event_type"], "uniq_state",
                         out_col="state", finalize=False)
    requery = {r["event_type"]: r["uniq"]
               for r in hllc_rollup(staged, ["event_type"], "state",
                                    out_col="uniq",
                                    finalize=True).collect()}
    direct = {r["event_type"]: r["uniq"]
              for r in hllc_rollup(legacy_df, ["event_type"],
                                   "uniq_state", out_col="uniq",
                                   finalize=True).collect()}
    assert requery == direct


def test_hash_value_int_stringifies():
    # an int must hash like its string rendering (a Druid string
    # dimension), never bytes(n) — which is a zero-filled buffer
    assert hash_value(42) == murmur3_x64_128(b"42")
    assert hash_value(42) == hash_value("42")


# -- native query integration ------------------------------------------------


@pytest.fixture(scope="module")
def legacy_reg(spark, legacy_df):
    from apache_druid_spark.model.datasource import DatasourceRegistry

    r = DatasourceRegistry(spark)
    r.register("legacy_seg", legacy_df.withColumn(
        "__time", F.lit("2001-01-01 00:00:00").cast("timestamp")))
    return r


def test_native_groupby_legacy_hyperunique(spark, legacy_reg, legacy_df):
    """A NATIVE groupBy over a real legacy segment's hyperUnique
    column: {"type": "hyperUnique", "legacy": true} reroutes through
    the Arrow HLLC fold and joins back on the grouping keys."""
    from apache_druid_spark.plans.compiler import compile_query

    out = compile_query({
        "queryType": "groupBy", "dataSource": "legacy_seg",
        "granularity": "all", "dimensions": ["event_type"],
        "aggregations": [
            {"type": "count", "name": "rows"},
            {"type": "hyperUnique", "name": "uniq",
             "fieldName": "uniq_state", "legacy": True}],
    }, legacy_reg)
    got = {r["event_type"]: r for r in out.collect()}
    for et, users in legacy_df.truth.items():
        c = HllcCollector()
        for r in legacy_df.collect():
            if r["event_type"] == et:
                c.fold(HllcCollector.from_bytes(bytes(r["uniq_state"])))
        assert got[et]["uniq"] == c.estimate()
        assert got[et]["rows"] == 4
        assert abs(got[et]["uniq"] - len(users)) < len(users) * 0.05


def test_native_groupby_legacy_grand_total(spark, legacy_reg, legacy_df):
    from apache_druid_spark.plans.compiler import compile_query

    out = compile_query({
        "queryType": "groupBy", "dataSource": "legacy_seg",
        "granularity": "all", "dimensions": [],
        "aggregations": [
            {"type": "hyperUnique", "name": "uniq",
             "fieldName": "uniq_state", "legacy": True}],
    }, legacy_reg).collect()
    assert len(out) == 1
    n_true = len(set().union(*legacy_df.truth.values()))
    assert abs(out[0]["uniq"] - n_true) < n_true * 0.05


def test_native_groupby_legacy_values_mode(spark, legacy_reg):
    """legacy=true over a RAW (non-binary) column hashes values with
    murmur3_128 like the reference's ingest-time hyperUnique metric."""
    from apache_druid_spark.model.datasource import DatasourceRegistry
    from apache_druid_spark.plans.compiler import compile_query

    r = DatasourceRegistry(spark)
    r.register("raw_vals", spark.createDataFrame(
        [("a", f"u{i % 30}") for i in range(300)], "g string, u string"))
    out = compile_query({
        "queryType": "groupBy", "dataSource": "raw_vals",
        "granularity": "all", "dimensions": ["g"],
        "aggregations": [{"type": "hyperUnique", "name": "uniq",
                          "fieldName": "u", "legacy": True}],
    }, r).collect()
    want = collector_of(f"u{i % 30}" for i in range(300)).estimate()
    assert out[0]["uniq"] == want


def test_native_timeseries_legacy_hyperunique(spark, legacy_reg,
                                              legacy_df):
    """timeseries + legacy hyperUnique (r16 — previously a loud
    NotImplementedError): the dashboards' unique-users-over-time
    shape. Grand total (granularity all) folds every blob."""
    from apache_druid_spark.plans.compiler import compile_query

    out = compile_query({
        "queryType": "timeseries", "dataSource": "legacy_seg",
        "granularity": "all",
        "aggregations": [
            {"type": "count", "name": "rows"},
            {"type": "hyperUnique", "name": "u",
             "fieldName": "uniq_state", "legacy": True}],
    }, legacy_reg).collect()
    assert len(out) == 1
    n_true = len(set().union(*legacy_df.truth.values()))
    assert abs(out[0]["u"] - n_true) < n_true * 0.05
    assert out[0]["rows"] == 12


def test_native_timeseries_legacy_bucketed(spark, legacy_reg,
                                           legacy_df):
    """Per-bucket timeseries: all legacy rows share one __time, so
    one hour bucket carries the full fold."""
    from apache_druid_spark.plans.compiler import compile_query

    out = compile_query({
        "queryType": "timeseries", "dataSource": "legacy_seg",
        "granularity": "hour",
        "aggregations": [{"type": "hyperUnique", "name": "u",
                          "fieldName": "uniq_state", "legacy": True}],
    }, legacy_reg).collect()
    assert len(out) == 1
    n_true = len(set().union(*legacy_df.truth.values()))
    assert abs(out[0]["u"] - n_true) < n_true * 0.05
    assert str(out[0]["__time"]).startswith("2001-01-01 00:00")


def test_native_topn_legacy_metric_ranks_on_fold(spark):
    """topN ORDERED BY the legacy hyperUnique estimate — the fold
    joins back before ranking, so 'top event types by unique users'
    ranks on the folded estimate (distinct cardinalities per type so
    the ranking is determined by the fold, not a tie-break)."""
    from apache_druid_spark.model.datasource import DatasourceRegistry
    from apache_druid_spark.plans.compiler import compile_query

    sizes = {"alpha": 80, "beta": 35, "gamma": 10}
    rows = []
    for et, n in sizes.items():
        for part in range(3):  # several blobs per type to fold
            users = [f"{et}-u{i}" for i in range(part, n, 3)]
            rows.append((et, bytearray(collector_of(users).to_bytes())))
    df = spark.createDataFrame(
        rows, "event_type string, uniq_state binary").withColumn(
        "__time", F.lit("2001-01-01 00:00:00").cast("timestamp"))
    reg = DatasourceRegistry(spark)
    reg.register("topn_legacy_seg", df)
    out = compile_query({
        "queryType": "topN", "dataSource": "topn_legacy_seg",
        "granularity": "all", "dimension": "event_type",
        "metric": "u", "threshold": 2,
        "aggregations": [
            {"type": "count", "name": "rows"},
            {"type": "hyperUnique", "name": "u",
             "fieldName": "uniq_state", "legacy": True}],
    }, reg).collect()
    assert [r["event_type"] for r in out] == ["alpha", "beta"]
    for r in out:
        n_true = sizes[r["event_type"]]
        assert abs(r["u"] - n_true) < max(2, n_true * 0.05)
        assert r["rows"] == 3


# -- vectorized batch paths ---------------------------------------------------


def test_murmur3_batch_identity():
    rnd = random.Random(7)
    from apache_druid_spark.ingest.hllc import murmur3_x64_128_batch

    cases = [bytes(rnd.randrange(256) for _ in range(rnd.randrange(0, 70)))
             for _ in range(500)]
    batch = murmur3_x64_128_batch(cases)
    for i, c in enumerate(cases):
        assert bytes(batch[i]) == murmur3_x64_128(c), (i, len(c))


def test_add_values_batch_exact_below_overflow():
    # no rho exceeds the window on this stream (P ~ n * 2^-15): the
    # batch path must be byte-identical to value-at-a-time adds
    vals = [f"user-{i}" for i in range(5000)]
    seq = collector_of(vals)
    batched = HllcCollector()
    batched.add_values_batch(vals)
    assert batched.to_bytes() == seq.to_bytes()
    assert batched.estimate() == seq.estimate()


def test_add_values_batch_deep_stream_within_tolerance():
    """The 2M testEstimation stream crosses the overflow band, where
    the reference's single overflow slot is ORDER-SENSITIVE (an early
    above-window rho is dropped if a bigger one lands before the
    offset rises) — the batch pre-reduction is a reordering, so pin a
    tight tolerance instead of equality and assert the state is still
    fully valid wire form."""
    r = JavaRandom(0)
    vals = [struct.pack("<Q", r.next_long()) for _ in range(200_000)]
    seq = HllcCollector()
    for v in vals:
        seq.add_hash(murmur3_x64_128(v))
    batched = HllcCollector()
    for i in range(0, len(vals), 50_000):  # Arrow-batch-sized chunks
        batched.add_values_batch(vals[i:i + 50_000])
    assert abs(batched.estimate() - seq.estimate()) \
        <= 0.005 * seq.estimate()
    rt = HllcCollector.from_bytes(batched.to_bytes())
    assert rt.to_bytes() == batched.to_bytes()
    # and the states FOLD like any two valid collectors
    seq.fold(batched)
    assert seq.estimate() > 0


# -- randomized property sweep (VERDICT r15 task #7) -------------------------
# The pinned vectors above are the reference's OWN test literals; this
# sweep defends the bit-exact claim on inputs the reference suite never
# exercised: random register states across the sparse<->dense boundary
# (128 non-zero registers), offset bumps, and the overflow slot.


def _random_state(rng) -> HllcCollector:
    """A random reachable collector state built through the public
    add() API: random (bucket, rho) pairs whose cardinality spans the
    sparse/dense boundary, with a slice of above-window rhos to
    exercise the single overflow slot; an occasional full-saturation
    prefix forces an offset bump."""
    c = HllcCollector()
    if rng.random() < 0.15:  # force >=1 offset bump: saturate all
        for b in range(2048):
            c.add(b, 1 + rng.randrange(3))
    n = rng.choice((1, 3, 40, 120, 127, 128, 129, 200, 500))
    for _ in range(n):
        bucket = rng.randrange(2048)
        if rng.random() < 0.05:  # above-window -> overflow slot
            c.add(bucket, c.offset + 16 + rng.randrange(40))
        else:
            c.add(bucket, 1 + rng.randrange(15))
    return c


def test_property_roundtrip_and_fold_sweep():
    """Seeded 300-case sweep: (a) to_bytes/from_bytes round-trips the
    FULL state field-for-field and the wire form is a fixed point;
    (b) folding two states via their wire blobs is byte-identical to
    folding the in-memory collectors (the migration invariant);
    (c) estimates stay finite and agree across the round trip."""
    import random

    rng = random.Random(20260816)
    states = [_random_state(rng) for _ in range(300)]
    for c in states:
        blob = c.to_bytes()
        rt = HllcCollector.from_bytes(blob)
        assert rt.offset == c.offset
        assert rt.num_non_zero == c.num_non_zero
        assert rt.max_overflow_value == c.max_overflow_value
        assert rt.max_overflow_register == c.max_overflow_register
        assert bytes(rt.regs) == bytes(c.regs)
        assert rt.to_bytes() == blob  # fixed point
        if c.num_non_zero < 128:  # sparse: padded Druid sizing
            assert len(blob) == 7 + 3 * c.num_non_zero
        else:
            assert len(blob) == 7 + 1024
        e = c.estimate()
        assert e >= 0 and e == rt.estimate()
    def clone(c: HllcCollector) -> HllcCollector:
        """Field-level copy — deliberately NOT via the wire form, so
        the wire-vs-live comparison below is a real invariant, not a
        tautology (r16 review finding)."""
        d = HllcCollector()
        d.offset = c.offset
        d.regs = bytearray(c.regs)
        d.num_non_zero = c.num_non_zero
        d.max_overflow_value = c.max_overflow_value
        d.max_overflow_register = c.max_overflow_register
        return d

    for i in range(0, 298, 2):
        a, b = states[i], states[i + 1]
        via_wire = HllcCollector.from_bytes(a.to_bytes()).fold(
            HllcCollector.from_bytes(b.to_bytes()))
        direct = clone(a).fold(clone(b))  # LIVE collectors
        assert bytes(via_wire.regs) == bytes(direct.regs)
        assert via_wire.to_bytes() == direct.to_bytes()
        assert via_wire.estimate() == direct.estimate()


def test_property_fold_matches_union_truth():
    """Seeded value-level sweep: fold(A, B) over real hashed streams
    estimates the UNION within sketch tolerance, and the fold of the
    wire forms equals the fold of the live collectors byte-for-byte
    (sparse and dense operands mixed)."""
    import random

    rng = random.Random(99)
    for case in range(30):
        na, nb = rng.choice((5, 60, 127, 129, 400, 3000)), \
            rng.choice((5, 60, 127, 129, 400, 3000))
        overlap = rng.randrange(min(na, nb) + 1)
        a_vals = [f"c{case}-a{i}" for i in range(na)]
        b_vals = [f"c{case}-a{i}" for i in range(overlap)] + \
            [f"c{case}-b{i}" for i in range(nb - overlap)]
        a, b = collector_of(a_vals), collector_of(b_vals)
        live = collector_of(a_vals).fold(collector_of(b_vals))
        wire = HllcCollector.from_bytes(a.to_bytes()).fold(
            HllcCollector.from_bytes(b.to_bytes()))
        assert wire.to_bytes() == live.to_bytes()
        n_union = len(set(a_vals) | set(b_vals))
        assert abs(live.estimate() - n_union) <= max(3, 0.1 * n_union)


def test_legacy_timeseries_postagg_over_estimate(spark, legacy_reg,
                                                 legacy_df):
    """Post-aggregators reference the folded legacy estimate (the
    join-back runs BEFORE apply_post_aggregations in all three query
    paths) — arithmetic over unique-users works in timeseries."""
    from apache_druid_spark.plans.compiler import compile_query

    out = compile_query({
        "queryType": "timeseries", "dataSource": "legacy_seg",
        "granularity": "all",
        "aggregations": [
            {"type": "count", "name": "rows"},
            {"type": "hyperUnique", "name": "u",
             "fieldName": "uniq_state", "legacy": True}],
        "postAggregations": [
            {"type": "arithmetic", "name": "rows_per_user", "fn": "/",
             "fields": [
                 {"type": "fieldAccess", "fieldName": "rows"},
                 {"type": "hyperUniqueCardinality", "fieldName": "u"},
             ]}],
    }, legacy_reg).collect()
    assert len(out) == 1
    assert abs(out[0]["rows_per_user"]
               - out[0]["rows"] / out[0]["u"]) < 1e-9


def test_legacy_global_fold_survives_empty_input(spark, legacy_reg):
    """r16 second-review: a filter matching ZERO rows must still
    return the engine's one-row global aggregate with estimate 0.0
    (applyInPandas yields no rows on empty input; a crossJoin used to
    annihilate the row, count included)."""
    from apache_druid_spark.plans.compiler import compile_query

    for qtype in ("timeseries", "groupBy"):
        q = {
            "queryType": qtype, "dataSource": "legacy_seg",
            "granularity": "all",
            "filter": {"type": "selector", "dimension": "event_type",
                       "value": "no-such-type"},
            "aggregations": [
                {"type": "count", "name": "rows"},
                {"type": "hyperUnique", "name": "u",
                 "fieldName": "uniq_state", "legacy": True}],
        }
        if qtype == "groupBy":
            q["dimensions"] = []
        out = compile_query(q, legacy_reg).collect()
        assert len(out) == 1, qtype
        assert out[0]["rows"] == 0
        assert out[0]["u"] == 0.0


def test_legacy_timeseries_grandtotal_only_legacy_agg(spark,
                                                      legacy_reg,
                                                      legacy_df):
    """r16 second-review: grandTotal with ONLY a legacy aggregator
    used to die on a schema mismatch (__ts_rows dropped from one
    union side)."""
    from apache_druid_spark.plans.compiler import compile_query

    out = compile_query({
        "queryType": "timeseries", "dataSource": "legacy_seg",
        "granularity": "hour",
        "context": {"grandTotal": True},
        "aggregations": [{"type": "hyperUnique", "name": "u",
                          "fieldName": "uniq_state", "legacy": True}],
    }, legacy_reg).collect()
    # one hour bucket + the grand-total row (null __time)
    assert len(out) == 2
    n_true = len(set().union(*legacy_df.truth.values()))
    for r in out:
        assert abs(r["u"] - n_true) < n_true * 0.05
    assert sum(1 for r in out if r["__time"] is None) == 1
