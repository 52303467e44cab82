"""Bloom filter build + membership test, Catalyst-only.

Reference: extensions-core/druid-bloom-filter — BloomKFilter built
client-side (or by the `bloom` aggregator), shipped serialized inside
the query, tested per-row by `BloomDimFilter` / SQL
`BLOOM_FILTER_TEST(expr, serialized)`.

Here the serialized form is a hex string of fixed-width 32-bit words
(8 hex chars each, m = len*4 bits). Membership hashing is
double-hashing over md5 (h1 = first 8 hex digits, h2 = next 8,
pos_i = (h1 + i*h2) mod m, k fixed at 3) — chosen because BOTH Spark
and DuckDB can evaluate it exactly in plain SQL, which makes the
filter oracle-checkable bit-for-bit. The test compiles to one inlined
boolean expression (no UDF): at scale it runs inside the scan's
WholeStageCodegen span like any other pushed predicate.

Build side: `bloom_build` is driver-side over a literal key list (the
reference's client-side BloomKFilter build); for building FROM a
DataFrame column at scale use `df.stat.bloomFilter` (JVM-side
aggregation) — that object's serialization is JVM-internal, so query
shipping uses this module's format.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

_K = 3  # fixed hash count; Druid sizes k from expectedEntries/fpp

_HEX = set("0123456789abcdef")


def validate_serialized(serialized: str) -> str:
    """Reject payloads that are not this module's hex-word wire format.

    The reference ships BloomKFilter as Murmur3-based base64 bytes
    (BloomKFilter.java serialization); feeding such a payload here
    would silently filter rows arbitrarily (conv() on base64 text
    yields garbage words). Hex charset + length % 8 == 0 cheaply
    distinguishes the two — raise rather than misinterpret."""
    s = str(serialized).lower()
    if not s or len(s) % 8 or not set(s) <= _HEX:
        raise ValueError(
            "bloom payload is not this engine's hex-word format (got "
            f"{len(s)} chars); reference base64 BloomKFilter payloads "
            "must be rebuilt with bloom_build()/the bloom aggregator")
    return s


def _hash_pair(value: str) -> tuple[int, int]:
    h = hashlib.md5(value.encode("utf-8")).hexdigest()
    return int(h[:8], 16), int(h[8:16], 16)


def bloom_build(values, m_bits: int = 1024) -> str:
    """Build the hex-serialized bloom over an iterable of values
    (driver-side, literal key list — the BloomKFilter client build)."""
    if m_bits % 32:
        raise ValueError("m_bits must be a multiple of 32")
    words = [0] * (m_bits // 32)
    for v in values:
        if v is None:
            continue
        h1, h2 = _hash_pair(str(v))
        for i in range(_K):
            pos = (h1 + i * h2) % m_bits
            words[pos // 32] |= 1 << (pos % 32)
    return "".join(f"{w:08x}" for w in words)


def bloom_contains(value, serialized: str) -> bool:
    """Pure-python reference test (for unit tests)."""
    m = len(serialized) * 4
    h1, h2 = _hash_pair(str(value))
    for i in range(_K):
        pos = (h1 + i * h2) % m
        word = int(serialized[(pos // 32) * 8:(pos // 32) * 8 + 8], 16)
        if not (word >> (pos % 32)) & 1:
            return False
    return True


def _hex2long_spark(expr: str, start: int, digits: int) -> str:
    return f"cast(conv(substr({expr}, {start}, {digits}), 16, 10) as bigint)"


def _hex2long_duckdb(expr: str, start: int, digits: int) -> str:
    e = f"substr({expr}, {start}, {digits})"
    return (f"CAST(list_sum(list_transform(generate_series(1, {digits}), "
            f"i -> (strpos('0123456789abcdef', substr({e}, i, 1)) - 1)"
            f" * CAST(power(16, {digits} - i) AS BIGINT))) AS BIGINT)")


def bloom_test_sql(x: str, bloom: str, dialect: str = "spark") -> str:
    """SQL boolean expression testing `x` against serialized bloom
    `bloom` (both SQL fragments). Identical integer math in both
    dialects — floor/power instead of shifts because DuckDB lacks
    64-bit shift ops and doubles are exact below 2^52 here."""
    if bloom.startswith("'") and bloom.endswith("'"):
        validate_serialized(bloom[1:-1])
    hx = _hex2long_spark if dialect == "spark" else _hex2long_duckdb
    m = f"(length({bloom}) * 4)"
    h1, h2 = hx(f"md5({x})", 1, 8), hx(f"md5({x})", 9, 8)
    mod = "pmod" if dialect == "spark" else "mod"
    checks = []
    for i in range(_K):
        pos = f"{mod}({h1} + {i} * {h2}, {m})"
        word = hx(bloom, f"CAST(floor({pos} / 32) AS INT) * 8 + 1", 8)
        checks.append(
            f"{mod}(CAST(floor({word} / power(2, {mod}({pos}, 32))) "
            f"AS BIGINT), 2) = 1")
    conj = " AND ".join(f"({c})" for c in checks)
    return f"(CASE WHEN {x} IS NULL THEN FALSE ELSE ({conj}) END)"


def bloom_test_column(col: Column, serialized: str) -> Column:
    """Catalyst predicate: does `col` (cast to string) hit the bloom?
    Used by the native `bloom` DimFilter (BloomDimFilter.java)."""
    serialized = validate_serialized(serialized)
    c = col.cast("string")
    m = len(serialized) * 4
    blit = F.lit(serialized)
    h1 = F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(F.md5(c), 9, 8), 16, 10).cast("bigint")
    out = c.isNotNull()
    for i in range(_K):
        pos = F.pmod(h1 + F.lit(i) * h2, F.lit(m))
        word = F.conv(
            F.substring(blit, (F.floor(pos / 32).cast("int") * 8 + 1), 8),
            16, 10).cast("bigint")
        bit = F.pmod(
            F.floor(word / F.pow(F.lit(2.0), F.pmod(pos, F.lit(32))))
            .cast("bigint"), F.lit(2))
        out = out & (bit == F.lit(1))
    return out
