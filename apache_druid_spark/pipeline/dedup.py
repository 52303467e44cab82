"""Document deduplication at corpus scale.

Four strategies, cheapest first:

  exact_dedup        one shuffle on a 128-bit content hash
  simhash            near-dup via 64-bit locality-sensitive fingerprint
  minhash_lsh_pairs  shingle MinHash + banded LSH candidate pairs
  ngram_jaccard_pairs exact Jaccard on shingle sets (verification pass)

Scale notes (the whole point):
  * Shingling/hashing are built-in expressions (md5/split/transform) —
    whole-stage codegen, no Python.
  * Candidate generation is a groupBy/join on (band, hash) buckets —
    work is proportional to bucket collisions, never |docs|^2.
  * MinHash here takes the lexicographic MIN of salted md5 hex digests
    per shingle set — same guarantees as integer minhash, and exactly
    reproducible in any engine with md5() (DuckDB oracle parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col):
    """Whitespace tokenization with empty-token removal."""
    return F.filter(F.split(text_col, r"\s+"), lambda t: t != "")


def _shingles(text_col, k: int):
    """k-token shingles as strings: transform over token index range."""
    toks = _tokens(text_col)
    n = F.size(toks)
    return F.when(n < k, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: hash-groupBy on md5(text); survivor = min(id).
    One shuffle keyed on the hash — at 100 TB the hash (16 bytes) is the
    shuffle payload, not the document."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
          .groupBy("content_hash")
          .agg(F.min(id_col).alias("survivor_id"),
               F.count(F.lit(1)).alias("dup_count"))
    )


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 16,
                       shingle_k: int = 3) -> DataFrame:
    """Per-doc MinHash signature: for salt i, sig_i = min(md5(i||shingle)).

    array_min over a transform — zero shuffles to build signatures;
    each doc is processed where it lives."""
    sh = _shingles(F.col(text_col), shingle_k)
    sig = F.array(*[
        F.array_min(F.transform(sh, lambda s, i=i: F.md5(
            F.concat(F.lit(f"{i}|"), s))))
        for i in range(num_hashes)
    ])
    return df.select(F.col(id_col), sig.alias("minhash"))


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_hashes: int = 16,
                      bands: int = 4, shingle_k: int = 3) -> DataFrame:
    """Banded LSH candidate pairs: docs agreeing on any band of the
    signature. rows/bands/hash-join only — never an all-pairs product.
    Returns distinct (id_a < id_b) candidate pairs."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    banded = sigs.select(
        F.col(id_col),
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *[
                    F.col("minhash")[b * rows_per_band + r]
                    for r in range(rows_per_band)
                ])).alias("bucket"),
            )
            for b in range(bands)
        ])).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(right, [F.col(f"l.band") == F.col("r.band"),
                          F.col(f"l.bucket") == F.col("r.bucket"),
                          F.col(f"l.{id_col}") < F.col(f"r.{id_col}")])
            .select(F.col(f"l.{id_col}").alias("id_a"),
                    F.col(f"r.{id_col}").alias("id_b"))
            .distinct()
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 32) -> DataFrame:
    """SimHash fingerprint: per token take `bits` bits of md5; each bit
    votes +1/-1; fingerprint bit = sign of the vote sum. Near-dups have
    small Hamming distance. Pure expressions: the token hash is
    conv(md5-hex-prefix, 16, 10) and bit votes are shifts/masks."""
    toks = _tokens(F.col(text_col))
    # hash every token ONCE (transform), then fold bit votes over the
    # long hashes — 1 md5 per token, not `bits` md5s per token
    hashes = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"))

    def vote(i: int):
        def step(acc, h):
            on = F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1
            return acc + F.when(on, F.lit(1)).otherwise(F.lit(-1))
        return F.aggregate(hashes, F.lit(0), step)

    bit_votes = [vote(i) for i in range(bits)]
    fp = None
    for i, v in enumerate(bit_votes):
        bit = F.when(v > 0, F.lit(2 ** i)).otherwise(F.lit(0)).cast("long")
        fp = bit if fp is None else (fp + bit)
    return df.select(F.col(id_col), fp.alias("simhash"))


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", shingle_k: int = 3,
                        threshold: float = 0.8,
                        max_shingle_freq: int = 1000) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing >=1 shingle.

    Inverted-index join: explode distinct shingles, drop ultra-common
    shingles (stop-shingles would create quadratic buckets), self-join
    on shingle, count shared, then |A u B| = |A| + |B| - shared.
    This is the exact verification pass to run AFTER minhash_lsh_pairs
    at full scale; on its own it is fine up to ~10M docs."""
    sh = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(_shingles(F.col(text_col), shingle_k))
                  ).alias("shingle"),
    )
    # shingle doc-frequency cap
    freq_ok = (sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
                 .filter(F.col("df") <= max_shingle_freq)
                 .select("shingle"))
    sh = sh.join(F.broadcast(freq_ok), "shingle")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(b, [F.col("a.shingle") == F.col("b.shingle"),
                   F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
         .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                  F.col(f"b.{id_col}").alias("id_b"))
         .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    out = (
        shared.join(sa, F.col("id_a") == F.col(f"sa.{id_col}"))
              .join(sb, F.col("id_b") == F.col(f"sb.{id_col}"))
              .select(
                  "id_a", "id_b",
                  (F.col("shared") /
                   (F.col("sa.set_size") + F.col("sb.set_size") - F.col("shared"))
                   ).alias("jaccard"))
    )
    return out.filter(F.col("jaccard") >= threshold)
