"""Similarity search over embedding columns (array<float>).

  cosine_topk      exact brute force — one scan + TakeOrderedAndProject;
                   the right baseline and linearly scalable (each
                   partition keeps a k-heap, driver merges k*P rows)
  lsh_bucket_topk  random-hyperplane LSH: one scan computes sign-bit
                   buckets, candidates = vectors within a Hamming radius
                   of the query bucket, exact cosine re-rank on the
                   (tiny) candidate set

The hyperplanes are deterministic pseudo-random +-1 weights derived from
md5(f"{bit}-{dim}") so the same buckets can be computed in any engine
(or driver-side in numpy for the query vector)."""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apache_druid_spark.pipeline._util import parallelize_scan


def _dot_literal(vec_col, query: list[float]):
    """dot(vec, literal query) without UDFs — UNROLLED element
    arithmetic, not aggregate()/zip_with(): Spark's higher-order
    functions are CodegenFallback, so a HOF anywhere in the projection
    drops the whole stage to interpreted eval (measured 3-5x on these
    scans). The unrolled sum folds left-to-right from element 0 —
    bit-identical to the old aggregate() result. F.get is 0-based and
    yields NULL past the end, matching zip_with's null padding."""
    out = F.lit(0.0)  # seed 0.0 like aggregate() — keeps -0.0 edge
    for i, x in enumerate(query):
        out = out + F.get(vec_col, i).cast("double") * F.lit(float(x))
    return out


def _dot_literal_hof(vec_col, query: list[float]):
    """HOF (aggregate/zip_with) dot — used ONLY inside MULTI-dot
    expressions (lsh_bucket's bits, ivf_assign's cells, pq_encode's
    codebooks). Unrolling those blows a single whole-stage-codegen
    method past janino's 64 KB limit (16 cells x 64 dims measured:
    compile fails EVERY run, then interpreted eval — 4x slower than
    the HOF it replaced). The HOF form evaluates interpreted too, but
    compactly, with no per-run compile churn; single-dot paths
    (_dot_literal/_dot_cols/_norm) stay unrolled and codegen'd."""
    q = F.array(*[F.lit(float(x)) for x in query])
    return F.aggregate(
        F.zip_with(vec_col, q, lambda a, b: a.cast("double") * b),
        F.lit(0.0), lambda acc, x: acc + x)


def _dot_cols(a_col, b_col, dim: int):
    """dot(colA, colB) for a known dimension — unrolled for the same
    CodegenFallback reason as _dot_literal; fold order (seed 0.0,
    elements ascending) is bit-identical to the old aggregate()."""
    out = F.lit(0.0)
    for i in range(dim):
        out = out + (F.get(a_col, i).cast("double")
                     * F.get(b_col, i).cast("double"))
    return out


def _norm(vec_col, dim: int | None = None):
    """||vec|| — unrolled when the caller knows the dimension (every
    query-literal path does), HOF fallback only for unknown-width
    vectors."""
    if dim is None:
        return F.sqrt(F.aggregate(
            F.transform(vec_col,
                        lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0), lambda acc, x: acc + x))
    out = F.lit(0.0)
    for i in range(dim):
        e = F.get(vec_col, i).cast("double")
        out = out + e * e
    return F.sqrt(out)


def _rank_topk(df: DataFrame, query: list[float], k: int,
               vec_col: str, id_col: str,
               round_to: int | None) -> DataFrame:
    """Exact cosine re-rank (no repartition — callers own layout)."""
    import math

    qnorm = math.sqrt(sum(float(x) * float(x) for x in query)) or 1.0
    score = (_dot_literal(F.col(vec_col), query)
             / (_norm(F.col(vec_col), len(query)) * F.lit(qnorm)))
    if round_to is not None:
        score = F.round(score, round_to)
    return (df.select(F.col(id_col), score.alias("cosine"))
              .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
              .limit(k))


def cosine_topk(df: DataFrame, query: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id",
                round_to: int | None = 6) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    return _rank_topk(parallelize_scan(df), query, k, vec_col, id_col,
                      round_to)


def hyperplanes(bits: int, dim: int, seed: str = "") -> list[list[float]]:
    """Deterministic +-1 hyperplanes from md5 parity (engine-agnostic).
    ``seed`` prefixes the digest input so callers can derive multiple
    independent plane sets (multi-table LSH)."""
    planes = []
    for b in range(bits):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}{b}-{d}".encode()).hexdigest()
            row.append(1.0 if int(h[:8], 16) % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-bit bucket id (long) for a vector column. HOF dots: bits
    x dim unrolled terms in ONE expression breach the janino method
    limit (see _dot_literal_hof)."""
    bucket = None
    for i, p in enumerate(planes):
        bit = F.when(_dot_literal_hof(vec_col, p) > 0,
                     F.lit(2 ** i)).otherwise(F.lit(0)).cast("long")
        bucket = bit if bucket is None else (bucket + bit)
    return bucket


def query_bucket(query: list[float], planes: list[list[float]]) -> int:
    out = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query, p)) > 0:
            out |= 1 << i
    return out


def ivf_centroids(n_cells: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random centroids, uniform in [-1, 1).

    Components are md5-derived and rounded to 6 decimals so the exact
    same literals can be embedded in any engine's SQL (the decimal
    string parses to the identical IEEE double everywhere). At 100 TB
    these would instead come from MLlib KMeans over an ingest-time
    sample; everything downstream is unchanged."""
    cells = []
    for c in range(n_cells):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"ivf-{c}-{d}".encode()).hexdigest()
            row.append(round(int(h[:8], 16) / 2.0 ** 31 - 1.0, 6))
        cells.append(row)
    return cells


def ivf_fit(df: DataFrame, n_cells: int = 16, vec_col: str = "embedding",
            sample_fraction: float | None = None, seed: int = 42,
            max_iter: int = 20) -> list[list[float]]:
    """Fit IVF centroids with MLlib KMeans and return them as plain
    literal lists feeding ``ivf_topk(centroids=...)``.

    This is the documented 100 TB path for ``ivf_centroids``: train on
    an ingest-time sample (FAISS-style IVF trains on ~a few hundred
    vectors per cell, not the corpus), materialize the fitted cell id
    per row at ingest, and cluster/partition the table by it so probe
    filters become partition pruning. ``sample_fraction`` sizes that
    sample — at corpus scale pick fraction ~ (256 * n_cells) / N so
    the KMeans input is a few MB regardless of table size.

    Centroid components are rounded to 6 decimals for the same
    engine-portability reason as ``ivf_centroids`` (the decimal string
    parses to the identical IEEE double everywhere). The md5 variant
    remains the deterministic default for oracle entries."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.select(
        array_to_vector(F.col(vec_col).cast("array<double>"))
        .alias("features"))
    if sample_fraction is not None:
        feats = feats.sample(fraction=sample_fraction, seed=seed)
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(feats)
    return [[round(float(x), 6) for x in c] for c in model.clusterCenters()]


def ivf_assign(vec_col, centroids: list[list[float]]):
    """Cell id = argmax over centroids of dot(vec, c)/||c||, computed
    as array_max over (score, cell) structs — ties break to the
    highest cell id, mirrored by the oracle's ORDER BY score DESC,
    cell DESC."""
    import math

    scored = []
    for i, c in enumerate(centroids):
        nrm = math.sqrt(sum(x * x for x in c)) or 1.0
        scored.append(F.struct(
            (_dot_literal_hof(vec_col, c) / F.lit(nrm)).alias("score"),
            F.lit(i).alias("cell")))
    return F.array_max(F.array(*scored)).getField("cell")


def ivf_probe_cells(query: list[float], centroids: list[list[float]],
                    n_probe: int) -> list[int]:
    """Driver-side probe-set selection: the n_probe cells whose
    centroid is closest to the query."""
    import math

    scores = []
    for i, c in enumerate(centroids):
        nrm = math.sqrt(sum(x * x for x in c)) or 1.0
        scores.append((sum(a * b for a, b in zip(query, c)) / nrm, i))
    scores.sort(key=lambda t: (-t[0], -t[1]))
    return sorted(i for _, i in scores[:n_probe])


def ivf_topk(df: DataFrame, query: list[float], k: int = 10,
             n_cells: int = 16, n_probe: int = 4,
             vec_col: str = "embedding", id_col: str = "vec_id",
             round_to: int | None = 6,
             centroids: list[list[float]] | None = None) -> DataFrame:
    """IVF ANN top-k: assign every vector to its nearest of ``n_cells``
    centroids (one codegen scan), prune to the ``n_probe`` cells
    nearest the query, exact cosine re-rank on the survivors.

    Scale path (100 TB): the cell id is materialized at ingest and the
    table is clustered/partitioned by it, so the probe filter becomes
    partition pruning — the scan touches n_probe/n_cells of the files.
    n_probe trades recall for latency exactly as in FAISS-style IVF.

    Reference has no ANN surface; this extends the engine for
    embedding-scale training-data pipelines."""
    df = parallelize_scan(df)
    if centroids is None:
        centroids = ivf_centroids(n_cells, len(query))
    probes = ivf_probe_cells(query, centroids, min(n_probe, len(centroids)))
    with_cell = df.withColumn("__cell", ivf_assign(F.col(vec_col), centroids))
    candidates = with_cell.filter(F.col("__cell").isin(probes))
    return _rank_topk(candidates, query, k, vec_col, id_col, round_to)


def lsh_bucket_topk(df: DataFrame, query: list[float], k: int = 10,
                    bits: int = 12, hamming_radius: int = 3,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    round_to: int | None = 6) -> DataFrame:
    """ANN top-k: prune to vectors whose LSH bucket is within a Hamming
    radius of the query's bucket, then exact cosine on the candidates.

    The scan computes the bucket per vector (codegen) and the filter
    `bit_count(bucket ^ qbucket) <= r` prunes before any sort. At 100 TB
    the bucket would be precomputed at ingest and the table clustered by
    it, turning this into a file-skipping scan."""
    df = parallelize_scan(df)
    planes = hyperplanes(bits, len(query))
    qb = query_bucket(query, planes)
    with_bucket = df.withColumn("__bucket", lsh_bucket(F.col(vec_col), planes))
    candidates = with_bucket.filter(
        F.bit_count(F.col("__bucket").bitwiseXOR(F.lit(qb))) <= hamming_radius)
    return _rank_topk(candidates, query, k, vec_col, id_col, round_to)


# ---------------------------------------------------------------------------
# Product quantization (Jegou, Douze, Schmid 2011, "Product Quantization
# for Nearest Neighbor Search" — the FAISS PQ/ADC design). The reference
# engine has no ANN surface; PQ is the compressed-domain path that makes
# embedding search tractable at 100 TB: vectors live as m small codes
# (m bytes at ks<=256 vs 4*dim bytes raw, 32x for 64-dim float), and
# query scoring is m table lookups per row instead of a dim-length dot
# product — all in whole-stage codegen, no UDFs, no shuffle until the
# final top-k reduce.
# ---------------------------------------------------------------------------


def pq_codebooks(m: int, ks: int, dim: int,
                 seed: str = "pq") -> list[list[list[float]]]:
    """Deterministic md5-derived codebooks: m subspaces x ks centroids
    x (dim/m) components, uniform in [-1, 1), rounded to 6 decimals so
    the identical literals embed in any engine (same portability
    contract as ``ivf_centroids``). The fitted path is ``pq_fit``."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    return [[[round(int(hashlib.md5(
        f"{seed}-{j}-{c}-{d}".encode()).hexdigest()[:8], 16)
        / 2.0 ** 31 - 1.0, 6) for d in range(dsub)]
        for c in range(ks)] for j in range(m)]


def pq_fit(df: DataFrame, m: int = 8, ks: int = 16,
           vec_col: str = "embedding",
           sample_fraction: float | None = None, seed: int = 42,
           max_iter: int = 20) -> list[list[list[float]]]:
    """Fit per-subspace codebooks with MLlib KMeans — the 100 TB path
    (random codebooks quantize badly; fitted ones put centroids where
    the data is). Train on an ingest-time sample: PQ needs only a few
    hundred vectors per centroid, so ``sample_fraction`` ~
    (256 * ks) / N keeps the KMeans input a few MB at any corpus size.
    Returns plain literal lists feeding ``pq_topk(codebooks=...)``."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    base = df.select(F.col(vec_col).cast("array<double>").alias("__v"))
    if sample_fraction is not None:
        base = base.sample(fraction=sample_fraction, seed=seed)
    base = base.localCheckpoint()  # one scan feeds all m fits
    dim = len(base.first()["__v"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    books = []
    for j in range(m):
        feats = base.select(array_to_vector(
            F.slice("__v", j * dsub + 1, dsub)).alias("features"))
        model = KMeans(k=ks, seed=seed + j, maxIter=max_iter).fit(feats)
        books.append([[round(float(x), 6) for x in c]
                      for c in model.clusterCenters()])
    return books


def pq_encode(vec_col, codebooks: list[list[list[float]]]):
    """array<int> of m codes: per subspace, the L2-nearest centroid
    (ties break to the LOWEST code, matching any engine's stable
    argmin over (distance, code) ascending). One codegen projection —
    m*ks small dot products, no shuffle, no Python."""
    dsub = len(codebooks[0][0])
    codes = []
    for j, book in enumerate(codebooks):
        sub = F.slice(vec_col, j * dsub + 1, dsub)
        scored = []
        for ci, c in enumerate(book):
            # HOF fold: m x ks x dsub unrolled terms breach the janino
            # method limit in one codegen method (see _dot_literal_hof)
            d = F.aggregate(
                F.zip_with(sub, F.array(*[F.lit(float(x)) for x in c]),
                           lambda a, b: (a.cast("double") - b)
                           * (a.cast("double") - b)),
                F.lit(0.0), lambda acc, x: acc + x)
            scored.append(F.struct(d.alias("d"), F.lit(ci).alias("c")))
        codes.append(F.array_min(F.array(*scored)).getField("c"))
    return F.array(*codes)


def _pq_tables(query: list[float],
               codebooks: list[list[list[float]]]):
    """Driver-side ADC lookup tables: IPT[j][c] = dot(q_j, centroid),
    NT[j][c] = ||centroid||^2 — m*ks floats each, query-literal."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    ipt, nt = [], []
    for j, book in enumerate(codebooks):
        qj = query[j * dsub:(j + 1) * dsub]
        ipt.append([sum(a * b for a, b in zip(qj, c)) for c in book])
        nt.append([sum(x * x for x in c) for c in book])
    return ipt, nt


def _table_lookup(codes_col, table: list[list[float]]):
    """sum over subspaces of table[j][code_j] — unrolled element_at
    lookups into per-subspace literal rows (1-based), codegen-side."""
    out = F.lit(0.0)
    for j, row in enumerate(table):
        lit_row = F.array(*[F.lit(float(x)) for x in row])
        out = out + F.element_at(lit_row, F.get(codes_col, j) + 1)
    return out


def _pq_encode_numpy(df: DataFrame, vec_col: str, id_col: str,
                     codebooks: list[list[list[float]]]) -> DataFrame:
    """Vectorized encode: one Arrow batch -> one numpy broadcast
    distance tensor (n, m, ks) -> argmin codes. numpy argmin keeps
    the first (lowest) index on ties — the same tie-break as the
    expression path's (distance, code) struct min. Memory per task is
    batch_rows x dim doubles — Arrow-batch bounded."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    books = np.asarray(codebooks, dtype="float64")  # (m, ks, dsub)
    m, _, dsub = books.shape
    schema = df.select(id_col, vec_col).schema.add(
        "__codes", T.ArrayType(T.IntegerType()))

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(__codes=pd.Series(dtype=object))
                continue
            vecs = np.stack(
                pdf[vec_col].map(np.asarray)).astype("float64")
            subs = vecs.reshape(len(pdf), m, dsub)
            d = ((subs[:, :, None, :] - books[None]) ** 2).sum(-1)
            codes = d.argmin(axis=2).astype("int32")
            out = pdf[[id_col, vec_col]].copy()
            out["__codes"] = list(codes)
            yield out

    return df.select(id_col, vec_col).mapInPandas(encode, schema)


def pq_topk(df: DataFrame, query: list[float], k: int = 10,
            m: int = 8, ks: int = 16, rerank: int | None = None,
            vec_col: str = "embedding", id_col: str = "vec_id",
            round_to: int | None = 6,
            codebooks: list[list[list[float]]] | None = None,
            encode: str = "expression",
            codes_col: str | None = None) -> DataFrame:
    """PQ/ADC approximate cosine top-k: encode each vector to m codes
    (or read precomputed codes — pass ``codes_col`` naming an
    ingest-materialized array<int> column and the scan never touches
    the raw vectors until the refine stage: the 100 TB layout), score
    by asymmetric distance computation — approx cosine =
    sum_j IPT[j][code_j] / (sqrt(sum_j NT[j][code_j]) * ||q||) — and
    keep the best k. ``rerank=R`` takes the top R by ADC and exact-
    cosine re-ranks them (FAISS's refine stage): the scan stays
    compressed-domain, only R raw vectors are touched.

    ``encode="expression"`` (default) computes codes as pure Catalyst
    expressions — engine-portable and oracle-replicable, but the
    m x ks HOF distance folds evaluate interpreted (unrolling them
    breaches janino's method limit — see _dot_literal_hof).
    ``encode="numpy"`` computes the same codes as ONE Arrow-batched
    numpy argmin per batch (the semdedup scale-mode shape, ~10x at
    corpus scale); FP sum order differs, so a near-tie could in
    principle pick a different code — use expression mode when
    bit-reproducibility against another engine matters. At 100 TB
    neither runs at query time: codes are materialized at ingest and
    this scan reads m small ints per row.

    Plan shape: one scan, ADC lookups in codegen, a single
    TakeOrderedAndProject reduce (per-partition k-heaps) — no
    shuffle, no join, no broadcast of anything data-sized; the
    query-side tables are m*ks literal floats."""
    import math

    if encode not in ("expression", "numpy"):
        raise ValueError(f"encode must be 'expression' or 'numpy', "
                         f"got {encode!r}")
    df = parallelize_scan(df)
    if codebooks is None:
        codebooks = pq_codebooks(m, ks, len(query))
    ipt, nt = _pq_tables(query, codebooks)
    qnorm = math.sqrt(sum(float(x) * float(x) for x in query)) or 1.0
    if codes_col is not None:
        # ingest-materialized codes: the ADC scan reads m small ints
        # per row; the raw vector column survives only for the refine
        # stage's R candidates (column pruning drops it otherwise)
        keep = [id_col, F.col(codes_col).alias("__codes")]
        if rerank is not None:
            keep.insert(1, F.col(vec_col))
        staged = df.select(*keep)
    elif encode == "numpy":
        staged = _pq_encode_numpy(df, vec_col, id_col, codebooks)
    else:
        codes = pq_encode(F.col(vec_col), codebooks)
        staged = df.select(F.col(id_col), F.col(vec_col),
                           codes.alias("__codes"))
    score = (_table_lookup(F.col("__codes"), ipt)
             / (F.sqrt(F.greatest(_table_lookup(F.col("__codes"), nt),
                                  F.lit(1e-12))) * F.lit(qnorm)))
    if rerank is not None:
        cand = (staged.select(id_col, vec_col, score.alias("__adc"))
                .orderBy(F.col("__adc").desc(), F.col(id_col).asc())
                .limit(max(rerank, k)))
        return _rank_topk(cand, query, k, vec_col, id_col, round_to)
    if round_to is not None:
        score = F.round(score, round_to)
    return (staged.select(F.col(id_col), score.alias("adc_cosine"))
            .orderBy(F.col("adc_cosine").desc(), F.col(id_col).asc())
            .limit(k))


def ivfpq_topk(df: DataFrame, query: list[float], k: int = 10,
               n_cells: int = 16, n_probe: int = 4,
               m: int = 8, ks: int = 16, rerank: int | None = None,
               vec_col: str = "embedding", id_col: str = "vec_id",
               round_to: int | None = 6,
               centroids: list[list[float]] | None = None,
               codebooks: list[list[list[float]]] | None = None,
               encode: str = "expression") -> DataFrame:
    """IVF-PQ: the FAISS-production ANN composition — IVF cell
    pruning bounds HOW MANY rows are scored, PQ/ADC bounds the COST of
    scoring each one. Assign rows to their nearest coarse centroid,
    keep only the ``n_probe`` cells nearest the query, then run the
    PQ ADC scan (optionally with the exact refine) on the survivors.

    At 100 TB both halves live at ingest: the table is partitioned by
    cell id (probe filter = partition pruning, the scan touches
    n_probe/n_cells of the files) and stores the m PQ codes per row
    (the scan reads m small ints, never the raw vectors, until the
    refine touches its R candidates). This ad-hoc form computes both
    on the fly with the same plan shape. Probe count and rerank trade
    recall for latency independently, exactly as in FAISS IVFPQ."""
    df = parallelize_scan(df)
    if centroids is None:
        centroids = ivf_centroids(n_cells, len(query))
    probes = ivf_probe_cells(query, centroids,
                             min(n_probe, len(centroids)))
    with_cell = df.withColumn("__cell",
                              ivf_assign(F.col(vec_col), centroids))
    candidates = with_cell.filter(F.col("__cell").isin(probes)) \
        .drop("__cell")
    return pq_topk(candidates, query, k=k, m=m, ks=ks, rerank=rerank,
                   vec_col=vec_col, id_col=id_col, round_to=round_to,
                   codebooks=codebooks, encode=encode)
