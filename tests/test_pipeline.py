"""Training-data pipeline operator tests on the driver's documents/
embeddings tables (sf0.001)."""

import pytest
from pyspark.sql import functions as F

from apache_druid_spark.pipeline import (
    exact_dedup, minhash_signatures, minhash_lsh_pairs, simhash,
    ngram_jaccard_pairs, cosine_topk, lsh_bucket_topk,
    token_stats, language_id, quality_score, fingerprint,
)
from apache_druid_spark.pipeline.multimodal import (
    attach_fake_payload, extract_features, sample_frames,
)


@pytest.fixture(scope="module")
def docs(registry):
    return registry.table("documents")


@pytest.fixture(scope="module")
def docs_with_dups(spark, docs):
    # duplicate 5 docs under new ids so dedup has work to do
    dups = (docs.limit(5)
                .withColumn("doc_id", F.col("doc_id") + 100000))
    return docs.unionByName(dups)


@pytest.fixture(scope="module")
def emb(registry):
    return registry.table("embeddings")


def test_exact_dedup(docs_with_dups, docs):
    res = exact_dedup(docs_with_dups).filter(F.col("dup_count") > 1).collect()
    assert len(res) == 5
    # survivor is always the original (lower id)
    assert all(r["survivor_id"] < 100000 for r in res)


def test_minhash_signatures_shape(docs):
    row = minhash_signatures(docs, num_hashes=8).first()
    assert len(row["minhash"]) == 8
    # universal-hash values live in [0, 2^31 - 1)
    assert all(0 <= h < (1 << 31) - 1 for h in row["minhash"])


def test_minhash_lsh_finds_duplicates(docs_with_dups):
    pairs = minhash_lsh_pairs(docs_with_dups, num_hashes=8, bands=4).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    # the 5 exact dup pairs must be candidates (identical shingle sets)
    orig = sorted(r["id_a"] for r in pairs if r["id_b"] == r["id_a"] + 100000)
    assert len(orig) == 5


def test_simhash_near_dup_property(spark):
    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words about database engines here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["simhash"] for r in simhash(df, bits=32).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(got[1], got[2]) < ham(got[1], got[3])


def test_ngram_jaccard(docs_with_dups):
    pairs = ngram_jaccard_pairs(docs_with_dups, threshold=0.99).collect()
    assert len(pairs) >= 5
    assert all(r["jaccard"] == 1.0 for r in pairs
               if r["id_b"] == r["id_a"] + 100000)


def test_cosine_topk_self_is_top(emb):
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    top = cosine_topk(emb, list(q), k=5).collect()
    assert top[0]["vec_id"] == 0
    assert abs(top[0]["cosine"] - 1.0) < 1e-4
    scores = [r["cosine"] for r in top]
    assert scores == sorted(scores, reverse=True)


def test_lsh_bucket_topk_finds_self(emb):
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    top = lsh_bucket_topk(emb, list(q), k=5, bits=8, hamming_radius=2).collect()
    assert top[0]["vec_id"] == 0


def test_lsh_is_subset_of_exact(emb):
    q = emb.filter(F.col("vec_id") == 3).first()["embedding"]
    exact = [r["vec_id"] for r in cosine_topk(emb, list(q), k=50).collect()]
    approx = [r["vec_id"] for r in
              lsh_bucket_topk(emb, list(q), k=5, bits=8,
                              hamming_radius=4).collect()]
    # ANN top hit should be in the exact top-50 (sanity, not tight recall)
    assert approx[0] in exact


def test_token_stats(spark):
    df = spark.createDataFrame([(1, "hello  world foo")], "id long, text string")
    r = token_stats(df).first()
    assert r["n_tokens"] == 3
    assert r["avg_token_len"] == pytest.approx((5 + 5 + 3) / 3, abs=0.001)


def test_language_id(spark):
    rows = [(1, "the cat and the dog is in the house"),
            (2, "der hund und die katze ist nicht da"),
            (3, "le chat et la maison est une grande")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["lang_pred"] for r in language_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "fr"}


def test_quality_score_bounds(docs):
    rows = quality_score(docs).select("quality").collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in rows)


def test_fingerprint_order_invariant(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta alpha")],
        "id long, text string")
    rows = fingerprint(df).collect()
    assert rows[0]["fingerprint"] == rows[1]["fingerprint"]


def test_multimodal_features(docs):
    media = attach_fake_payload(docs.limit(20))
    feats = extract_features(media).collect()
    assert len(feats) == 20
    assert all(len(r["feature"]) == 8 for r in feats)
    assert all(r["n_bytes"] > 0 for r in feats)
    kinds = {r["kind"] for r in feats}
    assert kinds <= {"image", "audio", "video"}


def test_multimodal_frame_sampling(docs):
    media = attach_fake_payload(docs.limit(9))
    frames = sample_frames(media, every_ms=1000)
    rows = frames.collect()
    assert len(rows) > 0
    assert all(r["frame_ms"] % 1000 == 0 for r in rows)


def test_scrub_common_lines_c4(spark):
    """C4 line dedup: a boilerplate line shared across docs is removed
    everywhere; unique lines survive in order; fully-scrubbed docs come
    back empty, not dropped."""
    from apache_druid_spark.pipeline import scrub_common_lines

    ad = "SUBSCRIBE TO OUR NEWSLETTER"
    df = spark.createDataFrame(
        [(1, f"{ad}\nunique one\nmore text"),
         (2, f"intro line\n{ad}\ntail two"),
         (3, ad),
         (4, "standalone doc")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r["text_scrubbed"]
            for r in scrub_common_lines(df).collect()}
    assert rows[1] == "unique one\nmore text"
    assert rows[2] == "intro line\ntail two"
    assert rows[3] == ""          # every line was boilerplate
    assert rows[4] == "standalone doc"


def test_repetition_score_flags_planted_boilerplate(spark):
    from apache_druid_spark.pipeline import repetition_score

    df = spark.createDataFrame(
        [(1, "buy now " * 20), (2, "a perfectly normal plain sentence"),
         (3, "line\nline\nline\nother")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in repetition_score(df, ngram=3).collect()}
    assert rows[1]["dup_ngram_bp"] > 9000       # heavy n-gram repetition
    assert rows[2]["dup_ngrams"] == 0
    assert rows[3]["n_lines"] == 4 and rows[3]["dup_lines"] == 2


def test_multimodal_resize_shapes(docs):
    from apache_druid_spark.pipeline.multimodal import (
        attach_fake_payload, resize_images,
    )

    out = resize_images(attach_fake_payload(docs), width=8, height=4)
    rows = out.collect()
    assert rows and all(r["media_id"] % 3 == 0 for r in rows)  # images
    assert all(r["resized_n_bytes"] == 32 for r in rows)
    assert all(len(r["payload"]) == 32 for r in rows)
    assert all(r["width"] == 8 and r["height"] == 4 for r in rows)


def test_ivf_topk_equals_exact_when_probing_all_cells(emb):
    from apache_druid_spark.pipeline import ivf_topk

    q = [1.0] * 64
    exact = cosine_topk(emb, q, k=5).collect()
    ivf_all = ivf_topk(emb, q, k=5, n_cells=8, n_probe=8).collect()
    assert [(r["vec_id"], r["cosine"]) for r in ivf_all] == \
           [(r["vec_id"], r["cosine"]) for r in exact]


def test_ivf_topk_pruned_is_subset_of_exact_scores(emb):
    from apache_druid_spark.pipeline import ivf_topk

    q = [1.0] * 64
    n = emb.count()
    exact = {(r["vec_id"], r["cosine"])
             for r in cosine_topk(emb, q, k=n).collect()}
    pruned = ivf_topk(emb, q, k=5, n_cells=8, n_probe=2).collect()
    assert 0 < len(pruned) <= 5
    # descending score order and scores identical to the exact ranking
    scores = [r["cosine"] for r in pruned]
    assert scores == sorted(scores, reverse=True)
    assert all((r["vec_id"], r["cosine"]) in exact for r in pruned)


def test_ivf_fit_centroids_roundtrip(emb):
    """VERDICT r3 #7: the documented KMeans path. Fitted centroids must
    feed ivf_topk unchanged — probing every fitted cell reduces IVF to
    the exact ranking, and fitted cells must actually partition the
    data (no degenerate single-cell clustering)."""
    from apache_druid_spark.pipeline import ivf_fit, ivf_topk
    from apache_druid_spark.pipeline.similarity import ivf_assign

    q = [1.0] * 64
    cents = ivf_fit(emb, n_cells=8, max_iter=10)
    assert len(cents) == 8 and all(len(c) == 64 for c in cents)

    exact = cosine_topk(emb, q, k=5).collect()
    got = ivf_topk(emb, q, k=5, n_probe=8, centroids=cents).collect()
    assert [(r["vec_id"], r["cosine"]) for r in got] == \
           [(r["vec_id"], r["cosine"]) for r in exact]

    n_cells_used = (emb.select(ivf_assign("embedding", cents)
                               .alias("c")).distinct().count())
    assert n_cells_used >= 4  # KMeans spread the data across cells

    # sampled fit is deterministic under a fixed seed
    s1 = ivf_fit(emb, n_cells=4, sample_fraction=0.5, seed=7, max_iter=5)
    s2 = ivf_fit(emb, n_cells=4, sample_fraction=0.5, seed=7, max_iter=5)
    assert s1 == s2


def test_pq_encode_shape_and_bounds(emb):
    from apache_druid_spark.pipeline import pq_codebooks, pq_encode

    books = pq_codebooks(m=8, ks=16, dim=64)
    codes = emb.select(pq_encode("embedding", books)
                       .alias("c")).collect()
    assert all(len(r["c"]) == 8 for r in codes)
    assert all(0 <= v < 16 for r in codes for v in r["c"])
    # deterministic: same codebooks, same codes
    again = emb.select(pq_encode("embedding", books)
                       .alias("c")).collect()
    assert [r["c"] for r in codes] == [r["c"] for r in again]


def test_pq_topk_rerank_all_equals_exact(emb):
    """With rerank >= n the exact re-rank sees every row, so PQ
    reduces to the exact ranking regardless of codebook quality."""
    from apache_druid_spark.pipeline import pq_topk

    q = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    n = emb.count()
    exact = cosine_topk(emb, q, k=5).collect()
    pq = pq_topk(emb, q, k=5, rerank=n).collect()
    assert [(r["vec_id"], r["cosine"]) for r in pq] == \
           [(r["vec_id"], r["cosine"]) for r in exact]
    assert pq[0]["vec_id"] == 0  # self is the top hit


def test_pq_fit_books_feed_topk(emb):
    from apache_druid_spark.pipeline import pq_fit, pq_topk

    books = pq_fit(emb, m=8, ks=4, max_iter=5)
    assert len(books) == 8 and all(len(b) == 4 for b in books)
    assert all(len(c) == 8 for b in books for c in b)
    # fitted fit is deterministic under a fixed seed
    assert books == pq_fit(emb, m=8, ks=4, max_iter=5)
    got = pq_topk(emb, [1.0] * 64, k=5, codebooks=books,
                  rerank=20).collect()
    assert len(got) == 5
    scores = [r["cosine"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_pq_topk_adc_plan_no_join_single_takeordered(emb):
    """The compressed-domain scan must stay a single pass: no Join,
    no Exchange beyond the TakeOrdered reduce, no Python."""
    from apache_druid_spark.pipeline import pq_topk

    df = pq_topk(emb, [1.0] * 64, k=5, rerank=None)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in opt
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in phys
    assert "EvalPython" not in phys


def test_pq_codebooks_dim_must_divide():
    from apache_druid_spark.pipeline import pq_codebooks

    with pytest.raises(ValueError):
        pq_codebooks(m=7, ks=16, dim=64)


def test_embedding_cosine_pairs_finds_planted_dups(emb):
    from apache_druid_spark.pipeline import embedding_cosine_pairs

    dups = emb.limit(3).withColumn("vec_id", F.col("vec_id") + 100000)
    with_dups = emb.unionByName(dups)
    pairs = embedding_cosine_pairs(with_dups, dim=64, threshold=0.99,
                                   bits=8, tables=2).collect()
    # identical vectors share every sign bucket -> all 3 pairs found
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    expected = {(r["vec_id"], r["vec_id"] + 100000)
                for r in emb.limit(3).collect()}
    assert expected <= found
    assert all(r["cosine"] >= 0.99 for r in pairs)
    assert all(r["id_a"] < r["id_b"] for r in pairs)


def test_embedding_cosine_pairs_distinct_across_tables(emb):
    from apache_druid_spark.pipeline import embedding_cosine_pairs

    pairs = embedding_cosine_pairs(emb, dim=64, threshold=0.2,
                                   bits=6, tables=2).collect()
    keys = [(r["id_a"], r["id_b"]) for r in pairs]
    assert len(keys) == len(set(keys))


def test_winnowing_detects_shared_substring(spark):
    from apache_druid_spark.pipeline import winnowing_fingerprint

    shared = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [(1, "AAAA " + shared + " BBBB"),
         (2, "CCCC " + shared + " DDDD"),
         (3, "completely different words here entirely")],
        "doc_id long, text string")
    rows = {r["doc_id"]: set(r["fingerprints"])
            for r in winnowing_fingerprint(df, k=5, window=4).collect()}
    # guarantee: substrings >= w + k - 1 = 8 chars shared => overlap
    assert rows[1] & rows[2]
    # overlap between 1 and 2 is much larger than with the unrelated doc
    assert len(rows[1] & rows[2]) > len(rows[1] & rows[3])


def test_winnowing_short_text_fallbacks(spark):
    from apache_druid_spark.pipeline import winnowing_fingerprint

    df = spark.createDataFrame([(1, "ab"), (2, "abcdef")],
                               "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            winnowing_fingerprint(df, k=5, window=4).collect()}
    assert rows[1]["fp_count"] == 1  # text shorter than k
    assert rows[2]["fp_count"] >= 1  # fewer grams than the window


def test_pack_sequences_contiguous_stream(docs):
    """Packing invariants: in shuffle-hash order the start offsets are
    exactly contiguous (each doc starts where the previous ended) and
    pack_id = start // budget."""
    from apache_druid_spark.pipeline import (
        deterministic_shuffle, pack_sequences,
    )

    packed = pack_sequences(docs, budget=512, n_buckets=8).collect()
    order = {r["doc_id"]: r["shuffle_order"] for r in
             deterministic_shuffle(docs).collect()}
    rows = sorted(packed, key=lambda r: order[r["doc_id"]])
    pos = 0
    for r in rows:
        assert r["start_offset"] == pos
        assert r["pack_id"] == pos // 512
        pos += r["n_tokens"]
    assert pos == sum(r["n_tokens"] for r in rows)


def test_pack_sequences_bucket_count_invariant(docs):
    """The two-phase distributed prefix sum must give the identical
    packing regardless of bucket fan-out (n_buckets is a parallelism
    knob, not a semantics knob)."""
    from apache_druid_spark.pipeline import pack_sequences

    a = {r["doc_id"]: (r["start_offset"], r["pack_id"])
         for r in pack_sequences(docs, budget=256, n_buckets=1).collect()}
    b = {r["doc_id"]: (r["start_offset"], r["pack_id"])
         for r in pack_sequences(docs, budget=256, n_buckets=64).collect()}
    assert a == b


def test_deterministic_shuffle_is_stable_and_seeded(docs):
    from apache_druid_spark.pipeline import deterministic_shuffle

    a = [r["doc_id"] for r in deterministic_shuffle(docs, seed="e0")
         .orderBy("shuffle_order").collect()]
    b = [r["doc_id"] for r in deterministic_shuffle(docs, seed="e0")
         .orderBy("shuffle_order").collect()]
    c = [r["doc_id"] for r in deterministic_shuffle(docs, seed="e1")
         .orderBy("shuffle_order").collect()]
    assert a == b          # reproducible
    assert a != c          # seed changes the permutation
    assert sorted(a) == sorted(c)  # but it IS a permutation


def test_contamination_report_flags_test_copies(docs):
    from apache_druid_spark.pipeline import contamination_report

    test = docs.filter(F.col("doc_id") % 7 == 0)
    rep = {r["doc_id"]: r for r in
           contamination_report(docs, test, ngram=8).collect()}
    assert len(rep) == docs.count()  # every train doc reported
    # every test doc is its own contamination (identical text)
    for r in rep.values():
        if r["doc_id"] % 7 == 0:
            assert r["is_contaminated"] and \
                r["n_contaminated"] == r["n_ngrams"]


def test_decontaminate_drops_only_contaminated(docs):
    from apache_druid_spark.pipeline import (
        contamination_report, decontaminate,
    )

    test = docs.filter(F.col("doc_id") % 7 == 0)
    flagged = {r["doc_id"] for r in
               contamination_report(docs, test, ngram=8)
               .filter("is_contaminated").collect()}
    kept = {r["doc_id"] for r in
            decontaminate(docs, test, ngram=8).collect()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert kept == all_ids - flagged
    assert not (kept & {i for i in all_ids if i % 7 == 0})


def test_decontaminate_short_doc_whole_text_gram(spark):
    """Docs shorter than the n-gram fall back to a whole-text gram —
    an exact-copy short doc must still be caught."""
    from apache_druid_spark.pipeline import contamination_report

    train = spark.createDataFrame(
        [(1, "tiny doc"), (2, "completely different words")],
        "doc_id long, text string")
    test = spark.createDataFrame([(9, "tiny doc")],
                                 "doc_id long, text string")
    rep = {r["doc_id"]: r["is_contaminated"]
           for r in contamination_report(train, test, ngram=13).collect()}
    assert rep == {1: True, 2: False}


def test_connected_components_known_graph(spark):
    from apache_druid_spark.pipeline import connected_components

    # two components {1,2,3,4} (chain) and {10,11}; 20 isolated
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"])
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 20]],
                                  ["node"])
    got = {r["node"]: r["component"]
           for r in connected_components(edges, nodes=nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_star_known_graph(spark):
    from apache_druid_spark.pipeline import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"])
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 20]],
                                  ["node"])
    got = {r["node"]: r["component"]
           for r in connected_components(edges, nodes=nodes,
                                         algorithm="star").collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_label_escalates_to_star(spark):
    """VERDICT r4 #6: a diameter > max_iterations chain no longer needs
    caller intervention — the label path exhausts its budget, carries
    its partial labels over as edges, and the star rounds finish the
    job. The answer must still be exact."""
    from apache_druid_spark.pipeline import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], ["id_a", "id_b"])
    got = {r["node"]: r["component"]
           for r in connected_components(chain, max_iterations=3).collect()}
    assert got == {i: 0 for i in range(9)}


def test_connected_components_raises_when_star_also_exhausts(spark):
    """The RuntimeError path still exists: with a 1-round budget even
    the star escalation cannot finish a long chain, and a partial
    clustering must never be silently returned."""
    import pytest
    from apache_druid_spark.pipeline import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(24)], ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iterations=1)


def test_connected_components_star_long_chain_logsq_rounds(spark):
    """Kiveris et al. large-star/small-star: a 256-node path graph —
    the adversarial case for diameter-bound label propagation (255
    rounds) — must converge in O(log^2 n) alternating rounds."""
    from pyspark.sql import functions as F
    from apache_druid_spark.pipeline.graph import _alternating_star

    n = 256
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"])
    bidir = (edges.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
             .unionAll(edges.select(F.col("id_b").alias("u"),
                                    F.col("id_a").alias("v")))
             .distinct())
    vertices = bidir.select(F.col("u").alias("node")).distinct()
    labels, rounds = _alternating_star(bidir, vertices, "node",
                                       max_iterations=16)
    assert rounds <= 8, rounds
    got = {r["node"]: r["component"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}


def test_connected_components_star_matches_label(spark):
    """Both algorithms are exact — identical labels on a random-ish
    multi-component graph."""
    from apache_druid_spark.pipeline import connected_components

    pairs = [(i, (i * 7) % 60) for i in range(0, 60, 2)] + [(80, 81)]
    edges = spark.createDataFrame(pairs, ["id_a", "id_b"])
    a = {(r["node"], r["component"])
         for r in connected_components(edges, algorithm="label").collect()}
    b = {(r["node"], r["component"])
         for r in connected_components(edges, algorithm="star").collect()}
    assert a == b


def test_dedup_keep_representatives(spark):
    from apache_druid_spark.pipeline import (
        connected_components, dedup_keep_representatives,
    )

    edges = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 7)], ["doc_id", "text"])
    comps = connected_components(
        edges, nodes=df.select(F.col("doc_id").alias("node")))
    kept = dedup_keep_representatives(df, comps)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 7]


def test_chunk_documents_overlap(spark):
    from apache_druid_spark.pipeline import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], ["doc_id", "text"])
    rows = (chunk_documents(df, size=4, stride=3)
            .orderBy("chunk_idx").collect())
    # starts 0,3,6,9 -> 4 chunks; last is the single trailing token
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2, 3]
    assert rows[0]["chunk_text"] == "t0 t1 t2 t3"
    assert rows[1]["chunk_text"] == "t3 t4 t5 t6"
    assert rows[3]["chunk_text"] == "t9"
    assert [r["chunk_tokens"] for r in rows] == [4, 4, 4, 1]


def test_normalize_and_pii_scrub(spark):
    from apache_druid_spark.pipeline import normalize, pii_scrub

    df = spark.createDataFrame(
        [(1, "  Hello,   WORLD! e=mc^2 "),
         (2, "mail a.b+c@x-y.co or 10.0.0.1 acct 12345678")],
        ["doc_id", "text"])
    n = {r["doc_id"]: r["text_norm"]
         for r in normalize(df).collect()}
    assert n[1] == "hello world emc2"
    s = {r["doc_id"]: r["text_scrubbed"]
         for r in pii_scrub(df).collect()}
    assert s[2] == "mail <EMAIL> or <IP> acct <NUMBER>"


def test_session_window_matches_islands(spark, registry):
    from apache_druid_spark.model.datasource import TIME_COLUMN

    ev = registry.table("events").limit(500)
    sess = (ev.groupBy("user_id",
                       F.session_window(F.col(TIME_COLUMN), "6 hours"))
            .agg(F.count(F.lit(1)).alias("n")))
    total = sess.agg(F.sum("n")).collect()[0][0]
    assert total == ev.count()  # every event lands in exactly one session


def test_edit_distance_verify_exact_dup_is_zero(spark, docs_with_dups):
    from apache_druid_spark.pipeline import edit_distance_verify

    pairs = spark.createDataFrame(
        [(1, 100001)], "id_a long, id_b long")  # doc 1 and its copy
    out = edit_distance_verify(docs_with_dups, pairs).collect()
    assert len(out) == 1
    assert out[0]["edit_dist"] == 0 and out[0]["rel_dist_bp"] == 0


def test_edit_distance_verify_threshold(spark):
    from apache_druid_spark.pipeline import edit_distance_verify

    docs = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abcdefghiX"), (3, "zzzzzzzzzz")],
        "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long")
    # 1<->2: dist 1 over len 10 = 1000bp (kept); 1<->3: 10000bp (cut)
    out = edit_distance_verify(docs, pairs, max_rel_bp=5000).collect()
    assert [(r["id_a"], r["id_b"], r["edit_dist"], r["rel_dist_bp"])
            for r in out] == [(1, 2, 1, 1000)]


def test_edit_distance_verify_rel_bp_boundary(spark):
    """ADVICE r4 regression: the band bound must keep every pair with
    rel_bp <= max_rel_bp. L=3, d=1, max_rel_bp=3333: rel_bp = 3333
    qualifies, but a naive floor(B*L/10000) bound is 0 and the DP would
    return -1 and drop the pair."""
    from apache_druid_spark.pipeline import edit_distance_verify

    docs = spark.createDataFrame(
        [(1, "abc"), (2, "abX")], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out = edit_distance_verify(docs, pairs, max_rel_bp=3333).collect()
    assert [(r["edit_dist"], r["rel_dist_bp"]) for r in out] == [(1, 3333)]
    # and one notch lower the same pair is cut (3333 > 3332)
    out2 = edit_distance_verify(docs, pairs, max_rel_bp=3332).collect()
    assert out2 == []


def test_tfidf_top_terms_known_corpus(spark):
    from apache_druid_spark.pipeline import tfidf_top_terms

    docs = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry"), (3, "cherry")],
        "doc_id long, text string")
    out = tfidf_top_terms(docs, top_k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: apple tf=2 df=1 beats banana tf=1 df=2
    d1 = sorted(by_doc[1], key=lambda r: r["term_rank"])
    assert [r["term"] for r in d1] == ["apple", "banana"]
    assert d1[0]["tf"] == 2 and d1[0]["term_df"] == 1
    # ranks are 1..k dense per doc, scores non-increasing
    for rows in by_doc.values():
        rows = sorted(rows, key=lambda r: r["term_rank"])
        assert [r["term_rank"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["tfidf"] for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_mixture_weights_shares_and_inversion(spark):
    from apache_druid_spark.pipeline.sampling import mixture_weights

    docs = spark.createDataFrame(
        [(1, "a b c d", "en"), (2, "e f", "en"), (3, "g h", "de")],
        "doc_id long, text string, lang string")
    out = {r["lang"]: r for r in
           mixture_weights(docs, {"en": 0.5, "de": 0.5}).collect()}
    # en: 6 of 8 tokens = 7500bp; de: 2 of 8 = 2500bp
    assert out["en"]["obs_share_bp"] == 7500
    assert out["de"]["obs_share_bp"] == 2500
    # weight = target/observed: en 0.5/0.75, de 0.5/0.25
    assert abs(out["en"]["weight"] - 0.6667) < 1e-9
    assert abs(out["de"]["weight"] - 2.0) < 1e-9
    # group absent from target gets weight 0
    out2 = {r["lang"]: r for r in
            mixture_weights(docs, {"en": 1.0}).collect()}
    assert out2["de"]["weight"] == 0.0 and out2["de"]["target_share"] == 0.0


def test_mixture_weights_zero_token_group(spark):
    """ADVICE r4 regression: a group whose documents all tokenize to
    zero tokens gets weight 0.0, never NULL (NULL would silently
    poison downstream stratified sampling)."""
    from apache_druid_spark.pipeline.sampling import mixture_weights

    docs = spark.createDataFrame(
        [(1, "a b c d", "en"), (2, "   ", "xx"), (3, "", "xx")],
        "doc_id long, text string, lang string")
    out = {r["lang"]: r for r in
           mixture_weights(docs, {"en": 0.5, "xx": 0.5}).collect()}
    assert out["xx"]["n_tokens"] == 0
    assert out["xx"]["weight"] == 0.0  # not None
    assert out["xx"]["obs_share_bp"] == 0
    assert out["en"]["obs_share_bp"] == 10000


def test_gopher_rules_planted_documents(spark):
    """gopher_rules (pipeline/text.py; Rae et al. 2021 §A1.1): planted
    pass/fail documents trip exactly the intended rule."""
    from apache_druid_spark.pipeline import gopher_rules

    good = ("the quick brown fox jumps over the lazy dog and runs far "
            "away to be with all of that pack which have quite some fun "
            "together near the old river bank while birds sing songs "
            "and children play games under warm golden afternoon sun "
            "that shines bright over the green quiet meadow fields")
    rows = [
        (1, good),                                   # passes everything
        (2, "short text only"),                      # fails word count
        (3, good + " ####### ## # # # # # # # # # # # # # # # # # # #"
         " # # # # # # # # # # # #"),                # fails symbol ratio
        (4, "\n".join("• " + w for w in good.split())),  # bullet lines
        (5, good.replace(" ", "... \n")[:2000]),     # ellipsis lines
        (6, " ".join(str(i) for i in range(80))),    # no alpha, no stops
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}
    assert got[1]["pass_gopher"] == 1
    assert got[2]["r_word_count"] == 0
    assert got[3]["r_symbol_ratio"] == 0 and got[3]["pass_gopher"] == 0
    assert got[4]["r_bullet_lines"] == 0
    assert got[5]["r_ellipsis_lines"] == 0
    assert got[6]["r_alpha_words"] == 0 and got[6]["r_stop_words"] == 0


def test_c4_filters_planted_documents(spark):
    """c4_filters (pipeline/text.py; Raffel et al. 2020 §2.2): planted
    pages trip exactly the intended rule."""
    from apache_druid_spark.pipeline import c4_filters

    good = ("This is the first proper sentence of the page.\n"
            "Here comes another full sentence with enough words.\n"
            "And a third complete sentence closes the page nicely.")
    rows = [
        (1, good),                                    # keeps everything
        (2, good + "\nsome code { return 1; }"),      # brace page drop
        (3, good.replace("page", "Lorem Ipsum page")),  # placeholder text
        (4, "no terminal punctuation here\nshort one\nbullet items"),
        (5, "Tiny. But. Sentences.\nToo short each.\nFive ok? no"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in c4_filters(df).collect()}
    assert got[1]["keep_page"] == 1 and got[1]["n_lines_kept"] == 3
    assert got[1]["clean_text"] == good
    assert got[2]["has_brace"] == 1 and got[2]["keep_page"] == 0
    assert got[3]["has_lorem"] == 1 and got[3]["keep_page"] == 0
    # every line fails the terminal-punct/word-count rule
    assert got[4]["n_lines_kept"] == 0 and got[4]["clean_text"] == ""
    assert got[4]["keep_page"] == 0
    # lines kept need >= 5 words AND terminal punctuation
    assert got[5]["n_lines_kept"] == 0


def test_pq_encode_modes_agree(emb):
    """The Arrow/numpy encode must produce the same codes (and so the
    same ADC result) as the Catalyst-expression encode — same argmin
    tie-break (first/lowest code)."""
    from apache_druid_spark.pipeline import pq_topk

    q = [0.1 * ((i % 7) - 3) for i in range(64)]
    a = [(r["vec_id"], r["adc_cosine"])
         for r in pq_topk(emb, q, k=10, rerank=None).collect()]
    b = [(r["vec_id"], r["adc_cosine"])
         for r in pq_topk(emb, q, k=10, encode="numpy",
                          rerank=None).collect()]
    assert a == b


def test_pq_topk_bad_encode_mode_raises(emb):
    from apache_druid_spark.pipeline import pq_topk

    with pytest.raises(ValueError):
        pq_topk(emb, [0.1] * 64, k=5, encode="nope")


def test_ivfpq_probe_all_equals_pq(emb):
    """Probing every cell makes IVF-PQ degenerate to plain PQ — the
    coarse quantizer prunes nothing, the fine quantizer is shared."""
    from apache_druid_spark.pipeline import ivfpq_topk, pq_topk

    q = [0.1 * ((i % 5) - 2) for i in range(64)]
    a = [(r["vec_id"], r["adc_cosine"])
         for r in pq_topk(emb, q, k=5, rerank=None).collect()]
    b = [(r["vec_id"], r["adc_cosine"])
         for r in ivfpq_topk(emb, q, k=5, n_cells=8,
                             n_probe=8, rerank=None).collect()]
    assert a == b


def test_ivfpq_pruned_results_subset_of_pq(emb):
    """With a real probe budget the candidates are a subset, so every
    returned (id, score) must appear in the unpruned PQ ranking over
    the full table."""
    from apache_druid_spark.pipeline import ivfpq_topk, pq_topk

    q = [0.1 * ((i % 5) - 2) for i in range(64)]
    n = emb.count()
    full = {(r["vec_id"], r["adc_cosine"])
            for r in pq_topk(emb, q, k=n, rerank=None).collect()}
    pruned = ivfpq_topk(emb, q, k=5, n_cells=8, n_probe=2,
                        rerank=None).collect()
    assert 0 < len(pruned) <= 5
    assert all((r["vec_id"], r["adc_cosine"]) in full for r in pruned)


def test_ivfpq_rerank_returns_exact_scores(emb):
    """rerank mode finishes with the exact cosine — scores must match
    the brute-force scores for the ids it returns."""
    from apache_druid_spark.pipeline import cosine_topk, ivfpq_topk

    q = [0.1 * ((i % 5) - 2) for i in range(64)]
    n = emb.count()
    exact = {r["vec_id"]: r["cosine"]
             for r in cosine_topk(emb, q, k=n).collect()}
    got = ivfpq_topk(emb, q, k=5, n_cells=8, n_probe=4,
                     rerank=30).collect()
    assert len(got) == 5
    assert all(exact[r["vec_id"]] == r["cosine"] for r in got)


def test_pq_topk_precomputed_codes_col(emb, tmp_path):
    """The ingest-materialized layout: codes written once (pq_encode
    projection through a parquet round-trip), then pq_topk scores the
    codes column without re-encoding — result identical to on-the-fly
    encode, and the ADC-only scan must not read the vector column
    (column pruning visible in the scan's ReadSchema)."""
    from apache_druid_spark.pipeline import (pq_codebooks, pq_encode,
                                             pq_topk)

    books = pq_codebooks(m=8, ks=16, dim=64)
    path = str(tmp_path / "emb_pq")
    emb.withColumn("pq_codes",
                   pq_encode("embedding", books)) \
       .write.mode("overwrite").parquet(path)
    stored = emb.sparkSession.read.parquet(path)

    q = [0.1 * ((i % 7) - 3) for i in range(64)]
    on_the_fly = [(r["vec_id"], r["adc_cosine"])
                  for r in pq_topk(emb, q, k=5, rerank=None,
                                   codebooks=books).collect()]
    from_codes = pq_topk(stored, q, k=5, codebooks=books,
                         codes_col="pq_codes", rerank=None)
    assert [(r["vec_id"], r["adc_cosine"])
            for r in from_codes.collect()] == on_the_fly
    plan = from_codes._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("FileScan"):].splitlines()[0]
    assert "pq_codes" in scan and "embedding" not in scan

    # refine mode touches the raw vectors only for its candidates and
    # still matches the on-the-fly refine
    a = [(r["vec_id"], r["cosine"])
         for r in pq_topk(emb, q, k=5, codebooks=books,
                          rerank=30).collect()]
    b = [(r["vec_id"], r["cosine"])
         for r in pq_topk(stored, q, k=5, codebooks=books,
                          codes_col="pq_codes", rerank=30).collect()]
    assert a == b
