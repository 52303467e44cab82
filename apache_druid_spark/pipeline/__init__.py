"""Large-scale training-data pipeline operators.

These are first-class engine components (not demos): each is a
declarative DataFrame plan built from built-in expressions so it scales
the way a 100 TB corpus requires — shingling/hashing stay in codegen,
candidate generation is a bucket join (never an all-pairs product),
and the only Python that ever runs per-row is the clearly-marked
multimodal decode stubs (Arrow-batched mapInPandas).
"""

from apache_druid_spark.pipeline.dedup import (
    edit_distance_verify, embedding_cosine_pairs, exact_dedup,
    minhash_signatures, minhash_lsh_pairs, simhash, ngram_jaccard_pairs,
)
from apache_druid_spark.pipeline.similarity import (
    ann_materialize, cosine_topk, ivf_fit, ivf_topk, lsh_bucket_topk,
    ivfpq_topk, pq_codebooks, pq_encode, pq_fit, pq_topk,
)
from apache_druid_spark.pipeline.text import (
    token_stats, language_id, quality_score, fingerprint,
    repetition_score, scrub_common_lines, tfidf_top_terms, top_ngrams,
    winnowing_fingerprint, winnowing_overlap_pairs, normalize,
    pii_scrub, chunk_documents, gopher_rules, c4_filters,
)
from apache_druid_spark.pipeline.semdedup import assign_cells, semantic_dedup
from apache_druid_spark.pipeline.importance import (
    bucket_log_ratios, importance_weights, dsir_select, unigram_logprob,
)
from apache_druid_spark.pipeline.graph import (
    connected_components, dedup_keep_representatives,
)
from apache_druid_spark.pipeline.decontam import (
    contamination_report, decontaminate,
)
from apache_druid_spark.pipeline.packing import (
    deterministic_shuffle, pack_sequences,
)

__all__ = [
    "edit_distance_verify", "exact_dedup", "minhash_signatures",
    "minhash_lsh_pairs", "simhash",
    "ngram_jaccard_pairs", "embedding_cosine_pairs",
    "cosine_topk", "ivf_fit", "ivf_topk", "lsh_bucket_topk",
    "token_stats", "language_id", "quality_score", "fingerprint",
    "repetition_score", "scrub_common_lines", "top_ngrams",
    "winnowing_fingerprint", "winnowing_overlap_pairs", "normalize",
    "pii_scrub", "chunk_documents", "tfidf_top_terms",
    "assign_cells", "semantic_dedup", "bucket_log_ratios", "importance_weights",
    "dsir_select", "unigram_logprob", "gopher_rules", "c4_filters",
    "connected_components", "dedup_keep_representatives",
    "contamination_report", "decontaminate",
    "deterministic_shuffle", "pack_sequences",
]
