"""Large-scale training-data pipeline operators.

New scope beyond the reference engine (which has no document
processing): deduplication (exact / MinHash-LSH incl. incremental /
SimHash / n-gram Jaccard / embedding near-dup / transitive clustering
and application), similarity search (brute-force, LSH, IVF, PQ,
IVFADC), corpus hygiene (contamination, PII, repetition, length
buckets, tf-idf, composed filter gate), sampling/splits, sequence
packing, skew mitigation, text analysis, and multimodal column
plumbing — the operations a 100TB pretraining-data pipeline runs on
Spark.

Design rules: everything is built from JVM-side pyspark.sql.functions
(no Python UDFs in hot paths); candidate generation is always a
bucket/blocking join (never an all-pairs cross join); hashes are
md5-prefix based so results are reproducible across engines.
"""

from samyama_graph_spark.datapipe.corpus import (
    contamination_overlap,
    corpus_filter,
    length_buckets,
    pii_scrub,
    quality_buckets,
    repetition_metrics,
    tfidf_top_terms,
    unigram_logprob,
)
from samyama_graph_spark.datapipe.dedup import (
    apply_dedup,
    dup_clusters,
    embedding_near_dups,
    exact_dedup,
    kmeans,
    minhash_incremental_pairs,
    minhash_index,
    minhash_index_read,
    minhash_index_write,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_dup_stats,
    simhash_near_dups,
)
from samyama_graph_spark.datapipe.sampling import (
    assign_split,
    mixture_rates,
    neighbor_sample,
    resample_mixture,
    sample_exact_k,
    stratified_sample,
)
from samyama_graph_spark.datapipe.similarity import (
    cosine,
    knn_bruteforce,
    knn_ivf,
    knn_ivf_partitioned,
    knn_ivfadc,
    ivf_write_partitioned,
    read_index_meta,
    knn_lsh,
    knn_pq_adc,
    pq_codebook,
    pq_encode,
)
from samyama_graph_spark.datapipe.skew import salted_agg, salted_join
from samyama_graph_spark.datapipe.timeseries import reaggregate, time_rollup
from samyama_graph_spark.datapipe.text import (
    language_id,
    normalize_text,
    split_text_chunks,
    quality_score,
    text_fingerprint,
    token_stats,
)

__all__ = [
    # dedup
    "exact_dedup",
    "minhash_lsh_pairs",
    "minhash_index",
    "minhash_index_read",
    "minhash_index_write",
    "minhash_incremental_pairs",
    "ngram_jaccard_pairs",
    "simhash_near_dups",
    "simhash_dup_stats",
    "embedding_near_dups",
    "dup_clusters",
    "apply_dedup",
    # similarity
    "cosine",
    "knn_bruteforce",
    "knn_lsh",
    "knn_ivf",
    "knn_ivf_partitioned",
    "knn_pq_adc",
    "knn_ivfadc",
    "ivf_write_partitioned",
    "read_index_meta",
    "pq_codebook",
    "pq_encode",
    # corpus hygiene
    "contamination_overlap",
    "pii_scrub",
    "repetition_metrics",
    "length_buckets",
    "tfidf_top_terms",
    "unigram_logprob",
    "corpus_filter",
    # sampling / splits / mixing
    "stratified_sample",
    "assign_split",
    "sample_exact_k",
    "mixture_rates",
    "resample_mixture",
    "neighbor_sample",
    # skew
    "salted_join",
    "salted_agg",
    # time-series rollups
    "time_rollup",
    "reaggregate",
    # text
    "token_stats",
    "quality_score",
    "language_id",
    "text_fingerprint",
    "normalize_text",
    "split_text_chunks",
]
