"""Large-scale training-data pipeline operators.

New scope beyond the reference engine (which has no document
processing): deduplication (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding near-dup), similarity search, text analysis, and
multimodal column plumbing — the operations a 100TB pretraining-data
pipeline runs on Spark.

Design rules: everything is built from JVM-side pyspark.sql.functions
(no Python UDFs in hot paths); candidate generation is always a
bucket/blocking join (never an all-pairs cross join); hashes are
md5-prefix based so results are reproducible across engines.
"""

from samyama_graph_spark.datapipe.dedup import (
    exact_dedup,
    embedding_near_dups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dups,
)
from samyama_graph_spark.datapipe.similarity import cosine, knn_bruteforce, knn_lsh
from samyama_graph_spark.datapipe.text import (
    language_id,
    quality_score,
    text_fingerprint,
    token_stats,
)

__all__ = [
    "exact_dedup",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_near_dups",
    "embedding_near_dups",
    "cosine",
    "knn_bruteforce",
    "knn_lsh",
    "token_stats",
    "quality_score",
    "language_id",
    "text_fingerprint",
]
