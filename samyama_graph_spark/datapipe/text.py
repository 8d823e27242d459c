"""Text analysis operators: token stats, quality scoring, language
identification, document fingerprinting.

All pure Column expressions (whole-stage codegen); formulas are
deliberately simple closed-form so the DuckDB oracle can evaluate the
identical computation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from samyama_graph_spark.datapipe.common import hash60, tokens, word_shingles

STOPWORDS = ["the", "a", "an", "of", "and", "or", "in", "on", "to", "is"]

# Marker words per language for the n-gram/stopword language-ID
# heuristic.  (Real corpora would use character n-gram profiles; the
# driver's synthetic docs share one vocabulary, so the heuristic's
# value here is the deterministic, cross-engine-checkable plumbing.)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "a"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "de", "y", "es"],
    "fr": ["le", "la", "et", "est", "un"],
    "zh": ["de", "shi", "he", "zai", "le"],
}


def token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """``(id, n_chars, n_tokens, n_distinct_tokens, avg_token_len)``."""
    ws = tokens(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"),
        F.length(text_col).alias("n_chars"),
        F.size(ws).alias("n_tokens"),
        F.size(F.array_distinct(ws)).alias("n_distinct_tokens"),
        F.round(
            (F.length(text_col) - F.size(ws) + 1) / F.size(ws), 6
        ).alias("avg_token_len"),
    )


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic quality in [0,1]: length band + lexical diversity +
    stopword presence: ``(id, quality)``.

    quality = 0.4 * min(n_tokens/50, 1)
            + 0.4 * (n_distinct/n_tokens)
            + 0.2 * min(stopword_ratio*5, 1)
    """
    ws = tokens(F.col(text_col))
    n_tok = F.size(ws)
    n_dis = F.size(F.array_distinct(ws))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(ws, lambda w: F.array_contains(stop_arr, w)))
    q = (
        0.4 * F.least(n_tok / F.lit(50.0), F.lit(1.0))
        + 0.4 * (n_dis / n_tok)
        + 0.2 * F.least(n_stop / n_tok * 5.0, F.lit(1.0))
    )
    return df.select(
        F.col(id_col).alias("id"), F.round(q, 6).alias("quality")
    )


def language_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Marker-word language ID: ``(id, lang_guess, lang_hits)``.

    Scores each language by marker-word hits in the token bag; picks
    the highest count, ties broken alphabetically ('en' wins a total
    tie only if no other language scored).
    """
    ws = tokens(F.col(text_col))
    # struct(hits, -rank, lang): array_max picks highest hit count,
    # ties resolved to the alphabetically-first language (max of -rank).
    ranked = []
    for i, lang in enumerate(sorted(LANG_MARKERS)):
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        cnt = F.size(F.filter(ws, lambda w: F.array_contains(markers, w)))
        ranked.append(
            F.struct(
                cnt.alias("hits"), F.lit(-i).alias("nrank"), F.lit(lang).alias("lang")
            )
        )
    top = F.array_max(F.array(*ranked))
    return df.select(
        F.col(id_col).alias("id"),
        top["lang"].alias("lang_guess"),
        top["hits"].alias("lang_hits"),
    )


# GPT-2-style pre-tokenizer shape, ASCII-restricted so the identical
# pattern behaves the same in Spark (Java regex) and DuckDB (RE2):
# letter runs | digit runs | single non-alphanumeric-non-space marks.
BPE_PRETOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def bpe_token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """BPE-ish sub-token counting: ``(id, n_subtokens, n_distinct_subtokens)``.

    regexp_extract_all with the pre-tokenizer regex approximates a BPE
    tokenizer's pre-split stage (whitespace handled by \\s exclusion).
    """
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOKEN_RE), 0)
    return df.select(
        F.col(id_col).alias("id"),
        F.size(toks).cast("long").alias("n_subtokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_subtokens"),
    )


def text_fingerprint(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Document fingerprint: min/max k-shingle hash pair — a compact
    content signature stable under token reordering at the edges:
    ``(id, fp_min, fp_max)``."""
    # explode + partial-agg min/max: each shingle hash is computed once
    # (array_min + array_max on a shared array would re-evaluate the
    # md5 pipeline twice — Catalyst collapses projections), and the
    # groupBy combines map-side so the shuffle is one row per doc
    hashed = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), k)).alias("s"),
    ).select("id", hash60(F.col("s")).alias("h"))
    fp = hashed.groupBy("id").agg(
        F.min("h").alias("fp_min"), F.max("h").alias("fp_max")
    )
    # keep docs shorter than k words (no shingles) with NULL fingerprints
    return df.select(F.col(id_col).alias("id")).join(fp, "id", "left")


# Masking patterns shared with the DuckDB oracle: plain RE2/Java-common
# syntax (no lookaround, no shorthand differences).  Order matters —
# URLs are masked before emails so `user@host` inside a URL query
# string is not double-masked.
URL_RE = "https?://[^ \\t\\n\\r]+"
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
WS_RE = "[ \\t\\n\\r]+"


def normalize_text(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Training-corpus text normalization as one codegen projection:
    mask URLs/emails with placeholder tokens, collapse whitespace runs,
    trim, lowercase.  Returns ``(id, norm_text, n_urls, n_emails,
    n_chars_norm)``.

    Pure column expressions (regexp_replace/regexp_count are JVM-side),
    so normalizing 100 TB is a map-only pass with no Python in the
    loop; the identical regexes run in the DuckDB oracle.
    """
    t = F.col(text_col)
    masked = F.regexp_replace(t, URL_RE, "<URL>")
    masked = F.regexp_replace(masked, EMAIL_RE, "<EMAIL>")
    norm = F.lower(F.trim(F.regexp_replace(masked, WS_RE, " ")))
    return df.select(
        F.col(id_col).alias("id"),
        norm.alias("norm_text"),
        F.regexp_count(t, F.lit(URL_RE)).cast("long").alias("n_urls"),
        # count on the url-masked text, matching the masking order
        F.regexp_count(
            F.regexp_replace(t, URL_RE, "<URL>"), F.lit(EMAIL_RE)
        ).cast("long").alias("n_emails"),
        F.length(norm).cast("long").alias("n_chars_norm"),
    )


def split_text_chunks(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_size: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """RAG text splitting (reference auto-embed pipeline,
    src/embed/mod.rs:83 split_text): sliding character windows of
    ``chunk_size`` advancing by ``chunk_size - overlap``; a text that
    fits in one chunk stays whole, and the walk stops at the chunk
    that reaches the end.  Returns ``(id, chunk_index, chunk_text,
    n_chunk_chars)``.

    The downstream embedding call is an external-LLM boundary (embed/
    client.rs) and out of scope; this is the deterministic half every
    ingestion pipeline needs, expressed as sequence + explode +
    substring — pure codegen, map-only at 100 TB, and exactly
    replayable in SQL (generate_series).  Length semantics are
    CHARACTERS on both engines (the reference slices bytes; identical
    on ASCII corpora — divergence only on multi-byte text).
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    t = F.col(text_col)
    n_chunks = F.when(F.length(t) <= chunk_size, F.lit(1)).otherwise(
        F.lit(1)
        + F.ceil((F.length(t) - F.lit(chunk_size)) / F.lit(stride)).cast(
            "long"
        )
    )
    return (
        df.select(
            F.col(id_col).alias("id"),
            t.alias("__t"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_index"),
        )
        .select(
            "id",
            F.col("chunk_index").cast("long").alias("chunk_index"),
            F.substring(
                F.col("__t"),
                (F.col("chunk_index") * stride + 1).cast("int"),
                chunk_size,
            ).alias("chunk_text"),
        )
        .withColumn(
            "n_chunk_chars", F.length("chunk_text").cast("long")
        )
    )
