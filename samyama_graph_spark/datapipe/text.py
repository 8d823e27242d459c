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


def bpe_train(
    df: DataFrame,
    text_col: str,
    num_merges: int = 50,
    lowercase: bool = True,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Train a byte-pair-encoding merge table on the corpus (Sennrich
    et al. 2016), fully distributed: the corpus collapses once into a
    (word, freq) frame, each round counts adjacent symbol pairs with a
    transform/explode + one weighted groupBy (map-side partial agg) and
    collects exactly ONE row (the argmax pair; ties break
    lexicographically for determinism), then rewrites the symbol
    arrays with a left-to-right aggregate-HOF scan — no Python in the
    per-round hot path, the driver holds only the merge table
    (tokenizer-scale metadata, like a centroid codebook).

    Words carry the classic ``</w>`` end-of-word marker on their last
    character.  Plan depth grows one HOF per round, so the vocab frame
    localCheckpoints every ``checkpoint_every`` rounds (the frame is
    distinct-words-sized, far smaller than the corpus).

    Returns the ordered merge list ``[(left, right), ...]``.
    """
    text = F.col(text_col)
    if lowercase:
        text = F.lower(text)
    words = (
        df.select(
            F.explode(
                F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_RE), 0)
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # word -> symbol array: chars, last one suffixed with </w>
    chars = F.split(F.col("w"), "")
    syms = F.transform(
        chars,
        lambda c, i: F.when(
            i == F.size(chars) - 1, F.concat(c, F.lit("</w>"))
        ).otherwise(c),
    )
    vocab = words.select(syms.alias("syms"), "freq")

    merges: list[tuple[str, str]] = []
    for rnd in range(num_merges):
        pairs = (
            vocab.filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.size("syms") - 2),
                        lambda i: F.struct(
                            F.get("syms", i).alias("a"),
                            F.get("syms", i + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
        )
        top = pairs.orderBy(
            F.desc("n"), F.asc("a"), F.asc("b")
        ).limit(1).collect()
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        ab = a + b

        def merge_scan(syms_col, a=a, b=b, ab=ab):
            # left-to-right non-overlapping merge: append each symbol,
            # fusing it with the accumulator's tail when (tail, x) is
            # the merge pair.  get() is NULL-safe on the empty
            # accumulator (NULL != a), so no ANSI index error.
            return F.aggregate(
                syms_col,
                F.expr("CAST(array() AS array<string>)"),
                lambda acc, x: F.when(
                    (F.get(acc, F.size(acc) - 1) == F.lit(a))
                    & (x == F.lit(b)),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1),
                        F.array(F.lit(ab)),
                    ),
                ).otherwise(F.concat(acc, F.array(x))),
            )

        vocab = vocab.select(merge_scan(F.col("syms")).alias("syms"), "freq")
        if (rnd + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint()
    return merges


def bpe_encode(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
    lowercase: bool = True,
) -> DataFrame:
    """Encode text with a trained merge table: ``(id, tokens:
    array<string>, n_tokens)``.  The merge-rank dict ships once as a
    broadcast; each Arrow batch encodes in pandas with the standard
    lowest-rank-first merge loop (applying M merges as M nested
    JVM HOF passes would blow the plan up — the codebook-broadcast +
    vectorized-worker split used by the SemDeDup/PQ paths)."""
    import re as _re

    spark = df.sparkSession
    ranks = {pair: i for i, pair in enumerate(merges)}
    bc = spark.sparkContext.broadcast(ranks)
    pre = _re.compile(BPE_PRETOKEN_RE)

    def encode_word(word: str, rk) -> list:
        syms = [
            c + "</w>" if i == len(word) - 1 else c
            for i, c in enumerate(word)
        ]
        while len(syms) >= 2:
            best, bi = None, -1
            for i in range(len(syms) - 1):
                r = rk.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            syms[bi:bi + 2] = [syms[bi] + syms[bi + 1]]
        return syms

    def fn(batches):
        rk = bc.value
        cache: dict = {}
        for pdf in batches:
            toks = []
            for t in pdf["__text"]:
                t = t.lower() if lowercase else t
                out = []
                for w in pre.findall(t or ""):
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = encode_word(w, rk)
                    out.extend(got)
                toks.append(out)
            pdf = pdf.drop(columns=["__text"])
            pdf["tokens"] = toks
            pdf["n_tokens"] = [len(t) for t in toks]
            yield pdf

    src = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("__text")
    )
    return src.mapInPandas(
        fn, "id long, tokens array<string>, n_tokens long"
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
