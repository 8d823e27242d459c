"""Sequence packing for LLM pretraining: concatenate documents and cut
into fixed token-budget chunks ("concat-and-chunk", the standard GPT
pretraining packing).

The pack assignment is a closed-form window computation — no UDF, no
iteration:

    start(doc)     = sum(tokens) over docs before it in its shard
    first_pack     = floor(start / budget)
    last_pack      = floor((start + tokens - 1) / budget)

Documents are ordered deterministically (by id) within a shard, so the
layout is reproducible run-to-run.  At 100 TB the window never becomes
a bottleneck because the cumulative sum is computed PER SHARD (the
partition key a real pipeline already carries: language, source, or an
explicit shard id) — one shuffle on the shard key, each window sized to
one shard.  A global single-window packing would serialize onto one
task; requiring a shard column makes the scalable layout the only
layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_chunks(
    df: DataFrame,
    token_col: str,
    budget: int,
    shard_col: str,
    id_col: str,
) -> DataFrame:
    """Per-document pack assignment within each shard.

    Returns the input plus ``start_tok`` (exclusive cumulative tokens
    before this doc), ``first_pack`` / ``last_pack`` (budget-sized
    chunk indices the doc's tokens land in), and ``n_splits`` (how many
    pack boundaries cut through the doc).  Zero-token docs occupy no
    tokens; they attach to ``first_pack`` at their start offset.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    w = Window.partitionBy(shard_col).orderBy(id_col)
    toks = F.col(token_col).cast("long")
    start = F.coalesce(
        F.sum(toks).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    # ONE window pass; pack indices derive from the materialized
    # start_tok column (integer `div`, exact at any token count —
    # float floor() loses exactness past 2^53 tokens)
    base = df.withColumn("start_tok", start)
    first = F.expr(f"start_tok div {budget}")
    last = F.expr(
        f"(start_tok + greatest(cast({token_col} as bigint) - 1L, 0L)) "
        f"div {budget}"
    )
    return (
        base.withColumn("first_pack", first)
        .withColumn("last_pack", last)
        .withColumn(
            "n_splits", (F.col("last_pack") - F.col("first_pack")).cast("long")
        )
    )


def pack_stats(
    df: DataFrame,
    token_col: str,
    budget: int,
    shard_col: str,
    id_col: str,
) -> DataFrame:
    """Per-shard packing summary: documents, tokens, packs produced
    (= ceil(tokens/budget)), docs split across a pack boundary, and the
    fill ratio of the final (partial) pack."""
    packed = pack_chunks(df, token_col, budget, shard_col, id_col)
    toks = F.col(token_col).cast("long")
    return (
        packed.groupBy(F.col(shard_col).alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks).alias("n_tokens"),
            F.ceil(F.sum(toks) / budget).cast("long").alias("n_packs"),
            F.sum((F.col("n_splits") > 0).cast("long")).alias("n_split_docs"),
            F.round(
                (F.sum(toks) % budget) / F.lit(float(budget)), 6
            ).alias("tail_fill"),
        )
    )


def pack_first_fit(
    df: DataFrame,
    token_col: str,
    budget: int,
    shard_col: str,
    id_col: str,
) -> DataFrame:
    """No-split packing: every document lands WHOLE in exactly one
    pack — first-fit-decreasing per shard — for the pipelines where
    cutting a document across packs is unacceptable (SFT corpora,
    long-context evals).  Docs longer than the budget become singleton
    packs flagged ``oversize``.

    Deterministic: docs sort by (tokens desc, id asc) before placement,
    so the layout replays run-to-run.  Distributed shape mirrors
    pack_chunks: the greedy state lives PER SHARD (the partition key a
    real pipeline already carries), one applyInPandas task per shard —
    a global first-fit would serialize the corpus onto one task.
    Returns (shard, id, tokens, pack, oversize).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    import pandas as pd

    out_schema = (
        f"{shard_col} string, {id_col} long, tokens long, "
        "pack long, oversize boolean"
    )

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["__t", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        loads: list[int] = []  # current fill per pack
        packs = []
        oversize = []
        for t in pdf["__t"]:
            t = int(t)
            if t > budget:
                packs.append(len(loads))
                loads.append(t)
                oversize.append(True)
                continue
            # first fit: lowest-index pack with room
            for i, ld in enumerate(loads):
                if ld + t <= budget:
                    loads[i] = ld + t
                    packs.append(i)
                    break
            else:
                packs.append(len(loads))
                loads.append(t)
            oversize.append(False)
        return pd.DataFrame(
            {
                shard_col: pdf[shard_col].astype(str),
                id_col: pdf[id_col].astype("int64"),
                "tokens": pdf["__t"].astype("int64"),
                "pack": pd.Series(packs, dtype="int64"),
                "oversize": pd.Series(oversize, dtype="bool"),
            }
        )

    base = df.select(
        F.col(shard_col).cast("string").alias(shard_col),
        F.col(id_col).cast("long").alias(id_col),
        F.col(token_col).cast("long").alias("__t"),
    )
    return base.groupBy(shard_col).applyInPandas(ffd, out_schema)
