"""Shared primitives for the datapipe operators."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash60(col: Column) -> Column:
    """Deterministic 60-bit hash: int(md5(s)[0:15], 16).

    Chosen because the identical expression exists in any SQL engine
    with md5 (DuckDB: ``('0x' || substr(md5(s),1,15))::BIGINT``), so
    every hash-derived operator (MinHash, SimHash, fingerprints) is
    cross-engine reproducible.  60 bits keeps the value positive in a
    signed 64-bit long.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    """The DuckDB-side twin of hash60 (keep in lockstep!)."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def seeded(seed: int, col: Column) -> Column:
    """Family of independent hash functions: H_i(s) = hash60(i || '|' || s)."""
    return hash60(F.concat(F.lit(str(seed)), F.lit("|"), col))


def seeded_sql(seed: int, expr: str) -> str:
    return hash60_sql(f"'{seed}' || '|' || {expr}")


def tokens(col: Column) -> Column:
    """Whitespace tokenization (single-space split for cross-engine
    parity with DuckDB string_split)."""
    return F.split(col, " ")


def word_shingles(col: Column, k: int = 3) -> Column:
    """Array of k-word shingles joined by single spaces.

    Built as arrays_zip of k shifted slices + one transform — the
    tokenization is evaluated a constant k+1 times per row.  (The
    naive transform-with-element_at formulation re-evaluates the
    split() subtree for every element access when the expression falls
    out of codegen — O(words^2) per document, a real stall on long
    docs.)  Documents shorter than k words produce an empty array.
    """
    ws = tokens(col)
    cnt = F.greatest(F.size(ws) - (k - 1), F.lit(0))
    parts = [F.slice(ws, j + 1, cnt) for j in range(k)]
    zipped = F.arrays_zip(*parts)
    return F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(k)])
    )
