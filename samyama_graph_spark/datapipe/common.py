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


# Universal-hash mixing family over ONE base hash: h_i = (a_i*h + b_i)
# mod p with p = 2^31 - 1 (prime), h reduced to 30 bits so a_i*h stays
# far under 2^63 in BOTH engines' BIGINT arithmetic.  One md5 per input
# replaces num_hashes md5s — the md5 is the dominant cost of a MinHash
# signature pass at corpus scale.
HASH_FAMILY_P = 2_147_483_647
HASH_FAMILY_M = 1 << 30
_HF_B = 2_654_435_761  # Knuth multiplicative constant


def hash_family_member(base: Column, i: int) -> Column:
    """i-th family hash of an already-hash60'd base column."""
    a = 2 * i + 1
    b = (i * _HF_B) % HASH_FAMILY_P
    return (
        (F.lit(a) * (base % F.lit(HASH_FAMILY_M)) + F.lit(b))
        % F.lit(HASH_FAMILY_P)
    ).cast("long")


def hash_family_member_sql(base_expr: str, i: int) -> str:
    """DuckDB twin of :func:`hash_family_member` (keep in lockstep!)."""
    a = 2 * i + 1
    b = (i * _HF_B) % HASH_FAMILY_P
    return (
        f"(({a} * (({base_expr}) % {HASH_FAMILY_M}) + {b})"
        f" % {HASH_FAMILY_P})"
    )


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
