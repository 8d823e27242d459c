"""Shared helpers for iterative DataFrame algorithms."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def vertices_from_edges(edges: DataFrame) -> DataFrame:
    """Distinct vertex ids appearing as src or dst."""
    return (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def symmetrize(edges: DataFrame, distinct: bool = True) -> DataFrame:
    """Undirected view: both directions, self-loops dropped, distinct.

    Mirrors the reference algorithms' undirected mode
    (crates/samyama-graph-algorithms; direction config per algorithm).

    ``distinct=False`` skips the dedup shuffle — pass it when the input
    is already a distinct canonical (src < dst) edge set, where the
    two directions cannot collide.
    """
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    out = fwd.unionAll(rev).filter(F.col("src") != F.col("dst"))
    return out.distinct() if distinct else out


def checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate lineage between iterations.

    localCheckpoint materializes to executor storage without needing a
    checkpoint dir; on a cluster with flaky executors prefer
    ``sparkContext.setCheckpointDir`` + ``df.checkpoint()``.
    """
    return df.localCheckpoint(eager=eager)
