"""PageRank as iterative DataFrame joins.

Semantics follow the reference implementation
(crates/samyama-graph-algorithms/src/pagerank.rs:35; configurable
iterations + damping) and LDBC Graphalytics: fixed iteration count,
uniform init 1/N, dangling-node mass redistributed uniformly each
iteration.

Scale notes: contributions = edges ⋈ ranks on src (shuffle on src),
aggregated by dst (shuffle on dst).  Both shuffles reuse the same
hash partitioning across iterations; ranks are localCheckpoint'ed
every iteration to keep lineage flat.  The dangling sum is a scalar
``first()`` — O(1) driver traffic per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from samyama_graph_spark.algorithms.util import checkpoint, vertices_from_edges


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    vertices: DataFrame | None = None,
    checkpoint_interval: int = 3,
) -> DataFrame:
    """Returns ``(id, rank)``; ranks sum to ~1.

    Intermediate iterations are ``cache()``d (no action — each rank
    frame still computes exactly once inside whatever job first needs
    it, since every iteration references its predecessor from two
    branches: the dangling sum and the contribution join); an EAGER
    checkpoint runs only every ``checkpoint_interval`` rounds to
    truncate lineage.  This cuts scheduled jobs from one-per-iteration
    to one-per-interval — the per-job constant dominates at small SF,
    and at cluster scale fewer barriers means better pipelining.
    """
    if vertices is None:
        vertices = vertices_from_edges(edges)
    v = vertices.select("id")
    n = v.count()
    if n == 0:
        return v.withColumn("rank", F.lit(0.0))

    e = edges.select("src", "dst")
    out_deg = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    # (id, out_deg) with 0 for sinks; reused every iteration — cache-worthy.
    deg = v.join(out_deg, "id", "left").fillna(0, subset=["out_deg"])
    deg = checkpoint(deg, eager=False)  # materializes in round-1 job

    ranks = deg.withColumn("rank", F.lit(1.0 / n))

    for it in range(iterations):
        # dangling mass as a broadcast 1-row frame: keeps each iteration
        # ONE job (the eager checkpoint) instead of a separate scalar
        # first() action + the checkpoint job
        dang = ranks.filter(F.col("out_deg") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang")
        )
        contrib = (
            e.join(ranks, e["src"] == ranks["id"])
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("msg"))
        )
        base = (
            F.lit((1.0 - damping) / n)
            + F.lit(damping / n) * F.col("__dang")
        )
        ranks = (
            deg.join(contrib, "id", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "id",
                "out_deg",
                (base + F.lit(damping) * F.coalesce(F.col("msg"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
        if (it + 1) % checkpoint_interval == 0:
            ranks = checkpoint(ranks)  # eager: one job per interval
        else:
            ranks = ranks.cache()  # no action; computed once, on demand

    return checkpoint(ranks.select("id", "rank"), eager=False)
