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
) -> DataFrame:
    """Returns ``(id, rank)``; ranks sum to ~1."""
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
    deg = checkpoint(deg)

    ranks = deg.withColumn("rank", F.lit(1.0 / n))

    for _ in range(iterations):
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
        ranks = checkpoint(ranks)

    return ranks.select("id", "rank")
