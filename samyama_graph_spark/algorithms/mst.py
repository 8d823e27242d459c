"""Minimum spanning tree (forest) via Borůvka rounds.

Reference: crates/samyama-graph-algorithms/src/mst.rs:41 implements
Prim — inherently sequential (one frontier, one priority queue).  The
distributed equivalent is Borůvka: every component simultaneously
selects its minimum-weight outgoing edge, selected edges merge
components, repeat — O(log V) rounds, each a join + min_by aggregation.
Deterministic tie-breaking orders edges by (weight, src, dst).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from samyama_graph_spark.algorithms.util import checkpoint, vertices_from_edges
from samyama_graph_spark.algorithms.components import wcc


def mst(edges: DataFrame, weight_col: str = "weight", max_rounds: int = 30) -> DataFrame:
    """Minimum spanning forest edges: ``(src, dst, weight)``.

    Treats the graph as undirected; edges are canonicalized src<dst.
    """
    e = (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            F.col(weight_col).cast("double").alias("weight"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("weight"))
    )
    e = checkpoint(e)
    comp = checkpoint(
        vertices_from_edges(e).select("id", F.col("id").alias("comp"))
    )
    spark = edges.sparkSession
    chosen: DataFrame | None = None

    for _ in range(max_rounds):
        cs = comp.withColumnRenamed("id", "src").withColumnRenamed("comp", "c_src")
        cd = comp.withColumnRenamed("id", "dst").withColumnRenamed("comp", "c_dst")
        cross = (
            e.join(cs, "src").join(cd, "dst")
            .filter(F.col("c_src") != F.col("c_dst"))
        )
        # each component's minimum outgoing edge, deterministic tie-break
        key = F.struct(
            F.col("weight"), F.col("src"), F.col("dst")
        ).alias("k")
        picks = (
            cross.select(F.col("c_src").alias("comp"), key)
            .unionByName(cross.select(F.col("c_dst").alias("comp"), key))
            .groupBy("comp")
            .agg(F.min("k").alias("k"))
            .select("k.weight", "k.src", "k.dst")
            .select("src", "dst", "weight")
            .distinct()
        )
        # ONE job per round here: the count materializes the lazy
        # checkpoint (pinning this round's picks + the prior round's
        # lazily-checkpointed comp in its lineage) AND doubles as the
        # termination test — no separate cross.limit(1) probe job
        picks = checkpoint(picks, eager=False)
        if picks.count() == 0:
            break
        # a picked edge joins two components that merge this round, so
        # it can never be re-picked (its endpoints share a component
        # from now on): the accumulator needs no dedup and, being a
        # union of already-checkpointed frames, no checkpoint either
        chosen = picks if chosen is None else chosen.unionByName(picks)
        # contract: components connected by chosen edges merge (WCC on
        # the component graph, vertex count = current component count)
        comp_edges = (
            picks.join(cs, "src").join(cd, "dst")
            .select(F.col("c_src").alias("src"), F.col("c_dst").alias("dst"))
        )
        # (id=old comp, component=new comp); batched convergence checks
        merged = wcc(comp_edges, check_interval=3)
        comp = checkpoint(
            comp.join(
                merged.withColumnRenamed("id", "comp").withColumnRenamed(
                    "component", "new_comp"
                ),
                "comp",
                "left",
            ).select(
                "id", F.coalesce("new_comp", "comp").alias("comp")
            ),
            eager=False,
        )
    if chosen is None:
        return spark.createDataFrame([], "src long, dst long, weight double")
    return chosen


def mst_total_weight(edges: DataFrame, weight_col: str = "weight") -> float:
    t = mst(edges, weight_col).agg(F.sum("weight")).first()[0]
    return float(t or 0.0)
