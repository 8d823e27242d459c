"""Strongly connected components.

Reference: community.rs:96 (Tarjan-style sequential SCC).  The
distributed formulation is iterative forward-backward coloring: let
fwd(v) = min id among vertices that can REACH v (min-label propagation
along edge direction) and bwd(v) = min id among vertices v can reach
(propagation along reversed edges).  Vertices with fwd(v) == bwd(v) == m
form exactly the SCC containing m (m reaches v and v reaches m);
settled vertices are removed and the process repeats on the remainder.
Each phase is a WCC-style min-propagation loop, so the total work is
O(settle_rounds * diameter) shuffles — fine for graphs whose SCC
structure collapses quickly, documented as the scale trade-off
(Tarjan is inherently sequential; this is the standard distributed
compromise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from samyama_graph_spark.algorithms.util import checkpoint, vertices_from_edges


def _min_propagate(
    edges: DataFrame, verts: DataFrame, max_rounds: int
) -> DataFrame:
    """Directed min-label propagation: label(v) = min id over
    {u : path u ->* v} ∪ {v}.  Returns (id, label)."""
    labels = checkpoint(verts.select("id", F.col("id").alias("label")))
    for _ in range(max_rounds):
        cand = (
            edges.join(labels, edges["src"] == labels["id"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nbr_min"))
        )
        # changed flag carried inside the frame: the count() below
        # materializes the lazy checkpoint AND tests the fixpoint in
        # one scheduled job (see components.wcc)
        new_labels = checkpoint(
            labels.join(cand, "id", "left").select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
                ).alias("label"),
                F.coalesce(
                    F.col("nbr_min") < F.col("label"), F.lit(False)
                ).alias("chg"),
            ),
            eager=False,
        )
        changed = new_labels.filter("chg").count()
        labels = new_labels.select("id", "label")
        if changed == 0:
            break
    return labels


def scc(
    edges: DataFrame, max_outer: int = 20, max_inner: int = 50
) -> DataFrame:
    """``(id, component)`` where component is the minimum vertex id of
    the strongly connected component."""
    e_all = checkpoint(edges.select("src", "dst").distinct())
    remaining = checkpoint(vertices_from_edges(edges))
    rev = e_all.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    spark = edges.sparkSession
    result: DataFrame | None = None

    for _ in range(max_outer):
        if remaining.limit(1).count() == 0:
            break
        ids = remaining.select("id")
        e = (
            e_all.join(ids, e_all["src"] == ids["id"], "left_semi")
            .join(ids, F.col("dst") == ids["id"], "left_semi")
        )
        e = checkpoint(e)
        erev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        fwd = _min_propagate(e, remaining, max_inner)
        bwd = _min_propagate(erev, remaining, max_inner)
        settled = (
            fwd.withColumnRenamed("label", "f")
            .join(bwd.withColumnRenamed("label", "b"), "id")
            .filter(F.col("f") == F.col("b"))
            .select("id", F.col("f").alias("component"))
        )
        settled = checkpoint(settled)
        result = settled if result is None else result.unionByName(settled)
        remaining = checkpoint(
            remaining.join(settled.select("id"), "id", "left_anti")
        )
    if result is None:
        result = spark.createDataFrame([], "id long, component long")
    return result
