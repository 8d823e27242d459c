"""Connected components (WCC) and community detection (CDLP).

Reference semantics: crates/samyama-graph-algorithms/src/community.rs:58
(WCC) and cdlp.rs:38 (synchronous label propagation, LDBC Graphalytics
CDLP: label := smallest among the most frequent neighbor labels, fixed
iteration count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from samyama_graph_spark.algorithms.util import (
    checkpoint,
    symmetrize,
    vertices_from_edges,
)


def wcc(
    edges: DataFrame, max_iterations: int = 50, check_interval: int = 2
) -> DataFrame:
    """Weakly connected components: ``(id, component)`` where component
    is the minimum vertex id in the component.

    Min-id propagation over the undirected edge set until fixpoint —
    O(diameter) rounds of (join on src, min by dst).  Each round is
    two shuffles on the same key layout; lineage checkpointed per
    round.  (Hash-to-min converges fine at this diameter; large-star/
    small-star would cut round count on very-high-diameter graphs.)

    The convergence count runs every ``check_interval`` rounds, not
    every round: a fixpoint is reached exactly when the LAST round
    changed nothing, so intermediate rounds need no action — on a
    scheduler-bound local run (and on a busy cluster) the per-job floor
    dominates the tiny per-round work, and batching checks cuts the
    scheduled-job count by the interval factor.
    """
    und = checkpoint(symmetrize(edges), eager=False)
    comp = vertices_from_edges(edges).select(
        "id", F.col("id").alias("component")
    )
    comp = checkpoint(comp, eager=False)

    it = 0
    while it < max_iterations:
        steps = min(max(check_interval, 1), max_iterations - it)
        for _ in range(steps):
            # candidate = min component among in-neighbors (undirected)
            cand = (
                und.join(comp, und["src"] == comp["id"])
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("component").alias("nbr_min"))
            )
            # carry the changed flag INSIDE the checkpointed frame so
            # the convergence check is a count() on it — materializing
            # the lazy checkpoints and testing the fixpoint in ONE job
            new_comp = (
                comp.join(cand, "id", "left")
                .select(
                    "id",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("nbr_min"), F.col("component")),
                    ).alias("component"),
                    F.coalesce(
                        F.col("nbr_min") < F.col("component"), F.lit(False)
                    ).alias("chg"),
                )
            )
            new_comp = checkpoint(new_comp, eager=False)
            comp = new_comp.select("id", "component")
            it += 1
        changed = new_comp.filter("chg").count()
        if changed == 0:
            break
    return comp


def cdlp(edges: DataFrame, iterations: int = 10) -> DataFrame:
    """Community detection by synchronous label propagation.

    LDBC/Graphalytics CDLP rule (reference cdlp.rs:84-120): each round
    every vertex adopts the smallest label among the most frequent
    labels of its neighbor MULTISET — successors plus predecessors,
    no dedup, so a reciprocal edge pair contributes the neighbor's
    label twice, exactly like the reference's successors()/
    predecessors() double loop.  Returns ``(id, label)``.
    """
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    nbrs = checkpoint(fwd.unionAll(rev), eager=False)
    labels = vertices_from_edges(edges).select("id", F.col("id").alias("label"))
    labels = checkpoint(labels, eager=False)

    cached_rounds: list[DataFrame] = []
    for it in range(iterations):
        counts = (
            nbrs.join(labels, nbrs["src"] == labels["id"])
            .groupBy(F.col("dst").alias("vid"), F.col("label"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # smallest among the most-frequent labels == min of (-cnt,
        # label): a partial-aggregating hash agg instead of a
        # partition-sort window (same shuffle key, no sort, and
        # map-side combine shrinks what's shuffled)
        best = (
            counts.groupBy(F.col("vid").alias("id"))
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("nc"),
                        F.col("label").alias("l"),
                    )
                ).alias("m")
            )
            .select("id", F.col("m.l").alias("new_label"))
        )
        labels = (
            labels.join(best, "id", "left")
            .select(
                "id", F.coalesce(F.col("new_label"), F.col("label")).alias("label")
            )
        )
        # fixed iteration count (no convergence action needed): cache
        # intermediate rounds with no action, eager-checkpoint every 3rd
        # to truncate lineage — one scheduled job per interval.  Within
        # that one checkpoint job each cached round is computed once and
        # reused by its two consumers (the next round's counts join and
        # the label carry-over join); the superseded round caches are
        # unpersisted as soon as the checkpoint holds the data.
        if (it + 1) % 3 == 0:
            labels = checkpoint(labels)
            for c in cached_rounds:
                c.unpersist()
            cached_rounds = []
        else:
            labels = labels.cache()
            cached_rounds.append(labels)
    # rounds cached after the last eager checkpoint stay persisted: the
    # caller's first action still needs them (unpersisting here would
    # force a recompute).  They are reclaimed by the ContextCleaner once
    # the returned frame drops out of scope — a bounded tail of at most
    # two round frames, not an unbounded leak.
    return checkpoint(labels, eager=False)
