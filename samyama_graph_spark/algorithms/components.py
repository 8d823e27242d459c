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
    DRIVER_EDGE_GUARD,
    checkpoint,
    driver_union_find,
    edges_pdf_if_small,
    iteration_scope,
    partitioned,
    symmetrize,
    vertices_from_edges,
)


def wcc_two_phase(
    edges: DataFrame,
    max_iterations: int = 50,
    _stats: dict | None = None,
) -> DataFrame:
    """WCC by alternating large-star / small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond"):
    ``(id, component)`` with component = min id, identical output to
    the hash-to-min ``wcc``.

    Each round halves long chains, so convergence is O(log^2 n) rounds
    independent of graph DIAMETER — the variant to pick when the graph
    is a few very long paths/cycles (hash-to-min needs one round per
    hop of diameter).  The price is that both phases recompute
    neighborhood minima over the full evolving edge set (two extra
    aggregations per round), so on low-diameter graphs — most real
    ones — hash-to-min does less work; that is why this is a flag, not
    the default (``wcc(variant='two_phase')``).

    large-star(u): every neighbor v > u connects to
    m = min(N(u) ∪ {u}); small-star(u): every neighbor v <= u and u
    itself connect to m.  Fixpoint = the edge set is a stable set of
    (node -> component-min) stars; checked exactly (count + anti-join
    probe), no fingerprint shortcuts.
    """
    spark = edges.sparkSession
    rounds = 0
    with iteration_scope(spark, edges):
        e = checkpoint(
            symmetrize(edges).filter(F.col("src") < F.col("dst")).distinct(),
            eager=False,
        )
        verts = vertices_from_edges(edges)

        def star(pairs: DataFrame, large: bool) -> DataFrame:
            sym = symmetrize(pairs, distinct=False)
            m = sym.groupBy("src").agg(
                F.least(F.min("dst"), F.col("src")).alias("m")
            )
            joined = sym.join(m, "src")
            keep = (
                (F.col("dst") > F.col("src"))
                if large
                else (F.col("dst") <= F.col("src"))
            )
            out = joined.filter(keep).select(
                F.col("dst").alias("a"), F.col("m").alias("b")
            )
            if not large:
                out = out.unionByName(
                    m.select(F.col("src").alias("a"), F.col("m").alias("b"))
                )
            return (
                out.filter(F.col("a") != F.col("b"))
                .select(
                    F.greatest("a", "b").alias("src"),
                    F.least("a", "b").alias("dst"),
                )
                .distinct()
            )

        n_old = e.count()
        while rounds < max_iterations:
            e1 = star(e, large=True)
            e2 = checkpoint(star(e1, large=False), eager=False)
            rounds += 1
            # exact stability: same cardinality and no new pairs
            # (n_old carried from the previous round's count)
            n_new = e2.count()
            if n_old == n_new:
                if (
                    e2.join(e, ["src", "dst"], "left_anti").limit(1).count()
                    == 0
                ):
                    e = e2
                    break
            e = e2
            n_old = n_new
    if _stats is not None:
        _stats["rounds"] = rounds
    # stable stars: src (> dst) points at its component min; roots and
    # isolated vertices map to themselves
    comp = e.select(F.col("src").alias("id"), F.col("dst").alias("component"))
    return (
        verts.join(comp, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
    )


def wcc(
    edges: DataFrame,
    max_iterations: int = 50,
    check_interval: int = 2,
    driver_guard: int = DRIVER_EDGE_GUARD,
    variant: str = "hash_to_min",
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

    ``driver_guard > 0`` (the default) enables a guarded driver fast
    path: if the edge list fits under the guard (one early-out probe,
    Arrow-batched transfer), components are settled by union-find on
    the driver — the reference's own WCC is sequential
    (community.rs:58), and post-filter graphs like dup-pair clusters
    or Borůvka contraction are bounded by construction.  Components
    are unique, so both paths return identical output; pass 0 to
    force the distributed loop.

    ``variant='two_phase'`` switches to large-star/small-star
    contraction (wcc_two_phase) for very-high-diameter graphs.
    """
    if variant == "two_phase":
        return wcc_two_phase(edges, max_iterations)
    if variant != "hash_to_min":
        raise ValueError(f"unknown wcc variant {variant!r}")
    if driver_guard > 0:
        pdf = edges_pdf_if_small(
            edges.select("src", "dst"), driver_guard
        )
        if pdf is not None:
            import pandas as pd

            comp_map = driver_union_find(
                zip(pdf.iloc[:, 0].tolist(), pdf.iloc[:, 1].tolist())
            )
            spark = edges.sparkSession
            if not comp_map:
                return spark.createDataFrame([], "id long, component long")
            # pandas frame -> Arrow-serialized transfer; a plain list of
            # tuples pickles row-by-row (measured ~1 s at 165k vertices
            # vs ~0.1 s through Arrow)
            out = pd.DataFrame(
                sorted(comp_map.items()), columns=["id", "component"]
            )
            return spark.createDataFrame(
                out, schema="id long, component long"
            )
    with iteration_scope(edges.sparkSession, edges):
        # distinct=False: min-aggregation is idempotent, so duplicate
        # (src, dst) rows cannot change the fixpoint — skipping the
        # dedup saves a full shuffle of the edge set.  Vertices come
        # from the RAW edge list: symmetrize drops self-loops, and a
        # vertex whose only edges are self-loops must still appear as
        # its own singleton component (parity with the driver path).
        und = partitioned(symmetrize(edges, distinct=False), "src")
        comp = vertices_from_edges(edges).select(
            "id", F.col("id").alias("component")
        )
        comp = checkpoint(comp, eager=False)

        it = 0
        while it < max_iterations:
            steps = min(max(check_interval, 1), max_iterations - it)
            for _ in range(steps):
                # candidate = min component among in-neighbors
                # (undirected); und side is exchange-free (partitioned
                # on src), comp reshuffles hash(id) each round — only
                # the vertex frame moves
                cand = (
                    und.join(
                        comp.hint("shuffle_hash"), und["src"] == comp["id"]
                    )
                    .groupBy(F.col("dst").alias("id"))
                    .agg(F.min("component").alias("nbr_min"))
                )
                # carry the changed flag INSIDE the checkpointed frame
                # so the convergence check is a count() on it —
                # materializing the lazy checkpoints and testing the
                # fixpoint in ONE job per batch
                new_comp = (
                    comp.join(cand, "id", "left")
                    .select(
                        "id",
                        F.least(
                            F.col("component"),
                            F.coalesce(F.col("nbr_min"), F.col("component")),
                        ).alias("component"),
                        F.coalesce(
                            F.col("nbr_min") < F.col("component"),
                            F.lit(False),
                        ).alias("chg"),
                    )
                )
                new_comp = checkpoint(new_comp, eager=False)
                comp = new_comp.select("id", "component")
                it += 1
            changed = new_comp.filter("chg").count()
            if changed == 0:
                break
        # the count above materialized the final round's checkpoint, so
        # the persisted edge frame is no longer needed
        und.unpersist()
    return comp


def _cdlp_driver(spark, pdf, iterations):
    """Vectorized synchronous label propagation over a collected edge
    list — the same smallest-among-most-frequent rule as the
    distributed loop, O(E log E) numpy per round (one lexsort over the
    neighbor-label multiset).  Mirrors the reference's sequential
    solver (cdlp.rs:84-120)."""
    import numpy as np
    import pandas as pd

    src = pdf.iloc[:, 0].to_numpy(dtype=np.int64, copy=False)
    dst = pdf.iloc[:, 1].to_numpy(dtype=np.int64, copy=False)
    vid = np.unique(np.concatenate([src, dst]))
    n = int(vid.size)
    if n == 0:
        return spark.createDataFrame([], "id long, label long")
    si = np.searchsorted(vid, src)
    di = np.searchsorted(vid, dst)
    # neighbor multiset both directions: vertex recv[k] sees the label
    # of nbr[k]; a reciprocal edge pair contributes twice, exactly like
    # the reference's successors()/predecessors() double loop
    recv = np.concatenate([di, si])
    nbr = np.concatenate([si, di])
    lab = np.arange(n, dtype=np.int64)  # label index == vertex index
    for _ in range(iterations):
        # count (vertex, neighbor-label) occurrences via a composite
        # key; labels are always original vertex ids, and vid is sorted
        # ascending, so min over label INDEX == min over label VALUE
        key = recv * np.int64(n) + lab[nbr]
        uk, cnt = np.unique(key, return_counts=True)
        kv = uk // n
        kl = uk % n
        # per vertex: max count, ties -> smallest label
        order = np.lexsort((kl, -cnt, kv))
        kvs = kv[order]
        first = np.ones(kvs.size, dtype=bool)
        first[1:] = kvs[1:] != kvs[:-1]
        new_lab = lab.copy()
        new_lab[kvs[first]] = kl[order][first]
        lab = new_lab
    return spark.createDataFrame(
        pd.DataFrame({"id": vid, "label": vid[lab]}),
        schema="id long, label long",
    )


def cdlp(
    edges: DataFrame,
    iterations: int = 10,
    driver_guard: int = DRIVER_EDGE_GUARD,
) -> DataFrame:
    """Community detection by synchronous label propagation.

    LDBC/Graphalytics CDLP rule (reference cdlp.rs:84-120): each round
    every vertex adopts the smallest label among the most frequent
    labels of its neighbor MULTISET — successors plus predecessors,
    no dedup, so a reciprocal edge pair contributes the neighbor's
    label twice, exactly like the reference's successors()/
    predecessors() double loop.  Returns ``(id, label)``.

    Driver fast path (same guard as BFS/SSSP/PageRank): below
    ``driver_guard`` edges the propagation settles on the driver with
    one numpy lexsort per round instead of one shuffle job per round;
    the distributed loop below is the ≥guard path, same rule.
    """
    spark = edges.sparkSession
    pdf = edges_pdf_if_small(edges.select("src", "dst"), driver_guard)
    if pdf is not None:
        return _cdlp_driver(spark, pdf, iterations)
    with iteration_scope(edges.sparkSession, edges):
        fwd = edges.select("src", "dst")
        rev = edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
        nbrs = partitioned(fwd.unionAll(rev), "src")
        labels = vertices_from_edges(nbrs).select(
            "id", F.col("id").alias("label")
        )
        labels = checkpoint(labels)

        for _ in range(iterations):
            counts = (
                nbrs.join(
                    labels.hint("shuffle_hash"), nbrs["src"] == labels["id"]
                )
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
                labels.join(best.hint("shuffle_hash"), "id", "left")
                .select(
                    "id",
                    F.coalesce(F.col("new_label"), F.col("label")).alias(
                        "label"
                    ),
                )
            )
            # eager checkpoint EVERY round: exactly one scheduled job
            # per round, each round computed exactly once.  (The prior
            # cache-with-no-action scheme let the two consumers of a
            # round race to compute it lazily — measured 6× slower at
            # 10 iterations than this, the round-3 wall-time fragility.)
            labels = checkpoint(labels)
        nbrs.unpersist()
    return labels
