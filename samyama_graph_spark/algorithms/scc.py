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

from samyama_graph_spark.algorithms.util import (
    DRIVER_EDGE_GUARD,
    checkpoint,
    collect_if_small,
    iteration_scope,
    partitioned,
    vertices_from_edges,
)


def _tarjan_components(edge_rows) -> dict:
    """Iterative Tarjan over a collected edge list: {vertex: min id of
    its SCC}.  Runs driver-side under the size guard — the reference's
    own execution model (community.rs:96 is sequential Tarjan).  SCC
    membership is unique, so this is exactly the distributed result."""
    adj: dict = {}
    verts: set = set()
    for s, d in edge_rows:
        adj.setdefault(s, []).append(d)
        verts.add(s)
        verts.add(d)
    index: dict = {}
    low: dict = {}
    on_stack: set = set()
    stack: list = []
    comp: dict = {}
    counter = 0
    for root in verts:
        if root in index:
            continue
        # explicit DFS stack of (vertex, iterator position)
        work = [(root, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack.add(v)
            nbrs = adj.get(v, ())
            recursed = False
            for i in range(pi, len(nbrs)):
                w = nbrs[i]
                if w not in index:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    recursed = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recursed:
                continue
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                m = min(members)
                for w in members:
                    comp[w] = m
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])
    return comp


def _min_propagate_bidir(
    e: DataFrame, verts: DataFrame, max_rounds: int, check_interval: int = 3
) -> DataFrame:
    """Forward AND backward min-label propagation in ONE loop: edges
    carry a direction tag (0 = original orientation, 1 = reversed) and
    labels are keyed (dir, id), so each round is a single join +
    aggregation + fused convergence count instead of two independent
    loops — half the scheduled jobs, same fixpoint.  The convergence
    count runs every ``check_interval`` rounds (fixpoint <=> the LAST
    round changed nothing), batching several propagation rounds into
    one scheduled job — the job floor, not the per-round work, is the
    binding constraint for these tiny vertex frames.  Returns
    ``(id, f, b)``: min id that reaches v / min id v reaches."""
    both = e.select(F.lit(0).alias("d"), "src", "dst").unionByName(
        e.select(
            F.lit(1).alias("d"),
            F.col("dst").alias("src"),
            F.col("src").alias("dst"),
        )
    )
    both = checkpoint(both, eager=False)
    labels = checkpoint(
        verts.select("id", F.col("id").alias("label"))
        .crossJoin(F.broadcast(
            verts.sparkSession.range(2).select(F.col("id").alias("d"))
        ))
        .select("d", "id", "label"),
        eager=False,
    )
    it = 0
    while it < max_rounds:
        steps = min(max(check_interval, 1), max_rounds - it)
        for _ in range(steps):
            cand = (
                both.join(
                    labels,
                    (both["src"] == labels["id"]) & (both["d"] == labels["d"]),
                )
                .groupBy(both["d"].alias("d"), F.col("dst").alias("id"))
                .agg(F.min("label").alias("nbr_min"))
            )
            # changed flag inside the frame: one job materializes the
            # lazy checkpoints of the whole batch AND tests the fixpoint
            new_labels = checkpoint(
                labels.join(cand, ["d", "id"], "left").select(
                    "d",
                    "id",
                    F.least(
                        F.col("label"),
                        F.coalesce(F.col("nbr_min"), F.col("label")),
                    ).alias("label"),
                    F.coalesce(
                        F.col("nbr_min") < F.col("label"), F.lit(False)
                    ).alias("chg"),
                ),
                eager=False,
            )
            labels = new_labels.select("d", "id", "label")
            it += 1
        changed = new_labels.filter("chg").count()
        if changed == 0:
            break
    fwd = labels.filter(F.col("d") == 0).select("id", F.col("label").alias("f"))
    bwd = labels.filter(F.col("d") == 1).select("id", F.col("label").alias("b"))
    return fwd.join(bwd, "id")


def scc(
    edges: DataFrame,
    max_outer: int = 20,
    max_inner: int = 50,
    driver_guard: int = DRIVER_EDGE_GUARD,
) -> DataFrame:
    """``(id, component)`` where component is the minimum vertex id of
    the strongly connected component.

    Under ``driver_guard`` edges (one early-out CollectLimit probe) the
    fixpoint runs as sequential Tarjan on the driver — exactly the
    reference's execution model (community.rs:96) and orders of
    magnitude fewer scheduled jobs than the settle loop on a small
    graph.  Above the guard, distributed forward-backward coloring.
    """
    spark = edges.sparkSession
    if driver_guard > 0:
        rows = collect_if_small(
            edges.select("src", "dst"), driver_guard, "src", "dst"
        )
        if rows is not None:
            comp = _tarjan_components([(r[0], r[1]) for r in rows])
            if not comp:
                return spark.createDataFrame([], "id long, component long")
            return spark.createDataFrame(
                sorted(comp.items()), "id long, component long"
            )
    with iteration_scope(spark, edges):
        e_all = checkpoint(edges.select("src", "dst").distinct(), eager=False)
        remaining = checkpoint(vertices_from_edges(edges), eager=False)
        result: DataFrame | None = None

        for _ in range(max_outer):
            ids = remaining.select("id")
            e = (
                e_all.join(ids, e_all["src"] == ids["id"], "left_semi")
                .join(ids, F.col("dst") == ids["id"], "left_semi")
            )
            # ONE probe job doubles as the termination test AND the
            # singleton fast path: remaining empty => e empty => done; e
            # empty with vertices left => every leftover is its own SCC
            # (the common tail after the big components peel), settled
            # in bulk without another propagation loop.
            if e.limit(1).count() == 0:
                singles = remaining.select(
                    "id", F.col("id").alias("component")
                )
                result = (
                    singles if result is None else result.unionByName(singles)
                )
                break
            fb = _min_propagate_bidir(e, remaining, max_inner)
            settled = (
                fb.filter(F.col("f") == F.col("b"))
                .select("id", F.col("f").alias("component"))
            )
            settled = checkpoint(settled, eager=False)
            result = settled if result is None else result.unionByName(settled)
            remaining = checkpoint(
                remaining.join(settled.select("id"), "id", "left_anti"),
                eager=False,
            )
    if result is None:
        result = spark.createDataFrame([], "id long, component long")
    return result
