"""Graph traversal operators: expand, var-length expand, shortest path.

Reference semantics: ExpandOperator (operator.rs:2744) — 1-hop
neighbor expansion with direction/type/label filters;
VarLengthExpandOperator (operator.rs:3003) — BFS over ``*min..max``
with a visited set (distinct reached nodes per start, first-reached
depth); ShortestPathOperator (operator.rs:7527) — BFS between bound
endpoints.

All are multi-source: the whole frontier advances in one join per
hop, so K hops = K shuffles regardless of how many start nodes —
this is what makes traversal viable at cluster scale (per-start BFS
loops would be K*starts jobs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from samyama_graph_spark.algorithms.util import checkpoint, symmetrize


def _directed_view(edges: DataFrame, direction: str) -> DataFrame:
    """Edge list as (src -> dst) in traversal direction."""
    if direction == "out":
        return edges.select("src", "dst")
    if direction == "in":
        return edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    if direction == "both":
        return symmetrize(edges)
    raise ValueError(f"direction must be out/in/both, got {direction!r}")


def expand(
    bound: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    direction: str = "out",
    target_alias: str = "nbr_id",
) -> DataFrame:
    """1-hop expansion: join bound rows to their neighbors.

    Keeps all bound columns and appends ``target_alias``; one edge row
    per output row (bag semantics, like MATCH).
    """
    e = _directed_view(edges, direction)
    return bound.join(e, bound[id_col] == e["src"]).select(
        *bound.columns, F.col("dst").alias(target_alias)
    )


def var_length_expand(
    starts: DataFrame,
    edges: DataFrame,
    min_hops: int,
    max_hops: int,
    id_col: str = "id",
    direction: str = "out",
) -> DataFrame:
    """BFS ``*min..max`` from every start: ``(start, node, hops)``.

    ``starts`` is a one-column DataFrame of start ids.  Visited-set
    semantics per start (a node is reported once, at its first-reached
    depth), matching the reference's VarLengthExpand BFS.  The visited
    set is keyed (start, node) so concurrent BFS trees don't interfere.
    """
    if min_hops < 0 or max_hops < min_hops:
        raise ValueError("need 0 <= min_hops <= max_hops")
    e = checkpoint(_directed_view(edges, direction))
    frontier = checkpoint(
        starts.select(
            F.col(id_col).alias("start"), F.col(id_col).alias("node")
        ).distinct()
    )
    visited = frontier.withColumn("hops", F.lit(0))
    frontier_n = visited_n = frontier.count()
    small = 1_000_000  # broadcast threshold: frontier/visited sides

    for depth in range(1, max_hops + 1):
        f = F.broadcast(frontier) if frontier_n < small else frontier
        v = visited.select("start", "node")
        if visited_n < small:
            v = F.broadcast(v)
        nxt = (
            e.join(f, e["src"] == f["node"])
            .select("start", F.col("dst").alias("node"))
            .distinct()
            .join(v, ["start", "node"], "left_anti")
            .withColumn("hops", F.lit(depth))
        )
        # lazy checkpoint + count: the count action materializes the
        # checkpoint in the SAME job (count scans every partition), so
        # each hop costs one scheduled job instead of two
        nxt = checkpoint(nxt, eager=False)
        frontier_n = nxt.count()
        if frontier_n == 0:
            break
        visited_n += frontier_n
        visited = visited.unionByName(nxt)  # union of checkpointed frontiers
        frontier = nxt.select("start", "node")

    return visited.filter(F.col("hops") >= min_hops)


def shortest_path(
    starts: DataFrame,
    targets: DataFrame,
    edges: DataFrame,
    max_depth: int = 30,
    id_col: str = "id",
    direction: str = "out",
) -> DataFrame:
    """Shortest hop distance for every (start, target) pair reachable
    within max_depth: ``(start, target, hops)``.

    Multi-source BFS from all starts at once, then a semi-join onto the
    target set — MATCH p = shortestPath((a)-[*]->(b)) RETURN length(p).
    """
    reached = var_length_expand(
        starts, edges, 0, max_depth, id_col=id_col, direction=direction
    )
    t = targets.select(F.col(id_col).alias("target")).distinct()
    return reached.join(t, reached["node"] == t["target"]).select(
        "start", "target", "hops"
    )
