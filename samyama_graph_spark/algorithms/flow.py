"""Maximum flow (Edmonds-Karp) on a collected subgraph.

Reference: crates/samyama-graph-algorithms/src/flow.rs:16.  Augmenting-
path max-flow is inherently sequential (each augmentation depends on
the previous residual graph), so — like the reference, which runs it
single-threaded — this executes driver-side on a collected edge list,
guarded by a size limit.  Distributed preprocessing (subgraph
extraction, capacity aggregation) stays in DataFrames; only the
residual-graph search runs locally.
"""

from __future__ import annotations

from collections import defaultdict, deque

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_COLLECT_EDGES = 2_000_000  # driver-side guard


def max_flow(
    edges: DataFrame,
    source: int,
    sink: int,
    capacity_col: str = "capacity",
) -> float:
    """Max flow value from source to sink.

    ``edges``: (src, dst, capacity).  Parallel edges are pre-aggregated
    distributed-side; the Edmonds-Karp loop then runs on the collected
    residual graph.
    """
    agg = (
        edges.select("src", "dst", F.col(capacity_col).cast("double").alias("cap"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum("cap").alias("cap"))
    )
    n = agg.count()
    if n > MAX_COLLECT_EDGES:
        raise ValueError(
            f"max_flow subgraph has {n} edges > {MAX_COLLECT_EDGES}; "
            "extract a smaller subgraph first (the algorithm is sequential)"
        )
    cap: dict[int, dict[int, float]] = defaultdict(lambda: defaultdict(float))
    for r in agg.collect():
        cap[r["src"]][r["dst"]] += r["cap"]

    flow = 0.0
    while True:
        # BFS for an augmenting path in the residual graph
        parent: dict[int, int] = {source: source}
        q = deque([source])
        while q and sink not in parent:
            u = q.popleft()
            for v, c in cap[u].items():
                if c > 1e-12 and v not in parent:
                    parent[v] = u
                    q.append(v)
        if sink not in parent:
            break
        # bottleneck along the path
        bottleneck = float("inf")
        v = sink
        while v != source:
            u = parent[v]
            bottleneck = min(bottleneck, cap[u][v])
            v = u
        v = sink
        while v != source:
            u = parent[v]
            cap[u][v] -= bottleneck
            cap[v][u] += bottleneck
            v = u
        flow += bottleneck
    return flow
