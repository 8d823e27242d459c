"""Triangle counting and local clustering coefficient.

Reference semantics: crates/samyama-graph-algorithms/src/topology.rs:14
(triangle count) and lcc.rs:29/:42 (LCC over the undirected closure).

Implementation is the degree-oriented wedge-closing join — the
standard distributed triangle algorithm: orient each undirected edge
from lower-(degree,id) to higher, then a triangle is a wedge
(a->b, a->c) closed by (b->c).  Orientation bounds each vertex's
out-degree by O(sqrt(m)), so the wedge self-join never explodes on
skewed degree distributions — the scale-critical trick.

Every cached frame here is force-materialized (count()) before its
consumers run: each is read by 2-3 legs of the SAME downstream job,
and Spark's lazily-filled cache would let every leg recompute the
upstream pipeline (measured 90s -> ~20s for LCC at sf0.1).  The extra
count() jobs cost one scheduling round-trip each, amortized at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from samyama_graph_spark.algorithms.util import symmetrize


def _pinned(df: DataFrame) -> DataFrame:
    """cache() + eager materialization so later multi-leg jobs reuse it."""
    df = df.cache()
    df.count()
    return df


def _oriented(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(undirected distinct edges, degree-oriented edges), both pinned.

    The undirected set feeds degree computation, orientation, AND the
    closure join; the oriented set feeds adjacency-building and the
    per-edge join.  Both are multi-consumer, so both are pinned.
    """
    und = _pinned(symmetrize(edges))  # both directions, no self-loops
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    e = (
        und.join(deg.withColumnRenamed("id", "src").withColumnRenamed("deg", "sdeg"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("deg", "ddeg"), "dst")
    )
    oriented = e.filter(
        (F.col("sdeg") < F.col("ddeg"))
        | ((F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst")))
    ).select("src", "dst")
    return und, _pinned(oriented)


def _adjacency(o: DataFrame) -> DataFrame:
    """Sorted out-neighbor list per vertex of the oriented graph.

    Degree orientation bounds every list by O(sqrt m), so collect_list
    cannot blow up on skewed vertices — the same property the
    reference gets from its sorted CSR segments (store.rs:294-340).
    Pinned: consumed twice (src side and dst side of the closure join).
    """
    return _pinned(
        o.groupBy(F.col("src").alias("id")).agg(
            F.sort_array(F.collect_list("dst")).alias("nbrs")
        )
    )


def _tri_edges(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(undirected edges, per-oriented-edge triangle closure).

    Edge-iterator triangle enumeration: for each oriented edge (u,v),
    the triangles through it are N+(u) ∩ N+(v) — an array intersect of
    two O(sqrt m) sorted lists, the Spark analogue of the reference's
    sorted-adjacency LeapFrog intersection (leapfrog.rs:26-80).  Total
    shuffle volume is O(m) rows (never the O(sum deg^2) wedge set).
    Returns rows (src, dst, ws: array of third vertices).
    """
    und, o = _oriented(edges)
    adj = _adjacency(o)
    e = (
        o.join(
            adj.withColumnRenamed("id", "src").withColumnRenamed("nbrs", "nu"), "src"
        ).join(
            adj.withColumnRenamed("id", "dst").withColumnRenamed("nbrs", "nv"), "dst"
        )
    )
    return und, e.select(
        "src", "dst", F.array_intersect("nu", "nv").alias("ws")
    )


def triangle_count_per_vertex(edges: DataFrame) -> DataFrame:
    """``(id, triangles)`` — number of triangles through each vertex."""
    und, te = _tri_edges(edges)
    te = _pinned(te)  # three consumers below
    # each edge (u,v) with t closures contributes t to u and v, and 1
    # to every third vertex w
    uv = te.select(F.col("src").alias("id"), F.size("ws").alias("t")).unionByName(
        te.select(F.col("dst").alias("id"), F.size("ws").alias("t"))
    )
    w = te.select(F.explode("ws").alias("id"), F.lit(1).alias("t"))
    per_vertex = (
        uv.unionByName(w).groupBy("id").agg(F.sum("t").alias("triangles"))
    )
    verts = und.select(F.col("src").alias("id")).distinct()
    return verts.join(per_vertex, "id", "left").fillna(0, subset=["triangles"])


def triangle_count(edges: DataFrame) -> int:
    """Total triangle count of the undirected graph: sum of per-edge
    closure counts (each triangle counted exactly once, at its
    orientation-apex edge)."""
    _, te = _tri_edges(edges)
    total = te.agg(F.sum(F.size("ws"))).first()[0]
    return int(total or 0)


def lcc(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per vertex: ``(id, lcc)``.

    lcc(v) = triangles(v) / (deg(v) * (deg(v)-1) / 2) over the
    undirected closure; 0 when deg < 2 (reference lcc.rs:29).

    Degrees are derived from the SAME pinned undirected frame the
    triangle pipeline builds, so the expensive input projection (e.g.
    a co-order self-join) is evaluated exactly once.
    """
    und, te = _tri_edges(edges)
    te = _pinned(te)
    uv = te.select(F.col("src").alias("id"), F.size("ws").alias("t")).unionByName(
        te.select(F.col("dst").alias("id"), F.size("ws").alias("t"))
    )
    w = te.select(F.explode("ws").alias("id"), F.lit(1).alias("t"))
    tri = uv.unionByName(w).groupBy("id").agg(F.sum("t").alias("triangles"))
    deg = und.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    return (
        deg.join(tri, "id", "left")
        .fillna(0, subset=["triangles"])
        .select(
            "id",
            F.when(
                F.col("deg") >= 2,
                F.col("triangles") / (F.col("deg") * (F.col("deg") - 1) / 2.0),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
    )
