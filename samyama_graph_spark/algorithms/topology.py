"""Triangle counting and local clustering coefficient.

Reference semantics: crates/samyama-graph-algorithms/src/topology.rs:14
(triangle count) and lcc.rs:29/:42 (LCC over the undirected closure).

Implementation is the degree-oriented wedge-closing join — the
standard distributed triangle algorithm: orient each undirected edge
from lower-(degree,id) to higher, then a triangle is a wedge
(a->b, a->c) closed by (b->c).  Orientation bounds each vertex's
out-degree by O(sqrt(m)), so the wedge self-join never explodes on
skewed degree distributions — the scale-critical trick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from samyama_graph_spark.algorithms.util import checkpoint, symmetrize


def _oriented(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(undirected distinct edges, degree-oriented edges)."""
    und = symmetrize(edges)  # both directions, no self-loops
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
    return und, checkpoint(oriented)


def triangle_count_per_vertex(edges: DataFrame) -> DataFrame:
    """``(id, triangles)`` — number of triangles through each vertex."""
    und, o = _oriented(edges)
    o2 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    o3 = o.select(F.col("src").alias("a2"), F.col("dst").alias("c"))
    wedges = o2.join(o3, (F.col("a") == F.col("a2")) & (F.col("b") < F.col("c"))).select(
        "a", "b", "c"
    )
    # union must be by NAME: the reversed leg's columns are in (c, b) order
    closer = o.select(F.col("src").alias("b"), F.col("dst").alias("c")).unionByName(
        o.select(F.col("src").alias("c"), F.col("dst").alias("b"))
    )
    tris = wedges.join(closer, ["b", "c"]).select("a", "b", "c")
    per_vertex = (
        tris.select(F.col("a").alias("id"))
        .unionAll(tris.select(F.col("b").alias("id")))
        .unionAll(tris.select(F.col("c").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    # include triangle-free vertices with 0
    verts = und.select(F.col("src").alias("id")).distinct()
    return verts.join(per_vertex, "id", "left").fillna(0, subset=["triangles"])


def triangle_count(edges: DataFrame) -> int:
    """Total triangle count of the undirected graph."""
    per_v = triangle_count_per_vertex(edges)
    total = per_v.agg(F.sum("triangles")).first()[0] or 0
    return int(total) // 3


def lcc(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per vertex: ``(id, lcc)``.

    lcc(v) = triangles(v) / (deg(v) * (deg(v)-1) / 2) over the
    undirected closure; 0 when deg < 2 (reference lcc.rs:29).
    """
    und = symmetrize(edges)
    deg = und.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    tri = triangle_count_per_vertex(edges)
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
