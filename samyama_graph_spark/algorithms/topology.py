"""Triangle counting and local clustering coefficient.

Reference semantics: crates/samyama-graph-algorithms/src/topology.rs:14
(triangle count) and lcc.rs:29/:42 (LCC over the undirected closure).

Implementation is the degree-oriented wedge-closing join — the
standard distributed triangle algorithm: orient each undirected edge
from lower-(degree,id) to higher, then a triangle is a wedge
(a->b, a->c) closed by (b->c).  Orientation bounds each vertex's
out-degree by O(sqrt(m)), so the wedge self-join never explodes on
skewed degree distributions — the scale-critical trick.

Shuffle budget per closure build: ONE shuffle to canonicalize (skipped
when the input is already canonical), ONE for degrees (tiny output),
ONE to build adjacency lists.  Orientation and the closure join itself
are map-side: degrees and adjacency are vertex-count-sized frames that
AQE broadcast-joins when small and shuffle-joins past the threshold,
so the plan stays valid at cluster scale.

Cached frames are force-materialized (count()) before multi-leg
consumers run — Spark's lazily-filled cache would otherwise recompute
the upstream pipeline once per leg (measured 90s -> ~20s for LCC at
sf0.1).
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


def closure_edges(
    edges: DataFrame, canonical: bool = False
) -> tuple[DataFrame, DataFrame]:
    """(undirected degrees, per-oriented-edge triangle closure).

    Edge-iterator triangle enumeration: for each degree-oriented edge
    (u,v), the triangles through it are N+(u) ∩ N+(v) — an array
    intersect of two O(sqrt m) sorted lists, the Spark analogue of the
    reference's sorted-adjacency LeapFrog intersection
    (leapfrog.rs:26-80).  Total shuffle volume is O(m) rows (never the
    O(sum deg^2) wedge set).

    Returns ``(deg, te)``: ``deg`` = (id, deg) undirected degrees,
    ``te`` = (src, dst, ws: array of third vertices).  Public so
    callers that need BOTH lcc and the total triangle count (e.g. two
    registry workloads over the same projected graph) can compute the
    closure once, checkpoint it, and feed ``lcc_from_closure`` /
    ``triangle_total``.

    ``canonical=True`` asserts the input is already a distinct
    src<dst edge set, skipping the canonicalization shuffle.
    """
    if canonical:
        pairs = edges.select("src", "dst")
    else:
        pairs = symmetrize(edges).filter(F.col("src") < F.col("dst"))
    pairs = _pinned(pairs)
    # undirected degree = appearances on either side of canonical pairs
    deg = _pinned(
        pairs.select(F.col("src").alias("id"))
        .unionAll(pairs.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orientation is a map-side flip against the (vertex-sized) degree
    # frame — no edge shuffle
    sd = deg.withColumnRenamed("id", "src").withColumnRenamed("deg", "sdeg")
    dd = deg.withColumnRenamed("id", "dst").withColumnRenamed("deg", "ddeg")
    fwd = (F.col("sdeg") < F.col("ddeg")) | (
        (F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst"))
    )
    oriented = (
        pairs.join(sd, "src")
        .join(dd, "dst")
        .select(
            F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("o_src"),
            F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("o_dst"),
        )
        .select(F.col("o_src").alias("src"), F.col("o_dst").alias("dst"))
    )
    oriented = _pinned(oriented)
    # sorted out-neighbor lists, each bounded O(sqrt m) by orientation —
    # the same property the reference gets from sorted CSR segments
    # (store.rs:294-340); collect_list cannot blow up on skew
    adj = _pinned(
        oriented.groupBy(F.col("src").alias("id")).agg(
            F.sort_array(F.collect_list("dst")).alias("nbrs")
        )
    )
    te = (
        oriented.join(
            adj.withColumnRenamed("id", "src").withColumnRenamed("nbrs", "nu"),
            "src",
        )
        .join(
            adj.withColumnRenamed("id", "dst").withColumnRenamed("nbrs", "nv"),
            "dst",
        )
        .select("src", "dst", F.array_intersect("nu", "nv").alias("ws"))
    )
    return deg, te


def _per_vertex_triangles(te: DataFrame) -> DataFrame:
    """``(id, triangles)`` from a closure frame: each edge (u,v) with t
    closures contributes t to u and v, and 1 to every third vertex."""
    uv = te.select(F.col("src").alias("id"), F.size("ws").alias("t")).unionByName(
        te.select(F.col("dst").alias("id"), F.size("ws").alias("t"))
    )
    w = te.select(F.explode("ws").alias("id"), F.lit(1).alias("t"))
    return uv.unionByName(w).groupBy("id").agg(F.sum("t").alias("triangles"))


def triangle_count_per_vertex(edges: DataFrame) -> DataFrame:
    """``(id, triangles)`` — number of triangles through each vertex."""
    deg, te = closure_edges(edges)
    te = _pinned(te)  # three consumers in _per_vertex_triangles
    per_vertex = _per_vertex_triangles(te)
    verts = deg.select("id")
    return verts.join(per_vertex, "id", "left").fillna(0, subset=["triangles"])


def triangle_total(te: DataFrame) -> int:
    """Total triangle count from a closure frame: sum of per-edge
    closure counts (each triangle counted exactly once, at its
    orientation-apex edge)."""
    total = te.agg(F.sum(F.size("ws"))).first()[0]
    return int(total or 0)


def triangle_count(edges: DataFrame, canonical: bool = False) -> int:
    """Total triangle count of the undirected graph."""
    _, te = closure_edges(edges, canonical)
    return triangle_total(te)


def lcc_from_closure(deg: DataFrame, te: DataFrame) -> DataFrame:
    """LCC from a precomputed (degrees, closure) pair — both sides
    should be pinned or checkpointed by the caller when reused."""
    tri = _per_vertex_triangles(te)
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


def lcc(
    edges: DataFrame, canonical: bool = False, directed: bool = False
) -> DataFrame:
    """Local clustering coefficient per vertex: ``(id, lcc)``.

    Undirected (default): lcc(v) = triangles(v) / (deg(v)*(deg(v)-1)/2)
    over the undirected closure; 0 when deg < 2 (reference lcc.rs:29).

    ``directed=True`` switches to the reference's directed mode
    (lcc.rs:42, shaders/lcc.wgsl directed branch): the neighborhood is
    still the undirected distinct-neighbor set, but the numerator
    counts ORDERED pairs (u, w) of neighbors joined by a directed
    u->w edge, and the denominator is d*(d-1).

    Degrees come from the SAME pinned canonical-pairs frame the
    triangle pipeline builds, so the expensive input projection (e.g.
    a co-order self-join) is evaluated exactly once.
    """
    if directed:
        return lcc_directed(edges)
    deg, te = closure_edges(edges, canonical)
    te = _pinned(te)
    return lcc_from_closure(deg, te)


def lcc_directed(edges: DataFrame) -> DataFrame:
    """Directed local clustering coefficient: ``(id, lcc)``.

    Reference semantics (lcc.rs:42 / lcc.wgsl directed branch):
    N(v) = distinct undirected neighbors (self-loops dropped);
    lcc(v) = #{(u,w) : u,w ∈ N(v), u≠w, u→w ∈ E} / (d·(d−1)), 0 when
    d < 2.

    The reference enumerates all neighbor pairs per node (O(Σd²)
    adjacency-set probes).  Here the numerator is reassembled from
    triangles instead: a directed edge u→w lies inside N(v) exactly
    when {v,u,w} is a triangle of the undirected closure, so each
    triangle {a,b,c} contributes ec(b,c) to a, ec(a,c) to b and
    ec(a,b) to c, where ec is the directed multiplicity (1 or 2) of
    the undirected pair.  Total work stays O(edges + triangle legs) —
    no per-node neighbor array ever materializes, which is what makes
    the plan survive hub vertices at 100 TB.
    """
    dedges = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    # directed multiplicity per undirected pair (1 or 2)
    ecnt = _pinned(
        dedges.distinct()
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("ec"))
    )
    deg, te = closure_edges(
        ecnt.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        canonical=True,
    )
    tris = te.select("src", "dst", F.explode("ws").alias("x"))
    legs = (
        tris.select(
            F.col("x").alias("id"), F.col("src").alias("p"), F.col("dst").alias("q")
        )
        .unionByName(
            tris.select(
                F.col("src").alias("id"),
                F.col("dst").alias("p"),
                F.col("x").alias("q"),
            )
        )
        .unionByName(
            tris.select(
                F.col("dst").alias("id"),
                F.col("src").alias("p"),
                F.col("x").alias("q"),
            )
        )
        .select("id", F.least("p", "q").alias("a"), F.greatest("p", "q").alias("b"))
    )
    td = legs.join(ecnt, ["a", "b"]).groupBy("id").agg(F.sum("ec").alias("tdir"))
    return (
        deg.join(td, "id", "left")
        .fillna(0, subset=["tdir"])
        .select(
            "id",
            F.when(
                F.col("deg") >= 2,
                F.col("tdir") / (F.col("deg") * (F.col("deg") - F.lit(1.0))),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
    )
