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

from samyama_graph_spark.algorithms.util import (
    DRIVER_EDGE_GUARD,
    edges_pdf_if_small,
    symmetrize,
)


# closing-edge sets up to this many rows broadcast as the triangle
# probe (~40 B/row hash relation: 16M rows ~ 640 MB executor-side);
# beyond it the closure falls back to the wedge shuffle join
_CLOSING_BCAST_GUARD = 16_000_000

# pinned frames, keyed per SparkSession (weakly — a stopped session's
# entries vanish with it) and per scope: "closure" for pins created
# inside closure_edges, "outer" for entry-point pins (lcc_directed's
# ecnt/tris).  Keying per session keeps two concurrent sessions from
# releasing each other's pins mid-plan; the scope split lets
# closure_edges clean up after ITSELF (it is documented-public, so a
# direct caller must not accumulate cache blocks) without dropping an
# enclosing entry point's still-live pins.
import threading as _threading
import weakref as _weakref

_PINS: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()
_PINS_LOCK = _threading.Lock()


def _release_pins(session, scope: str | None = None) -> None:
    """Unpersist pins from PREVIOUS invocations — called at the START
    of each entry point, BEFORE any new persist (the plan-identity
    lesson from dedup._pin_frame: persisting a plan-identical frame
    no-ops onto the existing cache entry, so unpersisting the old
    frame afterwards would drop the entry the new frame relies on).
    Re-running an operator therefore re-materializes honestly instead
    of silently serving the previous run's cache — and a long session
    never accumulates cache blocks.  ``scope=None`` releases every
    scope for the session (entry points); a named scope releases only
    its own pins (closure_edges cleaning up after itself).

    The unpersist MUST block: the caller immediately re-``cache()``s
    plan-identical frames, and Spark's CacheManager keys entries on
    the canonicalized plan — an async unpersist can land AFTER the new
    ``cache()`` no-ops onto the still-registered old entry, dropping
    the entry the new pin relies on (the new frame is then silently
    uncached and every multi-leg consumer recomputes it)."""
    with _PINS_LOCK:
        scopes = _PINS.get(session)
        if not scopes:
            return
        names = list(scopes) if scope is None else [scope]
        drop = [f for n in names for f in scopes.pop(n, [])]
    for f in drop:
        f.unpersist(blocking=True)


def _pinned(df: DataFrame, scope: str) -> DataFrame:
    """cache() + eager materialization so later multi-leg jobs reuse it."""
    df = df.cache()
    df.count()
    with _PINS_LOCK:
        _PINS.setdefault(df.sparkSession, {}).setdefault(scope, []).append(df)
    return df


def closure_edges(
    edges: DataFrame, canonical: bool = False
) -> tuple[DataFrame, DataFrame]:
    """(undirected degrees, triangle rows).

    Degree-oriented WEDGE JOIN with flat rows: orient every canonical
    pair low-(deg, id) -> high (out-degrees bounded O(sqrt m), the
    same property the reference gets from sorted CSR segments,
    store.rs:294-340), self-join the oriented edges on the apex to
    enumerate each wedge exactly once (ordered by the SAME orientation
    key, so the closing edge — if the triangle exists — is an oriented
    edge), then close with one equi-join against the oriented edge
    set.  Row volume is O(sum C(d+, 2)) wedges of flat (a, b, c)
    longs, all inside whole-stage codegen.

    The previous formulation carried sorted adjacency ARRAYS onto
    every edge row (collect_list + two joins + array_intersect): row
    count O(m) but bytes O(m·sqrt m) with a per-row array allocation —
    measured 95 s with GCLocker retry warnings on the 12M-pair
    co-order graph, vs the same wedge volume enumerated by the numpy
    driver kernel in ~5 s.  Flat wedge rows remove the allocation and
    the array bytes; skewed apexes are AQE's problem, not the GC's.

    Returns ``(deg, tris)``: ``deg`` = (id, deg) undirected degrees,
    ``tris`` = one row (a, b, c) per triangle, where a is the wedge
    apex and (b, c) the closing oriented edge.

    ``canonical=True`` asserts the input is already a distinct
    src<dst edge set, skipping the canonicalization shuffle.
    """
    # release THIS function's pins from any previous call (a direct
    # caller of the documented-public closure_edges must not
    # accumulate cache blocks); enclosing entry points' "outer" pins
    # stay live
    _release_pins(edges.sparkSession, "closure")
    if canonical:
        pairs = edges.select("src", "dst")
    else:
        pairs = symmetrize(edges).filter(F.col("src") < F.col("dst"))
    pairs = _pinned(pairs, "closure")
    # undirected degree = appearances on either side of canonical pairs
    deg = _pinned(
        pairs.select(F.col("src").alias("id"))
        .unionAll(pairs.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg")),
        "closure",
    )
    # orientation is a map-side flip against the (vertex-sized) degree
    # frame — no edge shuffle.  The head's degree rides along: wedge
    # ordering must use the ORIENTATION key (deg, id), not the raw id,
    # or the closing pair would not be an oriented edge.
    sd = deg.withColumnRenamed("id", "src").withColumnRenamed("deg", "sdeg")
    dd = deg.withColumnRenamed("id", "dst").withColumnRenamed("deg", "ddeg")
    fwd = (F.col("sdeg") < F.col("ddeg")) | (
        (F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst"))
    )
    oriented = _pinned(
        pairs.join(sd, "src")
        .join(dd, "dst")
        .select(
            F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("src"),
            F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("dst"),
            F.when(fwd, F.col("ddeg")).otherwise(F.col("sdeg")).alias("hdeg"),
        ),
        "closure",
    )
    e1 = oriented.select(
        F.col("src").alias("a"), F.col("dst").alias("b"), F.col("hdeg").alias("bd")
    )
    e2 = oriented.select(
        F.col("src").alias("a"), F.col("dst").alias("c"), F.col("hdeg").alias("cd")
    )
    wedges = e1.join(e2, "a").filter(
        (F.col("bd") < F.col("cd"))
        | ((F.col("bd") == F.col("cd")) & (F.col("b") < F.col("c")))
    )
    # The closing probe is the whole ballgame: the wedge set is
    # O(sum C(d+, 2)) rows (411M on the 12M-pair co-order graph, of
    # which only ~5% close).  A shuffle join would MATERIALIZE and
    # shuffle every wedge (measured 205 s); broadcasting the closing
    # edge set instead keeps the apex self-join's in-partition
    # expansion, the wedge filter, and the hash probe fused in one
    # streaming pass — wedges flow through the probe and only
    # triangles ever hit a shuffle (wedge expansion alone: 6.6 s of
    # the total).  Tier rule: broadcast while the edge set is
    # hash-table-sized, beyond that fall back to the shuffle join —
    # the same regime split as every broadcast join at 100 TB.
    #
    # Probe key: ONE rebased packed long when the id span allows —
    # Spark builds a LongHashedRelation (primitive open-addressing
    # probe) for single-long keys vs an UnsafeHashedRelation for the
    # 2-column key, measured ~3x faster on the 411M-probe graph (the
    # probe dominated: 33 s of a 39 s closure).  ANSI mode is on, so
    # the span guard is what keeps the multiply exact.
    if oriented.count() <= _CLOSING_BCAST_GUARD:  # cached: pin counted it
        b0 = oriented.agg(
            F.min("src"), F.max("src"), F.min("dst"), F.max("dst")
        ).first()
        if b0[0] is None:  # empty edge set (e.g. all self-loops)
            return deg, oriented.select(
                F.col("src").alias("a"),
                F.col("src").alias("b"),
                F.col("dst").alias("c"),
            ).limit(0)
        mn = min(b0[0], b0[2])
        span = max(b0[1], b0[3]) - mn + 1
        if span < (1 << 31):
            key = (F.col("b") - mn) * span + (F.col("c") - mn)
            ckey = (F.col("src") - mn) * span + (F.col("dst") - mn)
            closing = F.broadcast(oriented.select(ckey.alias("__ck")))
            tris = (
                wedges.withColumn("__ck", key)
                .join(closing, "__ck")
                .select("a", "b", "c")
            )
            return deg, tris
        closing = F.broadcast(
            oriented.select(F.col("src").alias("b"), F.col("dst").alias("c"))
        )
    else:
        closing = oriented.select(
            F.col("src").alias("b"), F.col("dst").alias("c")
        )
    tris = wedges.join(closing, ["b", "c"]).select("a", "b", "c")
    return deg, tris


def _per_vertex_triangles(tris: DataFrame) -> DataFrame:
    """``(id, triangles)`` from triangle rows: every triangle counts
    once for each of its three vertices."""
    ids = tris.select(F.explode(F.array("a", "b", "c")).alias("id"))
    return ids.groupBy("id").agg(F.count(F.lit(1)).alias("triangles"))


def _triangle_stats_driver(spark, pdf):
    """Vectorized per-vertex (deg, triangles) from a collected edge
    list: degree-orient, enumerate wedges grouped by out-degree (each
    distinct block size vectorizes to one triu_indices gather), close
    them with a sorted-key membership probe — the numpy mirror of the
    distributed closure join, same orientation, same counts."""
    import numpy as np
    import pandas as pd

    a = pdf.iloc[:, 0].to_numpy(dtype=np.int64, copy=False)
    b = pdf.iloc[:, 1].to_numpy(dtype=np.int64, copy=False)
    # canonicalize: undirected distinct pairs u < v, self-loops dropped
    u = np.minimum(a, b)
    v = np.maximum(a, b)
    keep = u != v
    u, v = u[keep], v[keep]
    vid = np.unique(np.concatenate([u, v]))
    n = int(vid.size)
    if n == 0:
        return spark.createDataFrame(
            [], "id long, deg long, triangles long"
        )
    ui = np.searchsorted(vid, u)
    wi = np.searchsorted(vid, v)
    pair_key = np.unique(ui * np.int64(n) + wi)
    ui, wi = pair_key // n, pair_key % n
    deg = np.bincount(ui, minlength=n) + np.bincount(wi, minlength=n)
    # orient low-(deg, id) -> high: out-degrees bounded O(sqrt m)
    ka = deg[ui] * np.int64(n) + ui
    kb = deg[wi] * np.int64(n) + wi
    fwd = ka < kb
    osrc = np.where(fwd, ui, wi)
    odst = np.where(fwd, wi, ui)
    order = np.lexsort((odst, osrc))
    osrc, odst = osrc[order], odst[order]
    indptr = np.searchsorted(osrc, np.arange(n + 1))
    okeys = osrc * np.int64(n) + odst  # sorted ascending by build
    counts = indptr[1:] - indptr[:-1]
    tri = np.zeros(n, dtype=np.int64)
    for c in np.unique(counts):
        if c < 2:
            continue
        blocks = np.where(counts == c)[0]
        gather = indptr[blocks][:, None] + np.arange(c)[None, :]
        NM = odst[gather]  # (len(blocks), c) out-neighbor matrix
        iu, ju = np.triu_indices(int(c), 1)
        A = NM[:, iu].ravel()
        B = NM[:, ju].ravel()
        apex = np.repeat(blocks, iu.size)
        # closing edge carries the same orientation
        kA = deg[A] * np.int64(n) + A
        kB = deg[B] * np.int64(n) + B
        lo = np.where(kA < kB, A, B)
        hi = np.where(kA < kB, B, A)
        q = lo * np.int64(n) + hi
        pos = np.searchsorted(okeys, q)
        hit = (pos < okeys.size) & (okeys[np.minimum(pos, okeys.size - 1)] == q)
        for arr in (apex[hit], A[hit], B[hit]):
            tri += np.bincount(arr, minlength=n)
    out = pd.DataFrame({"id": vid, "deg": deg, "triangles": tri})
    return spark.createDataFrame(out, "id long, deg long, triangles long")


def triangle_stats(
    edges: DataFrame,
    canonical: bool = False,
    driver_guard: int = DRIVER_EDGE_GUARD,
) -> DataFrame:
    """Per-vertex ``(id, deg, triangles)`` over the undirected closure
    — the one frame LCC, per-vertex triangle counts, and the global
    total (sum/3) all derive from.

    Driver fast path (same guard as the other algorithms): below
    ``driver_guard`` pairs the degree-oriented wedge closing runs as
    vectorized numpy on the driver; the distributed closure join is
    the ≥guard path, same orientation and counts."""
    _release_pins(edges.sparkSession)
    pdf = edges_pdf_if_small(edges.select("src", "dst"), driver_guard)
    if pdf is not None:
        return _triangle_stats_driver(edges.sparkSession, pdf)
    deg, tris = closure_edges(edges, canonical)
    per_vertex = _per_vertex_triangles(tris)
    return (
        deg.join(per_vertex, "id", "left")
        .fillna(0, subset=["triangles"])
        .select("id", "deg", "triangles")
    )


def triangle_count_per_vertex(edges: DataFrame) -> DataFrame:
    """``(id, triangles)`` — number of triangles through each vertex."""
    return triangle_stats(edges).select("id", "triangles")


def triangle_count(edges: DataFrame, canonical: bool = False) -> int:
    """Total triangle count of the undirected graph: every triangle
    touches exactly three vertices, so sum(per-vertex)/3.  Routes
    through :func:`triangle_stats` (driver fast path under the guard)."""
    total = (
        triangle_stats(edges, canonical).agg(F.sum("triangles")).first()[0]
    )
    return int(total or 0) // 3


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
    a co-order self-join) is evaluated exactly once.  Small graphs
    take :func:`triangle_stats`' vectorized driver path.
    """
    if directed:
        return lcc_directed(edges)
    stats = triangle_stats(edges, canonical)
    return stats.select(
        "id",
        F.when(
            F.col("deg") >= 2,
            F.col("triangles") / (F.col("deg") * (F.col("deg") - 1) / 2.0),
        )
        .otherwise(F.lit(0.0))
        .alias("lcc"),
    )


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
    _release_pins(edges.sparkSession)
    dedges = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    # directed multiplicity per undirected pair (1 or 2)
    ecnt = _pinned(
        dedges.distinct()
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("ec")),
        "outer",
    )
    deg, tris = closure_edges(
        ecnt.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        canonical=True,
    )
    # pinned: the three role projections below each consume tris
    tris = _pinned(tris, "outer")
    legs = (
        tris.select(
            F.col("a").alias("id"), F.col("b").alias("p"), F.col("c").alias("q")
        )
        .unionByName(
            tris.select(
                F.col("b").alias("id"),
                F.col("a").alias("p"),
                F.col("c").alias("q"),
            )
        )
        .unionByName(
            tris.select(
                F.col("c").alias("id"),
                F.col("a").alias("p"),
                F.col("b").alias("q"),
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
