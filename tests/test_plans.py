"""Physical-plan assertions: the plans we ship must keep the shapes
that make them viable at 100TB — filters reaching the parquet scan,
dimension tables broadcast, top-k as TakeOrderedAndProject (per-
partition heaps), and whole-stage codegen on the hot expressions.
These lock in what `.explain("formatted")` reviews found, so a
regression in plan quality fails CI rather than only the bench.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from samyama_graph_spark.loaders import tpch_graph


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    g = tpch_graph(spark, sf_dir)
    df = (
        g.node_df("Customer")
        .filter((F.col("mktsegment") == "BUILDING") & (F.col("acctbal") > 1000))
        .select("name", "acctbal")
    )
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "c_mktsegment" in plan and "c_acctbal" in plan
    # column pruning: the scan must not read all 8 customer columns
    assert "c_comment" not in plan.split("ReadSchema")[1][:400]


def test_dimension_join_broadcasts(spark, sf_dir):
    g = tpch_graph(spark, sf_dir)
    cust = g.node_df("Customer")
    orders = g.edge_df("PLACED")
    df = orders.join(F.broadcast(cust), orders["src"] == cust["id"])
    assert "BroadcastHashJoin" in _plan(df)


def test_topk_is_take_ordered(spark, sf_dir):
    from samyama_graph_spark.datapipe.similarity import knn_bruteforce
    from samyama_graph_spark.loaders import load_tables

    embs = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    qv = [float(x) for x in embs.select("embedding").first()["embedding"]]
    df = knn_bruteforce(embs, "embedding", "vec_id", qv, k=10)
    assert "TakeOrderedAndProject" in _plan(df)


def test_codegen_on_scan_filter(spark, sf_dir):
    g = tpch_graph(spark, sf_dir)
    df = g.node_df("Order").filter(F.col("totalprice") > 100000).select("id")
    # formatted mode marks codegen'd operators with "[codegen id : N]"
    assert "codegen id" in _plan(df)


def test_gate_window_fully_oracled():
    """Gate health: exactly 50 entries, every one present in REGISTRY,
    and every one carries a DuckDB oracle — the driver's correctness
    gate must value-check the whole window (no rows-only slots)."""
    from samyama_graph_spark.workloads import (
        GATE_ORDER,
        REGISTRY,
        gate_oracles,
        gate_queries,
    )

    qs = gate_queries()
    assert len(qs) == 50 == len(GATE_ORDER)
    oracles = gate_oracles()
    missing = [n for n in GATE_ORDER if n not in oracles]
    assert not missing, f"gate entries without oracle: {missing}"
    assert all(REGISTRY[n].oracle for n in GATE_ORDER)


def test_pagerank_iteration_has_no_broadcast_exchange(spark):
    """The PageRank loop must not schedule a broadcast exchange per
    iteration (the r2 bottleneck): rank updates join shuffle-hash, and
    the dangling mass comes from the message aggregate, not a
    broadcast-joined 1-row frame."""
    from samyama_graph_spark.algorithms import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    )
    from samyama_graph_spark.algorithms.util import PLAN_TRACE

    ranks = pagerank(edges, iterations=2)
    # the loop materializes its result internally, so the per-iteration
    # plan is read from the loop's plan trace, not the returned frame
    plan = PLAN_TRACE["pagerank"]
    assert "BroadcastExchange" not in plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
    total = ranks.agg(F.sum("rank")).first()[0]
    assert abs(total - 1.0) < 1e-9


def test_anchor_selection_scans_selective_side_first(spark, sf_dir):
    """MATCH (a:BigLabel)-[:R]->(b:SmallLabel {k: v}) must anchor the
    scan at SmallLabel (cardinality-based start-node selection,
    mirroring the reference's plan enumerator / cost model,
    plan_enumerator.rs:17-64, cost_model.rs:20-60) — and produce the
    same rows either way."""
    from samyama_graph_spark.cypher.compiler import Compiler
    from samyama_graph_spark.cypher.engine import CypherEngine
    from samyama_graph_spark.graph import PropertyGraph

    big = spark.range(0, 1000).select(F.col("id"), F.lit("x").alias("tag"))
    small = spark.range(5000, 5005).select(
        F.col("id"), (F.col("id") - 5000).alias("k")
    )
    edges = spark.range(0, 1000).select(
        F.col("id").alias("src"), (F.lit(5000) + F.col("id") % 5).alias("dst")
    )
    g = PropertyGraph(spark, {"Big": big, "Small": small}, {"R": edges})
    engine = CypherEngine(g)

    scanned: list[str | None] = []
    orig = Compiler._node_source

    def spy(self, label, var):
        scanned.append(label)
        return orig(self, label, var)

    Compiler._node_source = spy
    try:
        out = engine.query(
            "MATCH (a:Big)-[:R]->(b:Small {k: 2}) RETURN count(*) AS n"
        ).collect()
    finally:
        Compiler._node_source = orig
    assert scanned[0] == "Small", f"anchored at {scanned[0]}, not Small"
    assert out[0]["n"] == 200  # 1000 edges / 5 small nodes
    # parity with the syntactically-reversed form (no reversal applies)
    out2 = engine.query(
        "MATCH (b:Small {k: 2})<-[:R]-(a:Big) RETURN count(*) AS n"
    ).collect()
    assert out2[0]["n"] == 200


def test_sampling_is_map_only(spark, sf_dir):
    """Split+sample selection must be a projection/filter on the scan —
    zero Exchange until the caller aggregates (a 100 TB sample is one
    map pass)."""
    from samyama_graph_spark.datapipe.sampling import (
        assign_split,
        stratified_sample,
    )
    from samyama_graph_spark.loaders import load_tables

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    out = assign_split(
        stratified_sample(
            docs, "doc_id", {"en": 0.5, "de": 1.0}, strata_col="lang"
        ),
        "doc_id",
        {"train": 0.9, "val": 0.1},
    )
    plan = _plan(out)
    assert "Exchange" not in plan
    # hash arithmetic stays JVM-side (no BatchEvalPython)
    assert "Python" not in plan


def test_packing_single_shuffle(spark, sf_dir):
    """Concat-and-chunk packing = exactly one Exchange (the shard
    window); the pack arithmetic itself is window + projection."""
    from samyama_graph_spark.datapipe.common import tokens
    from samyama_graph_spark.datapipe.packing import pack_chunks
    from samyama_graph_spark.loaders import load_tables

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    import re

    docs = docs.withColumn("toks", F.size(tokens(F.col("text"))))
    plan = _plan(pack_chunks(docs, "toks", 512, "lang", "doc_id"))
    # formatted mode lists each node once in the tree and once in the
    # detail section — count the numbered detail entries
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1
    assert "Python" not in plan


def test_interior_anchor_split(spark):
    """A chain (a:Big)-[:R1]->(m:Mid {k: v})-[:R2]->(b:Big) must anchor
    at the selective INTERIOR node m — the reference enumerates start
    candidates over every pattern node (plan_enumerator.rs:17-64), not
    just the endpoints — and the split plan must return the same rows
    as the syntactic order."""
    from samyama_graph_spark.cypher.compiler import Compiler
    from samyama_graph_spark.cypher.engine import CypherEngine
    from samyama_graph_spark.graph import PropertyGraph

    big_a = spark.range(0, 1000).select(F.col("id"))
    mid = spark.range(5000, 5010).select(
        F.col("id"), (F.col("id") - 5000).alias("k")
    )
    big_b = spark.range(9000, 10000).select(F.col("id"))
    r1 = spark.range(0, 1000).select(
        F.col("id").alias("src"), (F.lit(5000) + F.col("id") % 10).alias("dst")
    )
    r2 = spark.range(0, 1000).select(
        (F.lit(5000) + F.col("id") % 10).alias("src"),
        (F.lit(9000) + F.col("id")).alias("dst"),
    )
    g = PropertyGraph(
        spark, {"BigA": big_a, "Mid": mid, "BigB": big_b}, {"R1": r1, "R2": r2}
    )
    engine = CypherEngine(g)

    scanned: list[str | None] = []
    orig = Compiler._node_source

    def spy(self, label, var):
        scanned.append(label)
        return orig(self, label, var)

    Compiler._node_source = spy
    try:
        out = engine.query(
            "MATCH (a:BigA)-[:R1]->(m:Mid {k: 3})-[:R2]->(b:BigB) "
            "RETURN count(*) AS n"
        ).collect()
    finally:
        Compiler._node_source = orig
    assert scanned[0] == "Mid", f"anchored at {scanned[0]}, not Mid"
    # 100 a-rows reach m(k=3); m(k=3) reaches 100 b-rows -> 100*100
    assert out[0]["n"] == 10000
    # row parity with a graph whose stats don't trigger the split
    out2 = engine.query(
        "MATCH (b:BigB)<-[:R2]-(m:Mid {k: 3})<-[:R1]-(a:BigA) "
        "RETURN count(*) AS n"
    ).collect()
    assert out2[0]["n"] == 10000


def test_degree_direction_expansion_cost(spark):
    """Direction-aware expansion costing (reference catalog degree
    stats, catalog.rs:63-140 + cost_model.rs:20-60): on a chain whose
    endpoints have EQUAL scan cost but asymmetric fan-out, the anchor
    must be the end whose traversal direction has the small per-hop
    degree — visible in the plan trace."""
    from samyama_graph_spark.cypher.engine import CypherEngine
    from samyama_graph_spark.graph import PropertyGraph

    # A and C both 500 rows, M 500 rows — every scan costs the same,
    # so only DEGREE statistics can pick the anchor.  R1 is dense both
    # ways (10000 edges between A and M: deg 20/20); R2 is 1:1.
    # From a: frontier 500 -> 10000 (R1 fwd) -> 10000: work ~20500.
    # From c: 500 -> 500 (R2 rev, deg 1) -> 10000: work ~11000.
    # The cheap intermediate frontier is on the c side -> reversed.
    a = spark.range(0, 500)
    m = spark.range(1000, 1500)
    c = spark.range(2000, 2500)
    r1 = spark.range(0, 10000).select(
        (F.col("id") % 500).alias("src"),
        (F.lit(1000) + (F.col("id") * 7) % 500).alias("dst"),
    )
    r2 = spark.range(0, 500).select(
        (F.lit(1000) + F.col("id")).alias("src"),
        (F.lit(2000) + F.col("id")).alias("dst"),
    )
    g = PropertyGraph(spark, {"A": a, "M": m, "C": c}, {"R1": r1, "R2": r2})
    engine = CypherEngine(g)
    out = engine.query(
        "MATCH (a:A)-[:R1]->(m:M)-[:R2]->(c:C) RETURN count(*) AS n"
    )
    trace = "\n".join(engine.last_plan_trace)
    assert "anchor c (reversed)" in trace, trace
    assert out.collect()[0]["n"] == r1.count()


def test_reverse_adjacency_copy_is_used(spark):
    """A graph carrying a by-dst physical copy must route <-[:T]- hops
    through it (the paired out/in adjacency of store.rs:504-536) and
    return identical rows."""
    from samyama_graph_spark.cypher.engine import CypherEngine
    from samyama_graph_spark.graph import PropertyGraph

    n = spark.range(0, 100)
    e = spark.range(0, 300).select(
        (F.col("id") % 100).alias("src"), ((F.col("id") * 7) % 100).alias("dst")
    )
    e_by_dst = e.repartition(4, "dst")
    g = PropertyGraph(
        spark, {"N": n}, {"T": e}, edges_rev={"T": e_by_dst}
    )
    engine = CypherEngine(g)
    out = engine.query(
        "MATCH (x:N)<-[:T]-(y:N) WHERE id(x) = 3 RETURN count(*) AS n"
    )
    trace = "\n".join(engine.last_plan_trace)
    assert "reverse adjacency (by-dst copy)" in trace, trace
    expected = e.filter(F.col("dst") == 3).count()
    assert out.collect()[0]["n"] == expected


def test_anchor_decisions_preserve_semantics(spark):
    """Randomized chains over a skewed two-label graph: whatever anchor
    the planner picks (keep / reverse / interior split), the result bag
    must equal the syntactically-reversed query's — the two compile to
    different join orders but identical semantics."""
    import random

    from samyama_graph_spark.cypher.engine import CypherEngine
    from samyama_graph_spark.graph import PropertyGraph

    rng = random.Random(42)
    big = spark.range(0, 300).select(F.col("id"))
    mid = spark.range(1000, 1010).select(
        F.col("id"), (F.col("id") - 1000).alias("k")
    )
    r1 = spark.range(0, 600).select(
        (F.col("id") % 300).alias("src"),
        (F.lit(1000) + F.col("id") % 10).alias("dst"),
    )
    r2 = spark.range(0, 600).select(
        (F.lit(1000) + F.col("id") % 10).alias("src"),
        ((F.col("id") * 3) % 300).alias("dst"),
    )
    g = PropertyGraph(
        spark, {"Big": big, "Mid": mid}, {"R1": r1, "R2": r2}
    )
    engine = CypherEngine(g)

    def flip(p):  # reverse a pattern string built from (node, arrow) parts
        nodes, arrows = p
        out = []
        for n in reversed(nodes):
            out.append(n)
        rev_arr = ["<-[:%s]-" % a[0] if a[1] == ">" else "-[:%s]->" % a[0]
                   for a in reversed(arrows)]
        s = out[0]
        for a, n in zip(rev_arr, out[1:]):
            s += a + n
        return s

    shapes = []
    for _ in range(6):
        n_hops = rng.choice([2, 3])
        nodes = []
        arrows = []
        for i in range(n_hops + 1):
            if i % 2 == 0:
                nodes.append(f"(n{i}:Big)")
            else:
                sel = rng.random() < 0.5
                nodes.append(
                    f"(n{i}:Mid {{k: {rng.randrange(10)}}})" if sel
                    else f"(n{i}:Mid)"
                )
        for i in range(n_hops):
            t = "R1" if i % 2 == 0 else "R2"
            arrows.append((t, ">"))
        fwd = nodes[0]
        for (t, _), n in zip(arrows, nodes[1:]):
            fwd += f"-[:{t}]->" + n
        shapes.append((fwd, flip((nodes, arrows))))

    for fwd, rev in shapes:
        a = engine.query(f"MATCH {fwd} RETURN count(*) AS n").collect()[0]["n"]
        b = engine.query(f"MATCH {rev} RETURN count(*) AS n").collect()[0]["n"]
        assert a == b, f"{fwd} -> {a} vs reversed {b}"


def test_interior_split_handles_var_length_and_undirected(spark):
    """Interior-anchor splits must stay correct when the prefix is a
    var-length segment or a hop is undirected (reversal flips hop
    direction and preserves *min..max bounds)."""
    from samyama_graph_spark.cypher.engine import CypherEngine
    from samyama_graph_spark.graph import PropertyGraph

    big_a = spark.range(0, 1000)
    mid = spark.range(5000, 5010).select(
        F.col("id"), (F.col("id") - 5000).alias("k")
    )
    big_b = spark.range(9000, 10000)
    r1 = spark.range(0, 1000).select(
        F.col("id").alias("src"), (F.lit(5000) + F.col("id") % 10).alias("dst")
    )
    r2 = spark.range(0, 1000).select(
        (F.lit(5000) + F.col("id") % 10).alias("src"),
        (F.lit(9000) + F.col("id")).alias("dst"),
    )
    g = PropertyGraph(
        spark, {"BigA": big_a, "Mid": mid, "BigB": big_b}, {"R1": r1, "R2": r2}
    )
    eng = CypherEngine(g)
    n1 = eng.query(
        "MATCH (a:BigA)-[:R1*1..2]->(m:Mid {k: 3})-[:R2]->(b:BigB) "
        "RETURN count(*) AS n"
    ).collect()[0]["n"]
    assert "interior split" in "\n".join(eng.last_plan_trace)
    n2 = eng.query(
        "MATCH (b:BigB)<-[:R2]-(m:Mid {k: 3})<-[:R1*1..2]-(a:BigA) "
        "RETURN count(*) AS n"
    ).collect()[0]["n"]
    assert n1 == n2 == 10000
    n3 = eng.query(
        "MATCH (a:BigA)-[:R1]->(m:Mid {k: 3})-[:R2]-(b:BigB) "
        "RETURN count(*) AS n"
    ).collect()[0]["n"]
    assert n3 == 10000


def test_cycle_selective_edge_leads(spark):
    """Cyclic multi-path MATCH: the path with the rare edge type must
    be expanded FIRST (smallest intermediate), not the syntactically
    first one — the binary-join mitigation of the WCOJ gap."""
    from samyama_graph_spark.cypher import CypherEngine
    from samyama_graph_spark.graph import PropertyGraph

    n = spark.createDataFrame([(i,) for i in range(60)], "id long")
    big = spark.createDataFrame(
        [(i, (i * 7 + j) % 60) for i in range(60) for j in range(8)],
        "src long, dst long",
    )
    rare = spark.createDataFrame([(1, 2), (5, 9)], "src long, dst long")
    eng = CypherEngine(
        PropertyGraph(spark, {"N": n}, {"BIG": big, "RARE": rare})
    )
    out = eng.query(
        """
        MATCH (a:N)-[:BIG]->(b:N), (b)-[:RARE]->(c:N), (c)-[:BIG]->(a)
        RETURN count(*) AS n
        """
    )
    trace = " | ".join(eng.last_plan_trace)
    assert "reordered" in trace and "b-c" in trace.split("|")[0] + trace, trace
    # the reordered list must START with the rare path
    reorder_line = next(
        t for t in eng.last_plan_trace if "reordered" in t
    )
    first_path = reorder_line.split(": ")[1].split(" | ")[0]
    assert first_path == "b-c", reorder_line
    # and the answer is still the plain conjunctive count
    assert out.collect()[0]["n"] >= 0


def test_wcoj_triangle_intersection_parity(spark):
    """Single-path triangle patterns must take the worst-case-optimal
    intersection join (leapfrog.rs:265) and return the exact row
    multiset of the binary-join plan — including multi-edge
    multiplicity (cnt1*cnt2*cnt3 per binding), undirected edges (both
    orientations), mixed directions, labels, and inline properties."""
    from samyama_graph_spark.cypher.compiler import Compiler
    from samyama_graph_spark.cypher.parser import parse
    from samyama_graph_spark.graph import PropertyGraph

    nodes = spark.createDataFrame(
        [(i, f"n{i}") for i in range(1, 8)], "id long, name string"
    )
    # triangles 1-2-3 (with a 3->1 multi-edge) and 2-3-4; a path tail
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 1), (3, 4), (4, 2),
         (4, 5), (5, 6), (6, 7)],
        "src long, dst long",
    )
    g = PropertyGraph(spark, {"P": nodes}, {"E": edges})
    queries = [
        "MATCH (a)-[:E]->(b)-[:E]->(c)-[:E]->(a) "
        "RETURN a.name AS an, b.name AS bn, c.name AS cn",
        "MATCH (a:P)-[:E]->(b:P)-[:E]->(c:P)-[:E]->(a) RETURN count(*) AS n",
        "MATCH (a)-[:E]->(b)-[:E]->(c)<-[:E]-(a) "
        "RETURN a.name AS an, c.name AS cn",
        "MATCH (a)-[:E]-(b)-[:E]-(c)-[:E]-(a) RETURN count(*) AS n",
    ]
    for q in queries:
        ast = parse(q)
        on = Compiler(g, wcoj=True)
        off = Compiler(g, wcoj=False)
        got = sorted(map(tuple, on.compile_query(ast).collect()))
        want = sorted(map(tuple, off.compile_query(ast).collect()))
        assert any("worst-case-optimal" in t for t in on.plan_trace), (
            q, on.plan_trace,
        )
        assert got == want, (q, got, want)


def test_wcoj_fallback_when_not_equivalent(spark):
    """Shapes the rewrite cannot prove equivalent must stay on the
    binary-join path: edge variables, an already-bound anchor, and a
    labeled closing occurrence."""
    from samyama_graph_spark.cypher import CypherEngine
    from samyama_graph_spark.graph import PropertyGraph

    nodes = spark.createDataFrame(
        [(i, f"n{i}") for i in range(1, 5)], "id long, name string"
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    eng = CypherEngine(PropertyGraph(spark, {"P": nodes}, {"E": edges}))
    fallbacks = [
        # edge variable pins the binary plan (its rows are observable)
        "MATCH (a)-[e:E]->(b)-[:E]->(c)-[:E]->(a) RETURN count(e) AS n",
        # anchor bound by an earlier path -> anchored expansion
        "MATCH (a:P) WITH a MATCH (a)-[:E]->(b)-[:E]->(c)-[:E]->(a) "
        "RETURN count(*) AS n",
        # closing occurrence carries a label constraint
        "MATCH (a)-[:E]->(b)-[:E]->(c)-[:E]->(a:P) RETURN count(*) AS n",
        # inline property = selective anchor -> anchored binary plan
        "MATCH (a {name:'n1'})-[:E]->(b)-[:E]->(c)-[:E]->(a) "
        "RETURN count(*) AS n",
    ]
    expected = [3, 3, 3, 1]
    for q, want in zip(fallbacks, expected):
        n = eng.query(q).collect()[0]["n"]
        assert n == want, (q, n)
        assert not any(
            "worst-case-optimal" in t for t in eng.last_plan_trace
        ), (q, eng.last_plan_trace)


def test_wcoj_broadcast_limit_falls_back(spark):
    """The intersection route is only taken when the catalog's edge
    count estimates fit the broadcast budget; above it, the plan must
    fall back to binary joins (shuffle-shipping adjacency would move
    wedge-order bytes)."""
    from samyama_graph_spark.cypher.compiler import Compiler
    from samyama_graph_spark.cypher.parser import parse
    from samyama_graph_spark.graph import PropertyGraph

    nodes = spark.createDataFrame([(i,) for i in range(1, 5)], "id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    g = PropertyGraph(spark, {"P": nodes}, {"E": edges})
    ast = parse(
        "MATCH (a)-[:E]->(b)-[:E]->(c)-[:E]->(a) RETURN count(*) AS n"
    )
    comp = Compiler(g)
    comp.wcoj_broadcast_limit = 2  # below |E| = 3
    out = comp.compile_query(ast)
    trace = " | ".join(comp.plan_trace)
    assert "exceeds wcoj_broadcast_limit" in trace, trace
    assert not any("worst-case-optimal" in t for t in comp.plan_trace)
    assert out.collect()[0]["n"] == 3


def test_wcoj_plan_is_broadcast_pipeline(spark):
    """The triangle route's physical plan must carry the LFTJ shape:
    the two pair-frame indexes arrive as BroadcastHashJoins so wedge
    tuples stream between them instead of being shuffled.  (The outer
    node-binding joins stay strategy-free on purpose — at scale the
    node tables are big and AQE picks; only the intersection core is
    pinned.)"""
    from samyama_graph_spark.cypher.compiler import Compiler
    from samyama_graph_spark.cypher.parser import parse
    from samyama_graph_spark.graph import PropertyGraph

    nodes = spark.createDataFrame([(i,) for i in range(1, 6)], "id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 2)], "src long, dst long"
    )
    g = PropertyGraph(spark, {"P": nodes}, {"E": edges})
    comp = Compiler(g)
    df = comp.compile_query(
        parse("MATCH (a)-[:E]->(b)-[:E]->(c)-[:E]->(a) RETURN count(*) AS n")
    )
    assert any("worst-case-optimal" in t for t in comp.plan_trace)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_wcoj_rotation_streams_largest_edge(spark):
    """With heterogeneous edge types the cycle must be rotated so the
    LARGEST edge streams and the two smaller ones broadcast — and the
    rotated binding must stay variable-correct (a/b/c keep their
    pattern roles)."""
    from samyama_graph_spark.cypher.compiler import Compiler
    from samyama_graph_spark.cypher.parser import parse
    from samyama_graph_spark.graph import PropertyGraph

    n = 40
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    # BIG: dense ring-ish type; SMALL1/SMALL2: sparse closing types
    big = spark.createDataFrame(
        [(i, (i * 7 + j) % n) for i in range(n) for j in range(1, 6)],
        "src long, dst long",
    )
    s1 = spark.createDataFrame(
        [((i * 7 + 2) % n, (i + 3) % n) for i in range(0, n, 2)],
        "src long, dst long",
    )
    s2 = spark.createDataFrame(
        [((i + 3) % n, i) for i in range(0, n, 2)], "src long, dst long"
    )
    g = PropertyGraph(
        spark, {"P": nodes}, {"BIG": big, "S1": s1, "S2": s2}
    )
    # BIG is edges[0] here; with a tight budget the gate only passes
    # because rotation puts BIG on the streamed side
    q = (
        "MATCH (a)-[:BIG]->(b)-[:S1]->(c)-[:S2]->(a) "
        "RETURN id(a) AS a, id(b) AS b, id(c) AS c"
    )
    ast = parse(q)
    on = Compiler(g, wcoj=True)
    on.wcoj_broadcast_limit = 50  # < |BIG| = 200, >= |S1|,|S2| = 20
    off = Compiler(g, wcoj=False)
    got = sorted(map(tuple, on.compile_query(ast).collect()))
    want = sorted(map(tuple, off.compile_query(ast).collect()))
    assert any("worst-case-optimal" in t for t in on.plan_trace), on.plan_trace
    assert got == want and len(got) > 0, (len(got), len(want))
    # and with BIG written in a broadcast position the same budget
    # still routes through WCOJ (rotation is spelling-independent)
    q2 = (
        "MATCH (b)-[:S1]->(c)-[:S2]->(a)-[:BIG]->(b) "
        "RETURN id(a) AS a, id(b) AS b, id(c) AS c"
    )
    on2 = Compiler(g, wcoj=True)
    on2.wcoj_broadcast_limit = 50
    got2 = sorted(map(tuple, on2.compile_query(parse(q2)).collect()))
    assert any("worst-case-optimal" in t for t in on2.plan_trace)
    assert got2 == want


def test_cycle_closing_edge_broadcasts(spark):
    """k-cycles beyond triangles: the closing ExpandInto hop must pin
    its edge side as a broadcast hash table (under the budget), so the
    wedge stream probes in place instead of reshuffling on the closing
    key — and an over-budget edge must stay unhinted."""
    from samyama_graph_spark.cypher.compiler import Compiler
    from samyama_graph_spark.cypher.parser import parse
    from samyama_graph_spark.graph import PropertyGraph

    n = 30
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(i, (i * 3 + j) % n) for i in range(n) for j in range(1, 4)],
        "src long, dst long",
    )
    g = PropertyGraph(spark, {"P": nodes}, {"E": edges})
    g.edge_count_est("E")  # ANALYZE-warmed stats: the hint is cache-hit-only
    q = (
        "MATCH (a)-[:E]->(b)-[:E]->(c)-[:E]->(d)-[:E]->(a) "
        "RETURN count(*) AS n"
    )
    comp = Compiler(g)
    df = comp.compile_query(parse(q))
    trace = " | ".join(comp.plan_trace)
    assert "cycle-closing broadcast" in trace, trace
    assert "BroadcastHashJoin" in _plan(df)
    want = df.collect()[0]["n"]
    # unhinted (over budget) plan must agree
    comp2 = Compiler(g)
    comp2.wcoj_broadcast_limit = 1
    got = comp2.compile_query(parse(q)).collect()[0]["n"]
    assert "cycle-closing broadcast" not in " | ".join(comp2.plan_trace)
    assert got == want and want > 0


def test_wcoj_randomized_multigraph_parity(spark):
    """Seeded random multigraphs (self-loops, parallel edges, mixed
    directions): the intersection route must return the exact row
    multiset of the binary plan on every draw — the randomized lock on
    the rewrite's equivalence conditions."""
    import random

    from samyama_graph_spark.cypher.compiler import Compiler
    from samyama_graph_spark.cypher.parser import parse
    from samyama_graph_spark.graph import PropertyGraph

    rng = random.Random(1234)
    for trial in range(2):
        n = 6
        es = [(rng.randint(1, n), rng.randint(1, n)) for _ in range(18)]
        es += [(2, 2), (3, 3)]  # self-loops stay in scope
        nodes = spark.createDataFrame(
            [(i,) for i in range(1, n + 1)], "id long"
        )
        edges = spark.createDataFrame(es, "src long, dst long")
        g = PropertyGraph(spark, {"P": nodes}, {"E": edges})
        for q in [
            "MATCH (a)-[:E]->(b)-[:E]->(c)-[:E]->(a) "
            "RETURN id(a) AS a, id(b) AS b, id(c) AS c",
            "MATCH (a)-[:E]-(b)-[:E]->(c)<-[:E]-(a) "
            "RETURN id(a) AS a, id(c) AS c",
        ]:
            ast = parse(q)
            on = Compiler(g, wcoj=True)
            off = Compiler(g, wcoj=False)
            got = sorted(map(tuple, on.compile_query(ast).collect()))
            want = sorted(map(tuple, off.compile_query(ast).collect()))
            assert any("worst-case-optimal" in t for t in on.plan_trace)
            assert got == want, (trial, q, len(got), len(want))


def test_range_join_avoids_nested_loop(spark):
    """range_join must plan as an equi-join on (key, cell) + residual
    filter — never the BroadcastNestedLoopJoin/Cartesian Catalyst
    picks for a pure inequality join (the range-join scale-killer)."""
    import datetime as dt

    from samyama_graph_spark.datapipe.timeseries import range_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, 10, t0, t0 + dt.timedelta(hours=1))],
        "k long, iv long, s timestamp, e timestamp",
    )
    right = spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=30), 5.0)],
        "k long, ts timestamp, v double",
    )
    out = range_join(
        left, right, key=["k"], start_col="s", end_col="e",
        ts_col="ts", bucket_seconds=1800,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert out.count() == 1


def test_var_length_broadcast_pipeline(spark):
    """Bounded var-length traversals over a broadcast-budget edge set
    must chain BroadcastHashJoins (edge side resident, one stage for
    the whole unrolled BFS) — no SortMergeJoin/ShuffledHashJoin on any
    hop — and the over-budget plan must return the identical result
    through ordinary shuffled joins."""
    from samyama_graph_spark.cypher.compiler import Compiler
    from samyama_graph_spark.cypher.parser import parse
    from samyama_graph_spark.graph import PropertyGraph

    n = 40
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(i, (i + d) % n) for i in range(n) for d in (1, 7)],
        "src long, dst long",
    )
    g = PropertyGraph(spark, {"P": nodes}, {"E": edges})
    g.__dict__["_stats_safe"] = True  # lazy compile-time stats allowed
    q = (
        "MATCH (a:P)-[:E*1..3]->(b:P) WHERE id(a) < 5 "
        "RETURN id(a) AS a, count(*) AS n ORDER BY a"
    )
    comp = Compiler(g)
    df = comp.compile_query(parse(q))
    trace = " | ".join(comp.plan_trace)
    assert "broadcast-resident" in trace, trace
    # the traversal itself (hops only, no node join-back) must be a
    # pure BroadcastHashJoin pipeline: its only exchange is the
    # min-hops resolve
    from samyama_graph_spark.operators.traversal import var_length_expand

    starts = nodes.filter("id < 5")
    tplan = (
        var_length_expand(starts, edges, 1, 3, broadcast_edges=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in tplan and "ShuffledHashJoin" not in tplan
    assert tplan.count("BroadcastHashJoin") >= 3
    want = [tuple(r) for r in df.collect()]
    comp2 = Compiler(g)
    comp2.wcoj_broadcast_limit = 1
    got = [tuple(r) for r in comp2.compile_query(parse(q)).collect()]
    assert "broadcast-resident" not in " | ".join(comp2.plan_trace)
    assert got == want and len(want) == 5


def test_collect_if_small_count_probe_no_row_ship(spark, monkeypatch):
    """Over-guard join-derived frames must be rejected by the count
    probe (no row transfer), never by collecting guard+1 rows; frames
    under the guard must still collect."""
    from pyspark.sql import DataFrame

    from samyama_graph_spark.algorithms.util import collect_if_small

    left = spark.range(2000).withColumnRenamed("id", "a")
    right = spark.range(2000).withColumnRenamed("id", "b")
    # join-derived (untrustworthy estimate), 4M rows >> guard
    big = left.crossJoin(right)
    real_collect = DataFrame.collect

    def trap(self):
        raise AssertionError("over-guard frame must not ship rows")

    monkeypatch.setattr(DataFrame, "collect", trap)
    assert collect_if_small(big, 10_000) is None
    monkeypatch.setattr(DataFrame, "collect", real_collect)
    # under-guard join-derived frame still engages the fast path
    small = left.join(right, left["a"] == right["b"]).limit(50)
    rows = collect_if_small(small, 10_000, "a")
    assert rows is not None and len(rows) == 50


def test_edges_pdf_count_probe_no_row_ship(spark, monkeypatch):
    from pyspark.sql import DataFrame

    from samyama_graph_spark.algorithms.paths import _edges_pdf_if_small

    left = spark.range(2000).withColumnRenamed("id", "src")
    right = spark.range(2000).withColumnRenamed("id", "dst")
    big = left.crossJoin(right)
    monkeypatch.setattr(
        DataFrame, "toPandas",
        lambda self: (_ for _ in ()).throw(
            AssertionError("over-guard frame must not ship rows")
        ),
    )
    assert _edges_pdf_if_small(big, 10_000) is None
    monkeypatch.undo()
    small = big.limit(100)
    pdf = _edges_pdf_if_small(small, 10_000)
    assert pdf is not None and len(pdf) == 100


def test_gopher_rules_is_map_only(spark, sf_dir):
    """The Gopher rule-set projection must be a pure map pass: zero
    Exchange, zero Python — the property that lets the quality filter
    run at scan speed on 100 TB."""
    from samyama_graph_spark.datapipe.corpus import gopher_rules
    from samyama_graph_spark.loaders import load_tables

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    plan = _plan(gopher_rules(docs, "text", "doc_id"))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_dedup_lines_two_shuffles(spark, sf_dir):
    """Corpus-wide line dedup = the argmin aggregate on the line hash
    plus the per-doc reassembly regroup (plus their join back) — no
    window, no Python, no cartesian stage."""
    import re

    from samyama_graph_spark.datapipe.dedup import dedup_lines
    from samyama_graph_spark.loaders import load_tables

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    plan = _plan(dedup_lines(docs.select("doc_id", "text"), "text", "doc_id"))
    assert "Python" not in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    # argmin groupBy + reassembly groupBy + the result join back to the
    # doc frame: bounded small constant, NEVER data-dependent.  (r11:
    # the verdict join-back and the (id, pos) outer join are gone — the
    # kept line set comes straight out of the argmin aggregate)
    n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_ex <= 4, plan[:2000]
    assert len(re.findall(r"\(\d+\) Window", plan)) == 0


def test_dsir_weights_plan_shape(spark, sf_dir):
    """DSIR weights: map-only feature extraction, two bounded-key
    histogram aggregates, a BROADCAST join of the <=buckets-row LLR
    table back to the feature stream, one per-doc aggregate — no
    Python, no window, no cartesian, and the weight lookup must be a
    broadcast (a shuffle join on the feature stream would re-shuffle
    the corpus a third time).  Scan discipline (r10 verdict task 4):
    the stats phase reads each corpus exactly once (totals come from
    the persisted histograms, not separate count jobs), and the
    RETURNED plan scans the raw corpus exactly once and the target
    corpus zero times — the LLR table is a LocalRelation."""
    import re

    from samyama_graph_spark.datapipe.corpus import dsir_weights
    from samyama_graph_spark.loaders import load_tables

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    out = dsir_weights(
        docs, docs.filter("lang = 'en'"), "text", "doc_id", buckets=512
    )
    plan = _plan(out)
    assert "Python" not in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert len(re.findall(r"\(\d+\) Window", plan)) == 0
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # exactly ONE corpus scan in the returned plan: the feature stream.
    # The r10 version's plan re-scanned documents for the raw histogram
    # and the target subset (3 scans) and ran 2 more full-corpus count
    # jobs eagerly; the histogram-derived totals delete all of that.
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == 1, plan[:2000]
    assert "LocalTableScan" in plan


def test_dsir_sample_top_k_is_take_ordered(spark, sf_dir):
    """The DSIR selection's global top-k must compile to
    TakeOrderedAndProject (per-partition heaps), not a single-task
    global sort or window rank."""
    from samyama_graph_spark.datapipe.corpus import dsir_sample
    from samyama_graph_spark.loaders import load_tables

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    out = dsir_sample(
        docs, docs.filter("lang = 'en'"), "text", "doc_id",
        keep=10, buckets=512,
    )
    plan = _plan(out)
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert len(out.collect()) == 10


def test_maximal_spans_plan_shape(spark, sf_dir):
    """Any-offset maximal-span miner: windows explode + fingerprint
    equi-join (string-verified), then exactly ONE diagonal-partitioned
    Window for the gaps-and-islands merge whose partitioning the
    extent groupBy reuses — no Python, no cartesian, and a bounded
    Exchange count (window explode/join + island shuffle; never
    data-dependent)."""
    import re

    from samyama_graph_spark.datapipe.dedup import maximal_duplicate_spans
    from samyama_graph_spark.loaders import load_tables

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    out = maximal_duplicate_spans(docs, "text", "doc_id", k=8, min_len=50)
    plan = _plan(out)
    assert "Python" not in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1
    n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_ex <= 4, plan[:2000]


def test_minhash_pairs_carry_sizes_no_size_joins(spark, sf_dir):
    """minhash_lsh_pairs (r11): shingle-set sizes ride the signature
    aggregate and the candidate rows, so the returned plan holds
    exactly FOUR scan+explode subtrees (two bucket legs + two
    verification legs — the former separate size-aggregate joins are
    gone) and no window/cartesian/Python."""
    import re

    from samyama_graph_spark.datapipe.dedup import minhash_lsh_pairs
    from samyama_graph_spark.loaders import load_tables

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    out = minhash_lsh_pairs(docs, "text", "doc_id", k=3)
    plan = _plan(out)
    assert "Python" not in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert len(re.findall(r"\(\d+\) Window", plan)) == 0
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    # upper bound, not equality: the intent is "the size joins' extra
    # scan subtrees are gone"; a Catalyst/AQE planning change that
    # merges scans further should not fail the test
    assert n_scans <= 4, plan[:2000]
