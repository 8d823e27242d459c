"""Bucketed-layout proof: co-bucketed tables join with zero shuffle
Exchanges — the at-rest property that makes expansion joins viable at
100 TB (Spark analogue of the reference's CSR adjacency,
store.rs:294-340)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from samyama_graph_spark.layout import (
    bucketed_edge_tables,
    count_exchanges,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    nodes = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("grp")
    )
    edges = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("src"),
        ((F.col("id") * 13 + 7) % 1000).alias("dst"),
    )
    write_bucketed(nodes, "t_nodes", "id", 8, path=f"{wh}/t_nodes")
    by_src, by_dst = bucketed_edge_tables(
        spark, edges, "t_edges", 8, base_path=wh
    )
    yield spark.table("t_nodes"), by_src, by_dst
    for t in ("t_nodes", "t_edges_by_src", "t_edges_by_dst"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_cobucketed_join_has_no_shuffle(spark, bucketed):
    nodes, by_src, by_dst = bucketed
    # force SMJ (no broadcast) to prove co-location, not broadcasting
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = by_src.join(nodes, by_src["src"] == nodes["id"])
        assert count_exchanges(j) == 0, j._jdf.queryExecution().executedPlan().toString()
        assert j.count() == 5000
        # reverse expansion against the dst-bucketed copy: also shuffle-free
        j2 = by_dst.join(nodes, by_dst["dst"] == nodes["id"])
        assert count_exchanges(j2) == 0
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_unbucketed_join_shuffles(spark, bucketed):
    # control: the same join on raw frames has Exchanges, proving the
    # bucketed zero-Exchange result is the layout's doing
    nodes, by_src, _ = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        raw_edges = spark.range(0, 5000).select(
            (F.col("id") % 1000).alias("src"),
            ((F.col("id") * 13 + 7) % 1000).alias("dst"),
        )
        raw_nodes = spark.range(0, 1000).select(F.col("id"))
        j = raw_edges.join(raw_nodes, raw_edges["src"] == raw_nodes["id"])
        assert count_exchanges(j) >= 2
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_graph_with_dual_adjacency_routes_reverse_hops(spark, tmp_path):
    """The layout helper must produce a graph whose reverse Cypher hops
    read the by-dst bucketed copy (plan-traced) with identical rows."""
    from pyspark.sql import functions as F

    from samyama_graph_spark.cypher.engine import CypherEngine
    from samyama_graph_spark.graph import PropertyGraph
    from samyama_graph_spark.layout import graph_with_dual_adjacency

    n = spark.range(0, 50)
    e = spark.range(0, 200).select(
        (F.col("id") % 50).alias("src"), ((F.col("id") * 3) % 50).alias("dst")
    )
    g0 = PropertyGraph(spark, {"N": n}, {"T": e})
    g = graph_with_dual_adjacency(
        g0, num_buckets=4, base_path=str(tmp_path), prefix="dual"
    )
    assert set(g.edges_rev) == {"T"}
    engine = CypherEngine(g)
    out = engine.query(
        "MATCH (x:N)<-[:T]-(y:N) WHERE id(x) = 3 RETURN count(*) AS n"
    ).collect()
    trace = "\n".join(engine.last_plan_trace)
    assert "reverse adjacency (by-dst copy)" in trace, trace
    assert out[0]["n"] == e.filter(F.col("dst") == 3).count()
