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
