"""CALL procedure dispatch (reference: planner.rs:1230-1292).

Supported: db.labels / db.relationshipTypes / db.propertyKeys /
db.schema.visualization / db.index.vector.queryNodes, and the algo.*
family (pageRank, wcc, bfs, shortestPath, weightedPath, triangleCount,
cdlp, lcc) mapped onto the algorithms package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from samyama_graph_spark.graph import PropertyGraph


def _all_edges(g: PropertyGraph) -> DataFrame:
    return g.unified_edges().select("src", "dst")


def run_procedure(g: PropertyGraph, name: str, args: list) -> DataFrame:
    spark = g.spark

    if name == "db.labels":
        return spark.createDataFrame([(l,) for l in g.labels()], "label string")
    if name == "db.relationshiptypes":
        return spark.createDataFrame(
            [(t,) for t in g.edge_types()], "relationshipType string"
        )
    if name == "db.propertykeys":
        return spark.createDataFrame(
            [(k,) for k in g.property_keys()], "propertyKey string"
        )
    if name == "db.schema.visualization":
        return g.schema_visualization()

    if name == "db.index.vector.querynodes":
        label, prop, vec, k = args[0], args[1], args[2], int(args[3])
        from samyama_graph_spark.datapipe.similarity import knn_bruteforce

        nodes = g.node_df(label)
        hits = knn_bruteforce(
            nodes.filter(F.col(prop).isNotNull()), prop, "id",
            [float(x) for x in vec], k, metric="cosine",
        )
        out = hits.join(nodes, "id").select(
            F.col("id").alias("nodeId"), F.col("score")
        )
        return out

    if name.startswith("algo."):
        return _run_algo(g, name[5:], args)

    raise ValueError(f"unknown procedure {name}")


def _run_algo(g: PropertyGraph, algo: str, args: list) -> DataFrame:
    edges = _all_edges(g)
    if algo == "pagerank":
        from samyama_graph_spark.algorithms import pagerank

        iters = int(args[0]) if args else 10
        damping = float(args[1]) if len(args) > 1 else 0.85
        return pagerank(edges, iters, damping).select(
            F.col("id").alias("nodeId"), F.col("rank").alias("score")
        )
    if algo == "wcc":
        from samyama_graph_spark.algorithms import wcc

        return wcc(edges).select(
            F.col("id").alias("nodeId"), F.col("component").alias("componentId")
        )
    if algo == "scc":
        from samyama_graph_spark.algorithms import scc

        return scc(edges).select(
            F.col("id").alias("nodeId"), F.col("component").alias("componentId")
        )
    if algo == "bfs":
        from samyama_graph_spark.algorithms import bfs

        source = int(args[0])
        max_depth = int(args[1]) if len(args) > 1 else 30
        return bfs(edges, source, max_depth).select(
            F.col("id").alias("nodeId"), F.col("depth")
        )
    if algo in ("shortestpath",):
        from samyama_graph_spark.algorithms import shortest_path_length

        spark = g.spark
        hops = shortest_path_length(edges, int(args[0]), int(args[1]))
        return spark.createDataFrame([(hops,)], "hops int")
    if algo in ("weightedpath", "sssp"):
        from samyama_graph_spark.algorithms import sssp

        weight_col = args[1] if len(args) > 1 else "weight"
        e = g.unified_edges()
        if weight_col not in e.columns:
            e = e.withColumn(weight_col, F.lit(1.0))
        return sssp(
            e.select("src", "dst", weight_col), int(args[0]), weight_col
        ).select(F.col("id").alias("nodeId"), F.col("dist"))
    if algo == "maxflow":
        from samyama_graph_spark.algorithms.flow import max_flow

        cap_col = args[2] if len(args) > 2 else "capacity"
        e = g.unified_edges()
        if cap_col not in e.columns:
            e = e.withColumn(cap_col, F.lit(1.0))
        val = max_flow(e.select("src", "dst", cap_col), int(args[0]), int(args[1]), cap_col)
        return g.spark.createDataFrame([(val,)], "maxFlow double")
    if algo == "mst":
        from samyama_graph_spark.algorithms.mst import mst

        weight_col = args[0] if args else "weight"
        e = g.unified_edges()
        if weight_col not in e.columns:
            e = e.withColumn(weight_col, F.lit(1.0))
        return mst(e.select("src", "dst", weight_col), weight_col)
    if algo == "trianglecount":
        from samyama_graph_spark.algorithms import triangle_count

        n = triangle_count(edges)
        return g.spark.createDataFrame([(n,)], "triangles long")
    if algo == "cdlp":
        from samyama_graph_spark.algorithms import cdlp

        iters = int(args[0]) if args else 10
        return cdlp(edges, iters).select(
            F.col("id").alias("nodeId"), F.col("label").alias("communityId")
        )
    if algo == "lcc":
        from samyama_graph_spark.algorithms import lcc

        return lcc(edges).select(F.col("id").alias("nodeId"), F.col("lcc"))
    raise ValueError(f"unknown algorithm procedure algo.{algo}")
