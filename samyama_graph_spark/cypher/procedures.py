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
    if algo == "or.solve":
        if not args or not isinstance(args[0], dict):
            raise ValueError("algo.or.solve requires a config map")
        return _or_solve(g, args[0])
    raise ValueError(f"unknown algorithm procedure algo.{algo}")


def _or_solve(g: PropertyGraph, cfg: dict) -> DataFrame:
    """CALL algo.or.solve({...}) (reference operator.rs:6617-6766):
    one decision variable per node of ``label``, objective
    sum(x*cost_property), solution written back to ``property``.
    Config keys mirror the reference: algorithm, label, property,
    min, max, cost_property / cost_properties, budget, min_total,
    population_size, max_iterations (+ our deterministic ``seed``)."""
    import numpy as np

    from samyama_graph_spark.algorithms.optimize import (
        MAX_DIM,
        ORProblem,
        ParetoResult,
        solve,
    )

    spark = g.spark
    label = cfg["label"]
    prop = cfg["property"]
    algorithm = str(cfg.get("algorithm", "Jaya"))
    cost_props: list[str] = []
    if cfg.get("cost_property"):
        cost_props = [cfg["cost_property"]]
    elif cfg.get("cost_properties"):
        cost_props = list(cfg["cost_properties"])
    iters = int(cfg.get("max_iterations", 100))

    nodes = g.node_df(label)
    sel = [F.col("id").cast("long").alias("id")] + [
        F.coalesce(F.col(c).cast("double"), F.lit(1.0)).alias(f"c{i}")
        for i, c in enumerate(cost_props)
    ]
    # deterministic variable order (the reference iterates store order;
    # we sort by id) — gathered to the driver like the reference's
    # Vec<f64>, Arrow-batched, with an explicit size guard
    pdf = nodes.select(*sel).orderBy("id").toPandas()
    if pdf.empty:
        return spark.createDataFrame(
            [], "fitness double, algorithm string, iterations long"
        )
    if len(pdf) > MAX_DIM:
        raise ValueError(
            f"algo.or.solve: label {label} has {len(pdf)} nodes; "
            f"driver-side solver capped at {MAX_DIM}"
        )
    ids = pdf["id"].to_numpy()
    if cost_props:
        cost_mat = np.stack(
            [pdf[f"c{i}"].to_numpy() for i in range(len(cost_props))]
        )
    else:
        cost_mat = np.ones((1, len(ids)))
    problem = ORProblem(
        costs=cost_mat[0],
        lower=float(cfg.get("min", 0.0)),
        upper=float(cfg.get("max", 100.0)),
        budget=float(cfg["budget"]) if "budget" in cfg else None,
        min_total=float(cfg["min_total"]) if "min_total" in cfg else None,
        multi_costs=cost_mat if len(cost_props) > 1 else None,
    )
    res = solve(
        problem,
        algorithm,
        pop=int(cfg.get("population_size", 50)),
        iters=iters,
        seed=int(cfg.get("seed", 42)),
    )

    best = (
        res.front_variables[0] if isinstance(res, ParetoResult)
        else res.best_variables
    )
    import pandas as pd

    sol = spark.createDataFrame(
        pd.DataFrame(
            {"id": ids.astype("int64"), "__orv": best.astype("float64")}
        )
    )
    tbl = g.nodes[label]
    if prop in tbl.columns:
        tbl = tbl.drop(prop)
    g.nodes[label] = tbl.join(sol, "id", "left").withColumnRenamed(
        "__orv", prop
    )

    if isinstance(res, ParetoResult):
        return spark.createDataFrame(
            [
                (
                    [float(x) for x in res.front_fitness[0]],
                    algorithm,
                    int(len(res.front_variables)),
                )
            ],
            "fitness array<double>, algorithm string, front_size long",
        )
    return spark.createDataFrame(
        [
            (
                float(res.best_fitness),
                algorithm,
                iters,
                [float(h) for h in res.history],
            )
        ],
        "fitness double, algorithm string, iterations long, history array<double>",
    )
