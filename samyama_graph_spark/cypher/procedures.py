"""CALL procedure dispatch (reference: planner.rs:1230-1292).

Supported: db.labels / db.relationshipTypes / db.propertyKeys /
db.schema.visualization / db.index.vector.queryNodes, and the algo.*
family (pageRank, wcc, bfs, shortestPath, weightedPath, triangleCount,
cdlp, lcc) mapped onto the algorithms package.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from samyama_graph_spark.graph import PropertyGraph, local_string_frame


def _normalize_metric(m: str) -> str:
    """Reference metric spellings -> internal keys (parse_metric,
    http/vector.rs:44-48: cosine | l2/euclidean | inner_product/dot)."""
    m = m.lower()
    if m in ("l2", "euclidean"):
        return "l2"
    if m in ("inner_product", "dot", "innerproduct"):
        return "dot"
    return "cosine"


def _all_edges(g: PropertyGraph) -> DataFrame:
    return g.unified_edges().select("src", "dst")


def _algo_args(args: list) -> tuple[str | None, str | None, dict]:
    """Reference argument convention for algo.* (operator.rs:6327-6354):
    first string = node label, second string = edge type, any map =
    config; other types are ignored."""
    strings = [a for a in args if isinstance(a, str)]
    label = strings[0] if strings else None
    edge_type = strings[1] if len(strings) > 1 else None
    config: dict = {}
    for a in args:
        if isinstance(a, dict):
            config.update(a)
    return label, edge_type, config


def _view(
    g: PropertyGraph,
    label: str | None,
    edge_type: str | None,
    weight_col: str | None = None,
) -> DataFrame:
    """Edge view filtered like the reference's build_view
    (src/algo/mod.rs:26-98): edges of ``edge_type`` whose BOTH endpoints
    carry ``label``; missing/non-numeric weights default to 1.0.
    Unknown labels/types yield an empty view (not an error)."""
    spark = g.spark
    try:
        edges = g.edge_df(edge_type) if edge_type else g.unified_edges()
    except KeyError:
        return spark.createDataFrame([], "src long, dst long, weight double")
    cols = [F.col("src"), F.col("dst")]
    if weight_col is not None:
        w = (
            F.coalesce(F.col(weight_col).cast("double"), F.lit(1.0))
            if weight_col in edges.columns
            else F.lit(1.0)
        )
        cols.append(w.alias("weight"))
    e = edges.select(*cols)
    if label is not None:
        try:
            ids = g.node_df(label).select("id")
        except KeyError:
            return spark.createDataFrame(
                [], "src long, dst long" + (", weight double" if weight_col else "")
            )
        e = e.join(
            F.broadcast(ids.withColumnRenamed("id", "src")), "src", "left_semi"
        ).join(
            F.broadcast(ids.withColumnRenamed("id", "dst")), "dst", "left_semi"
        )
    return e


def _label_struct_fields(g: PropertyGraph, label: str) -> list:
    """Struct fields packing ONE label's rows in the unified path's
    column order, padding with typed NULLs for properties that exist
    only on OTHER labels — so the node-struct schema (and node.prop
    resolution, as NULL) is identical no matter which packing path
    fired.  Schema access only, no job."""
    nd = g.nodes[label]
    order: list[str] = ["id"]
    types: dict = {}
    for t in g.nodes.values():
        for fld in t.schema.fields:
            if fld.name not in types:
                types[fld.name] = fld.dataType
                if fld.name != "id":
                    order.append(fld.name)
    own = set(nd.columns)
    fields = [
        (F.col(c) if c in own else F.lit(None).cast(types[c])).alias(c)
        for c in order
    ]
    fields.append(F.array(F.lit(label)).alias("_labels"))
    return fields


def _with_node(
    g: PropertyGraph, df: DataFrame, id_col: str, out: str = "node",
    label: str | None = None,
) -> DataFrame:
    """Join a result keyed by node id to the full node rows, packed as
    the compiler's node-struct convention so YIELDed ``node`` supports
    ``node.prop`` / ``id(node)`` / ``labels(node)`` — the reference
    binds a full Node value (operator.rs:6365).

    When the result is statically scoped to one ``label`` (vector
    search, label-filtered algorithms), pack that label's table alone:
    ``unified_nodes()`` is a union + groupBy over EVERY node table,
    which at scale turns a 10-row join-back into a full-graph
    aggregate."""
    if label is not None and label in g.nodes:
        fields = _label_struct_fields(g, label)
        packed = g.nodes[label].select(
            F.col("id").alias("__nid"), F.struct(*fields).alias(out)
        )
    else:
        nodes = g.unified_nodes()
        fields = [F.col(c).alias(c) for c in nodes.columns if c != "labels"]
        fields.append(F.col("labels").alias("_labels"))
        packed = nodes.select(
            F.col("id").alias("__nid"), F.struct(*fields).alias(out)
        )
    return df.join(packed, df[id_col] == packed["__nid"], "inner").drop("__nid")


def run_procedure(
    g: PropertyGraph, name: str, args: list, catalog=None
) -> DataFrame:
    spark = g.spark

    if name == "db.labels":
        return local_string_frame(
            spark, [(l,) for l in g.labels()], ["label"]
        )
    if name == "db.relationshiptypes":
        return local_string_frame(
            spark, [(t,) for t in g.edge_types()], ["relationshipType"]
        )
    if name == "db.propertykeys":
        return local_string_frame(
            spark, [(k,) for k in g.property_keys()], ["propertyKey"]
        )
    if name == "db.schema.visualization":
        return g.schema_visualization()

    if name == "db.index.vector.querynodes":
        label, prop, vec, k = args[0], args[1], args[2], int(args[3])
        # honor the metric recorded by CREATE VECTOR INDEX ... OPTIONS
        # {similarity: 'cosine'|'l2'|'inner_product'} — the reference
        # searches with the index's DistanceMetric (vector/index.rs:71-77,
        # parse_metric http/vector.rs:44-48); default cosine
        metric = "cosine"
        layout = None
        nprobe = 4
        if catalog is not None:
            for idx in catalog.indexes.values():
                if (
                    idx.kind == "vector"
                    and idx.label == label
                    and idx.properties == [prop]
                ):
                    metric = _normalize_metric(
                        idx.options.get("metric") or "cosine"
                    )
                    layout = idx.options.get("layout_path")
                    nprobe = int(idx.options.get("nprobe") or 4)
        qv = [float(x) for x in vec]
        if layout is not None:
            # at-rest IVF layout built by
            # Catalog.build_vector_index_layout: probe reads only the
            # nprobe matching cell directories (partition pruning at
            # the file source) instead of scanning the label — the
            # CREATE VECTOR INDEX actually changes the plan, like the
            # reference's HNSW search path (vector/index.rs:196-258)
            from samyama_graph_spark.datapipe.similarity import (
                knn_ivf_partitioned,
            )

            hits = knn_ivf_partitioned(
                spark, layout, prop, "id", qv, None, k,
                metric=metric, nprobe=nprobe,
            )
        else:
            # single-scan top-k: score AND pack the node struct in the
            # same projection, so ONE TakeOrderedAndProject carries the
            # full node value through the per-partition k-heaps — no
            # join-back (which re-scanned the label table per query;
            # the r8 verdict measured the 2-scan shape at ~0.65 s vs
            # the reference's 65 ms vector query, vector/index.rs:196)
            from samyama_graph_spark.datapipe.similarity import _score

            nodes = g.node_df(label)
            q = F.lit(qv).cast("array<double>")
            v = F.col(prop).cast("array<double>")
            score, desc = _score(metric, v, q)
            scored = nodes.filter(F.col(prop).isNotNull()).select(
                F.struct(*_label_struct_fields(g, label)).alias("node"),
                F.col("id").alias("nodeId"),
                score.alias("score"),
            )
            order = [
                F.desc("score") if desc else F.asc("score"),
                F.asc("nodeId"),
            ]
            return scored.orderBy(*order).limit(k).select(
                "node", "score", "nodeId"
            )
        # IVF path: hits come from the at-rest layout (id + score only),
        # so bind the full node value by join-back (VectorSearchOperator,
        # operator.rs:4645; tests YIELD node, score RETURN node.name).
        # L2 is a distance (ascending); cosine/inner product are
        # similarities (descending)
        order = F.asc("score") if metric == "l2" else F.desc("score")
        return _with_node(
            g, hits.select("id", "score"), "id", label=label
        ).select(
            "node", "score", F.col("id").alias("nodeId")
        ).orderBy(order)

    if name.startswith("algo."):
        return _run_algo(g, name[5:], args)

    raise ValueError(f"unknown procedure {name}")


def _run_algo(g: PropertyGraph, algo: str, args: list) -> DataFrame:
    """Dispatch per the reference's AlgorithmOperator
    (operator.rs:6302-6902), with its argument conventions and YIELD
    schemas; node results bind the full node value as ``node``."""
    label, edge_type, config = _algo_args(args)

    if algo == "pagerank":
        from samyama_graph_spark.algorithms import pagerank

        # PageRankConfig::default(): 20 iterations, damping 0.85
        iters = int(config.get("iterations", 20))
        damping = float(config.get("damping", 0.85))
        out = pagerank(_view(g, label, edge_type), iters, damping)
        return _with_node(g, out, "id", label=label).select(
            "node", F.col("rank").alias("score"), F.col("id").alias("nodeId")
        ).orderBy(F.desc("score"))
    if algo in ("wcc", "scc"):
        from samyama_graph_spark.algorithms import scc, wcc

        fn = wcc if algo == "wcc" else scc
        out = fn(_view(g, label, edge_type))
        return _with_node(g, out, "id", label=label).select(
            "node",
            F.col("component").alias("componentId"),
            F.col("id").alias("nodeId"),
        ).orderBy("componentId")
    if algo == "cdlp":
        from samyama_graph_spark.algorithms import cdlp

        iters = int(config.get("maxIterations", 100))
        out = cdlp(_view(g, label, edge_type), iters)
        return _with_node(g, out, "id", label=label).select(
            "node",
            F.col("label").alias("communityId"),
            F.col("id").alias("nodeId"),
        ).orderBy("communityId")
    if algo == "lcc":
        from samyama_graph_spark.algorithms import lcc

        # {directed: true} selects the reference's directed kernel
        # (lcc.rs:42 d*(d-1) denominator over ordered neighbor pairs)
        directed = bool(config.get("directed", False))
        out = lcc(_view(g, label, edge_type), directed=directed)
        return _with_node(g, out, "id", label=label).select(
            "node",
            F.col("lcc").alias("coefficient"),
            F.col("id").alias("nodeId"),
        ).orderBy(F.desc("coefficient"))
    if algo == "bfs":
        # Our extension (the reference routes unweighted shortestPath
        # through BFS internally): full reachability layers.
        from samyama_graph_spark.algorithms import bfs

        ints = [a for a in args if isinstance(a, (int, float))]
        source = int(ints[0])
        max_depth = int(ints[1]) if len(ints) > 1 else 30
        out = bfs(_all_edges(g), source, max_depth)
        return _with_node(g, out, "id").select(
            "node", "depth", F.col("id").alias("nodeId")
        ).orderBy("depth", "nodeId")
    if algo in ("shortestpath", "weightedpath"):
        from samyama_graph_spark.algorithms.paths import shortest_path_with_cost

        ints = [a for a in args if isinstance(a, (int, float))]
        if len(ints) < 2:
            raise ValueError(f"algo.{algo} requires source and target ids")
        # weightedPath's third positional arg is the weight property
        # (operator.rs:6577); shortestPath takes {weight_property} in
        # its config map (operator.rs:6396-6403)
        strings = [a for a in args if isinstance(a, str)]
        weight = (
            strings[0]
            if algo == "weightedpath" and strings
            else config.get("weight_property")
        )
        res = shortest_path_with_cost(
            _view(g, None, None, weight),
            int(ints[0]),
            int(ints[1]),
            weight_col="weight" if weight else None,
        )
        if res is None:
            return g.spark.createDataFrame(
                [], "path array<long>, cost double"
            )
        path, cost = res
        return g.spark.createDataFrame(
            [(path, cost)], "path array<long>, cost double"
        )
    if algo == "maxflow":
        from samyama_graph_spark.algorithms.flow import max_flow

        ints = [a for a in args if isinstance(a, (int, float))]
        strings = [a for a in args if isinstance(a, str)]
        cap = strings[0] if strings else None
        e = _view(g, None, None, cap)
        if cap is None:
            e = e.withColumn("weight", F.lit(1.0))
        val = max_flow(e, int(ints[0]), int(ints[1]), "weight")
        return g.spark.createDataFrame(
            [(float(val or 0.0),)], "max_flow double"
        )
    if algo == "mst":
        from samyama_graph_spark.algorithms.mst import mst

        strings = [a for a in args if isinstance(a, str)]
        weight = strings[0] if strings else None
        e = _view(g, None, None, weight)
        if weight is None:
            e = e.withColumn("weight", F.lit(1.0))
        tree = mst(e, "weight")
        tree = _with_node(g, tree, "src", out="source")
        tree = _with_node(g, tree, "dst", out="target").select(
            "source", "target", "weight"
        )
        # summary record carrying only total_weight (operator.rs:6824-
        # 6828) + per-edge records; unionByName null-fills the rest
        summary = tree.agg(F.sum("weight").alias("total_weight"))
        return summary.unionByName(tree, allowMissingColumns=True)
    if algo == "trianglecount":
        from samyama_graph_spark.algorithms import triangle_count

        n = triangle_count(_all_edges(g))
        return g.spark.createDataFrame([(n,)], "triangles long")
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
    # deterministic variable order (the reference iterates store order;
    # we sort by id) — gathered to the driver like the reference's
    # Vec<f64>, Arrow-batched, with an explicit size guard.  Memoized
    # per graph instance: a solver portfolio (several algorithms over
    # the same problem) gathers once — the only mutation this graph
    # object ever sees in place is our own write-back, which changes
    # neither the id set nor the cost columns unless prop is a cost
    # (that case invalidates below); engine WRITES copy the graph, so
    # a stale cache cannot survive a data change.
    memo = getattr(g, "_or_gather_memo", None)
    if memo is None:
        memo = {}
        object.__setattr__(g, "_or_gather_memo", memo)
    # each entry holds the node DataFrame reference itself at
    # gather time (compared with `is` — a bare id() integer could
    # falsely validate after CPython recycles a freed frame's
    # address): any frame replacement this code didn't make itself
    # (direct g.nodes[label] assignment outside the engine write
    # path) misses the cache instead of serving stale ids/cost
    # vectors; our own write-back below re-stamps the identity
    # because it provably preserves the id set and cost columns
    key = (label, tuple(cost_props))
    entry = memo.get(key)
    if entry is not None and entry[0] is g.nodes[label]:
        _, ids, cost_mat = entry
    else:
        sel = [F.col("id").cast("long").alias("id")] + [
            F.coalesce(F.col(c).cast("double"), F.lit(1.0)).alias(f"c{i}")
            for i, c in enumerate(cost_props)
        ]
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
        memo[key] = (g.nodes[label], ids, cost_mat)
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
    tbl = g.nodes[label]
    if prop in tbl.columns:
        tbl = tbl.drop(prop)
    if len(ids) <= 65536:
        # small-dim write-back as a literal-map projection: no join, no
        # extra job, and repeated or.solve calls on one label (solver
        # portfolios) add one thin Project each instead of stacking a
        # join per call onto the shared node table.  The whole map is
        # ONE F.expr SQL string: PySpark's F.lit(list) expands to a
        # per-element lit() chain — 2*len(ids) py4j round trips that
        # profiled as the DOMINANT cost of a 12-solver portfolio
        # (~650 socket round-trips per call, r11) — while a single
        # expression string is one round trip; repr() doubles with the
        # D suffix round-trip bit-exactly through the SQL parser (the
        # corpus.py VALUES idiom).  Non-finite solver values need the
        # CAST spelling: repr(inf) is 'inf' and 'infD' / 'nanD' do not
        # parse as double literals; an empty id set short-circuits (an
        # untyped `array()` would fail map_from_arrays).
        def _dlit(v: float) -> str:
            if math.isfinite(v):
                return f"{v!r}D"
            if math.isnan(v):
                return "CAST('NaN' AS DOUBLE)"
            sign = "-" if v < 0 else ""
            return f"CAST('{sign}Infinity' AS DOUBLE)"

        if len(ids) == 0:
            g.nodes[label] = tbl.withColumn(
                prop, F.lit(None).cast("double")
            )
        else:
            ids_sql = ",".join(f"{int(i)}L" for i in ids.tolist())
            vals_sql = ",".join(_dlit(float(v)) for v in best.tolist())
            m = F.expr(
                f"map_from_arrays(array({ids_sql}), array({vals_sql}))"
            )
            g.nodes[label] = tbl.withColumn(prop, m[F.col("id")])
    else:
        import pandas as pd

        sol = spark.createDataFrame(
            pd.DataFrame(
                {"id": ids.astype("int64"), "__orv": best.astype("float64")}
            )
        )
        g.nodes[label] = tbl.join(sol, "id", "left").withColumnRenamed(
            "__orv", prop
        )
    # in-place frame swap on a live graph: bump the mutation epoch so
    # engine-level compiled-plan caches keyed on graph identity see a
    # changed graph (graph object identity alone cannot)
    object.__setattr__(
        g, "_mutation_epoch", getattr(g, "_mutation_epoch", 0) + 1
    )
    # the write-back changed `prop`: any gather that read it as a cost
    # column is now stale; other gathers of this label stay valid
    # (ids/costs untouched) — re-stamp them onto the new frame so a
    # solver portfolio still gathers exactly once
    for k in list(memo):
        if k[0] != label:
            continue
        if prop in k[1]:
            del memo[k]
        else:
            memo[k] = (g.nodes[label], memo[k][1], memo[k][2])

    # summary record as a PURE-JVM literal projection: createDataFrame
    # pickles through a Python RDD and costs a py4j round trip per call
    # (~0.2s), which dominates a solver-portfolio loop
    # single-partition literal row: a bare range(1) inherits
    # defaultParallelism partitions, so a 12-member solver
    # portfolio's summary union scheduled ~400 empty tasks
    # (measured seconds of pure task dispatch, r11)
    one = spark.range(0, 1, 1, 1)
    if isinstance(res, ParetoResult):
        return one.select(
            F.array(
                *[F.lit(float(x)) for x in res.front_fitness[0]]
            ).alias("fitness"),
            F.lit(algorithm).alias("algorithm"),
            F.lit(int(len(res.front_variables))).alias("front_size"),
        )
    return one.select(
        F.lit(float(res.best_fitness)).alias("fitness"),
        F.lit(algorithm).alias("algorithm"),
        F.lit(iters).cast("long").alias("iterations"),
        F.array(*[F.lit(float(h)) for h in res.history]).alias("history"),
    )
