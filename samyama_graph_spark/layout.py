"""Physical layout: bucketed tables for shuffle-free expansion joins.

The reference keeps adjacency in sorted CSR segments so a traversal
never re-sorts (store.rs:294-340).  The Spark equivalent at rest is a
BUCKETED table: ``edges`` bucketed (and sorted) by ``src`` joins a
``nodes`` table bucketed by ``id`` with NO Exchange on either side —
at 100 TB that deletes the dominant cost of every expansion join.  A
second copy bucketed by ``dst`` serves reverse traversal, exactly like
the reference's in/out adjacency pair (store.rs out_edges/in_edges).

Bucketed writes go through ``saveAsTable`` (bucket metadata lives in
the session catalog; plain parquet files cannot carry it).
``assert_no_shuffle_join`` is the test hook proving the property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a parquet table bucketed (+sorted) by
    ``bucket_col``.  ``num_buckets`` should match the cluster's target
    parallelism at the table's size (buckets are the join parallelism
    unit; too few starves executors, too many makes small files)."""
    w = df.write.mode("overwrite").format("parquet")
    if path is not None:
        w = w.option("path", path)
    w = w.bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def bucketed_edge_tables(
    spark: SparkSession,
    edges: DataFrame,
    name: str,
    num_buckets: int = 32,
    base_path: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Write the out-adjacency (bucketed by src) and in-adjacency
    (bucketed by dst) copies of an edge set; returns both as
    DataFrames.  Mirrors the reference's dual adjacency lists."""
    ps = f"{base_path}/{name}_by_src" if base_path else None
    pd = f"{base_path}/{name}_by_dst" if base_path else None
    write_bucketed(edges, f"{name}_by_src", "src", num_buckets, path=ps)
    write_bucketed(edges, f"{name}_by_dst", "dst", num_buckets, path=pd)
    return spark.table(f"{name}_by_src"), spark.table(f"{name}_by_dst")


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan
    (BroadcastExchange is not a shuffle and is not counted)."""
    plan = physical_plan(df)
    return sum(
        1
        for ln in plan.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln
    )


def graph_with_dual_adjacency(
    graph,
    num_buckets: int = 32,
    base_path: str | None = None,
    prefix: str = "g",
):
    """Rewrite every edge type of a PropertyGraph into paired bucketed
    tables (by-src AND by-dst) and return a graph whose forward scans
    read the by-src copy and whose ``edges_rev`` carries the by-dst
    copy — the production wiring for the planner's reverse-adjacency
    pick (compiler._edge_source routes ``<-[:T]-`` hops through it).

    The Spark analogue of the reference's paired out/in CSR adjacency
    (store.rs:504-536): expansion joins in EITHER direction are then
    exchange-free on the edge side.  One-time layout cost: two bucketed
    writes per edge type; node tables are untouched (bucket them with
    ``write_bucketed(nodes, ..., "id")`` for fully exchange-free
    expansion, tests/test_layout.py).
    """
    import re

    from samyama_graph_spark.graph import PropertyGraph

    spark = graph.spark
    # sanitize edge-type names into catalog identifiers and refuse
    # silent collisions ('Follows' vs 'FOLLOWS' would otherwise
    # overwrite each other's tables)
    names: dict = {}
    for t in graph.edges:
        nm = re.sub(r"[^a-z0-9_]", "_", t.lower())
        if nm in names:
            raise ValueError(
                f"edge types {names[nm]!r} and {t!r} collide on table "
                f"name {prefix}_{nm}; rename one or use distinct prefixes"
            )
        names[nm] = t
    edges: dict = {}
    edges_rev: dict = {}
    for nm, t in names.items():
        by_src, by_dst = bucketed_edge_tables(
            spark, graph.edges[t], f"{prefix}_{nm}", num_buckets, base_path
        )
        edges[t] = by_src
        edges_rev[t] = by_dst
    out = PropertyGraph(
        spark,
        dict(graph.nodes),
        edges,
        dict(graph.edge_meta),
        edges_rev,
    )
    return out._carry_stats_from(graph)
