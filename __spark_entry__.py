"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from samyama_graph_spark.workloads import REGISTRY

    return REGISTRY["flagship_top_customers"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2 —
    the curated 50-entry gate window (the driver checks exactly the
    first 50 keys; DataFrame-API/Cypher duplicate pairs are merged and
    the removed twins stay pytest-verified in the full REGISTRY)."""
    from samyama_graph_spark.workloads import gate_queries

    return gate_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (same column aliases)."""
    from samyama_graph_spark.workloads import gate_oracles

    return gate_oracles()
