"""Deterministic sampling / dataset-split operators for training-data
pipelines.

All selection decisions are pure column expressions over a
cross-engine-reproducible hash (``common.hash60`` — md5-prefix, also
computable in DuckDB), so

- the sample is STABLE: re-running over the same ids re-selects the
  same rows regardless of partitioning, executor count, or row order
  (unlike ``df.sample``, whose output depends on the partition split);
- there is NO shuffle: every operator here is a projection + filter on
  the scan, so a 100 TB sample is a single map-only pass with the
  filter applied before any downstream exchange;
- the driver's DuckDB oracle replays the identical arithmetic.

New scope beyond the reference (the reference has no sampling surface);
part of the LLM-data-pipeline layer like dedup/similarity/text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from samyama_graph_spark.datapipe.common import hash60, hash60_sql

# Buckets for rate arithmetic: rates are expressed in 1/10000ths so
# float rates never hit engine-specific rounding at the boundary.
BUCKETS = 10_000


def hash_bucket(id_col: Column, seed: int = 0) -> Column:
    """Uniform bucket in [0, BUCKETS) from a row id: hash60(seed|id) %
    BUCKETS.  hash60 is non-negative, so ``%`` agrees across engines."""
    return hash60(F.concat(F.lit(str(seed)), F.lit("|"), id_col.cast("string"))) % BUCKETS


def hash_bucket_sql(id_expr: str, seed: int = 0) -> str:
    """DuckDB twin of :func:`hash_bucket` (keep in lockstep!)."""
    inner = "'{}' || '|' || CAST({} AS VARCHAR)".format(seed, id_expr)
    return f"({hash60_sql(inner)} % {BUCKETS})"


def assign_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 0,
) -> DataFrame:
    """Add a ``split`` column ('train'/'val'/'test'/...) by hash range.

    Weights are normalized; each row lands in exactly one split, and
    membership depends only on (id, seed) — adding or removing OTHER
    rows never moves a row between splits (critical for incremental
    100 TB ingestion: yesterday's train doc cannot silently become
    today's test doc).  Splits are assigned in sorted-name order so the
    boundaries are deterministic.
    """
    total = sum(weights.values())
    bucket = hash_bucket(F.col(id_col), seed)
    expr: Column | None = None
    acc = 0.0
    for name in sorted(weights):
        acc += weights[name] / total
        hi = int(round(acc * BUCKETS))
        cond = bucket < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    assert expr is not None
    return df.withColumn("split", expr)


def split_case_sql(id_expr: str, weights: dict[str, float], seed: int = 0) -> str:
    """DuckDB CASE expression matching :func:`assign_split`."""
    total = sum(weights.values())
    b = hash_bucket_sql(id_expr, seed)
    acc = 0.0
    arms = []
    for name in sorted(weights):
        acc += weights[name] / total
        hi = int(round(acc * BUCKETS))
        arms.append(f"WHEN {b} < {hi} THEN '{name}'")
    return "CASE " + " ".join(arms) + " END"


def stratified_sample(
    df: DataFrame,
    id_col: str,
    rates: dict[str, float] | float,
    strata_col: str | None = None,
    seed: int = 1,
) -> DataFrame:
    """Keep each row with probability ``rates`` (uniform float) or
    ``rates[stratum]`` (per-stratum dict over ``strata_col``).

    Per-stratum rates let a pipeline up-sample rare languages / domains
    and down-sample dominant ones in one map-only pass.  Strata absent
    from the dict are dropped (rate 0) — explicit beats surprising.
    """
    bucket = hash_bucket(F.col(id_col), seed)
    if isinstance(rates, dict):
        if strata_col is None:
            raise ValueError("strata_col is required with per-stratum rates")
        thr: Column = F.lit(0)
        for stratum in sorted(rates):
            thr = F.when(
                F.col(strata_col) == stratum,
                F.lit(int(round(rates[stratum] * BUCKETS))),
            ).otherwise(thr)
        return df.filter(bucket < thr)
    return df.filter(bucket < F.lit(int(round(rates * BUCKETS))))


def sample_exact_k(
    df: DataFrame,
    id_col: str,
    k: int,
    strata_col: str | None = None,
    seed: int = 2,
) -> DataFrame:
    """Exactly-k uniform sample (per stratum if given): the k smallest
    hash values win.  One shuffle on the stratum key; with no stratum
    it is a global top-k (rank via a single-partition window is avoided
    by letting Catalyst turn the global sort+limit into
    TakeOrderedAndProject when strata_col is None).

    Determinism at scale: the sort key is the FULL 60-bit hash with the
    id as final tie-break — a truncated key (e.g. two 10^4 buckets)
    collides routinely on large corpora, and ties broken by partition
    order would make the selected k rows change between runs.
    """
    h = hash60(
        F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string"))
    )
    if strata_col is None:
        return (
            df.withColumn("__h", h)
            .orderBy("__h", F.asc(id_col))
            .limit(k)
            .drop("__h")
        )
    from pyspark.sql.window import Window

    w = Window.partitionBy(strata_col).orderBy("__h", F.asc(id_col))
    return (
        df.withColumn("__h", h)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__h", "__rn")
    )
