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


def mixture_rates(
    df: DataFrame, group_col: str, shares: dict[str, float]
) -> DataFrame:
    """Per-group acceptance thresholds (in BUCKETS-ths) realizing a
    target mixture by downsampling only.

    Training-data mixing: given target shares per domain/source (the
    static-mixture reweighting of Pile/DoReMi-style pipelines), the
    largest corpus achievable WITHOUT upsampling has total
    ``T = min_g(n_g / share_g)``; group g then keeps ``share_g * T``
    rows, i.e. acceptance rate ``share_g * T / n_g`` (exactly 1 for the
    binding group).  Everything is DataFrame algebra — one tiny
    aggregate over group counts, no driver collect — and thresholds are
    FLOOR-ed bucket integers so the DuckDB oracle replays the identical
    arithmetic (floor is unambiguous across engines; round is not).
    Groups absent from ``shares`` are dropped (explicit beats
    surprising, like stratified_sample).
    """
    total_share = sum(shares.values())
    norm = {g: s / total_share for g, s in shares.items()}
    share_map = F.create_map(
        *[x for g in sorted(norm) for x in (F.lit(g), F.lit(norm[g]))]
    )
    counts = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__share", F.element_at(share_map, F.col(group_col)))
        .filter(F.col("__share").isNotNull())
    )
    feasible = counts.agg(
        F.min(F.col("__n") / F.col("__share")).alias("__total")
    )
    return counts.crossJoin(feasible).select(
        group_col,
        F.floor(
            ((F.col("__share") * F.col("__total")) / F.col("__n"))
            * F.lit(BUCKETS)
        ).alias("__thr"),
    )


def resample_mixture(
    df: DataFrame,
    id_col: str,
    group_col: str,
    shares: dict[str, float],
    seed: int = 3,
) -> DataFrame:
    """Resample to a target group mixture: broadcast the per-group
    thresholds from :func:`mixture_rates` onto the corpus and keep a
    row iff its stable hash bucket clears its group's threshold — a
    map-only pass over 100 TB once the (tiny) rates frame is built, and
    fully deterministic: membership depends only on (id, seed, group
    counts), never on partitioning."""
    rates = mixture_rates(df, group_col, shares)
    return df.join(F.broadcast(rates), group_col).filter(
        hash_bucket(F.col(id_col), seed) < F.col("__thr")
    ).drop("__thr")


def neighbor_sample(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    k: int,
    seed: int = 4,
) -> DataFrame:
    """Deterministic ≤k out-neighbor sample per source vertex — the
    GraphSAGE/GNN-minibatch fan-out primitive.

    The k winners per source are the smallest seeded edge hashes
    (destination as final tie-break), so the sample is stable under
    repartitioning and incremental ingestion, and the DuckDB oracle
    replays it with QUALIFY row_number() over the same hash.  One
    shuffle on the source key; layered calls (sample the sampled
    frontier) give bounded multi-hop blocks whose size is
    seeds * prod(k_i) regardless of hub degrees — the skew-proof way to
    cut GNN training minibatches out of a 100 TB edge set.
    """
    from pyspark.sql.window import Window

    h = hash60(
        F.concat(
            F.lit(f"{seed}|"),
            F.col(src_col).cast("string"),
            F.lit("|"),
            F.col(dst_col).cast("string"),
        )
    )
    w = Window.partitionBy(src_col).orderBy("__h", F.asc(dst_col))
    return (
        edges.withColumn("__h", h)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__h", "__rn")
    )


def neighbor_sample_sql(
    src_expr: str, dst_expr: str, k: int, seed: int = 4
) -> str:
    """DuckDB QUALIFY clause matching :func:`neighbor_sample` (keep in
    lockstep!): append to a SELECT over the same edge set."""
    h = hash60_sql(
        f"'{seed}' || '|' || CAST({src_expr} AS VARCHAR) || '|' || "
        f"CAST({dst_expr} AS VARCHAR)"
    )
    return (
        f"QUALIFY row_number() OVER (PARTITION BY {src_expr} "
        f"ORDER BY {h}, {dst_expr}) <= {k}"
    )


def source_quota(
    df: DataFrame,
    id_col: str,
    source_col: str,
    quota: int,
    order_col: str | None = None,
    descending: bool = True,
) -> DataFrame:
    """Per-source document quota — the domain-balancing stage of a web
    pipeline (cap every domain/source at ``quota`` docs so a handful
    of boilerplate-heavy hosts cannot dominate the mixture; C4 and
    RefinedWeb both apply a form of this).

    Keeps the ``quota`` best rows per source: ranked by ``order_col``
    (descending by default — "best first"), ties and the no-order_col
    case broken by ascending id, so survivor selection is fully
    deterministic and oracle-replayable.  Adds the 1-based ``rank``.

    Scale shape: ONE shuffle on the source key and a per-key
    row_number — no global sort.  Per-key work is a heap-free running
    count after the partition-local sort; a pathologically hot key
    (one domain = half the corpus) serializes on one task, in which
    case pre-filter that key or raise spark.sql.shuffle.partitions —
    the quota output itself is bounded at quota rows per key either
    way.
    """
    from pyspark.sql import Window

    order = []
    if order_col is not None:
        c = F.col(order_col)
        order.append(c.desc() if descending else c.asc())
    order.append(F.col(id_col).asc())
    w = Window.partitionBy(source_col).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= quota)
    )
