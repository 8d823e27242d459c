"""Hypertable-style time-series rollups: pre-aggregated continuous
aggregates at multiple granularities, with algebraic re-aggregation
from finer to coarser grains.

The TimescaleDB continuous-aggregate pattern re-expressed Spark-first:
a rollup is a plain grouped aggregation on a time bucket (one shuffle,
map-side combined), materialized however the store prefers (parquet
partitioned by bucket date).  A coarser grain never re-reads raw
events — it re-aggregates the finer rollup (counts and sums are
algebraic; avg is carried as sum+count), which is what makes a 100 TB
event history queryable at interactive cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_rollup(
    events: DataFrame,
    ts_col: str,
    grain: str,
    keys: list[str],
    value_col: str,
) -> DataFrame:
    """Pre-aggregated rollup at ``grain`` (e.g. '1 hour', '1 day'):
    ``(*keys, bucket_start, n, total)``.

    ``n``/``total`` are algebraic, so any coarser grain derives from
    this frame via :func:`reaggregate` without touching raw events.
    One shuffle on (keys, bucket); window() handles calendar-safe
    bucketing identically for batch and streaming inputs.
    """
    return (
        events.groupBy(
            *keys, F.window(F.col(ts_col), grain).alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("total"),
        )
        .select(*keys, F.col("w.start").alias("bucket_start"), "n", "total")
    )


def reaggregate(
    rollup: DataFrame, coarser_grain: str, keys: list[str]
) -> DataFrame:
    """Derive a coarser rollup FROM a finer one (hourly -> daily):
    sums of counts and totals re-bucketed on the finer buckets' start
    timestamps.  Exact as long as the coarser grain is a multiple of
    the finer one (every fine bucket nests in one coarse bucket)."""
    return (
        rollup.groupBy(
            *keys, F.window(F.col("bucket_start"), coarser_grain).alias("w")
        )
        .agg(
            F.sum("n").alias("n"),
            F.sum("total").alias("total"),
        )
        .select(*keys, F.col("w.start").alias("bucket_start"), "n", "total")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: list[str],
    tolerance: str | None = None,
    direction: str = "backward",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """As-of join: attach to each left row the temporally NEAREST
    right row per ``by`` key — backward (latest right.ts <= left.ts,
    the market-data/point-in-time-feature semantics) or forward
    (earliest right.ts >= left.ts).

    Spark-first plan: tag the two sides, union them, and carry the
    right payload across the timeline with one
    last_value(ignorenulls)/first_value window per key — ONE shuffle
    on the key, sequential scan within each partition, regardless of
    how many left rows share a right row.  This is the shape that
    survives 100 TB: the naive alternative (range join + max-per-left
    dedup) explodes candidate pairs quadratically inside hot keys.
    Equal timestamps match (right sorts before left at the same ts).
    A single pathologically hot key serializes its window into one
    task — pre-split such keys by a coarse time epoch appended to
    ``by`` (each epoch seeds from the previous one's tail), the
    standard windowed-salting move; not automated here because the
    epoch choice is data-owned.

    ``tolerance`` (an INTERVAL string, e.g. ``'2 hours'``) voids
    matches farther than that from the left timestamp, like the
    reference-adjacent pandas/QuestDB semantics.
    """
    from pyspark.sql import Window

    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    rcols = right_cols or [
        c for c in right.columns if c not in by and c != ts_col
    ]
    # internal scratch names + suffixed outputs must not collide with
    # caller columns — fail loudly instead of silently misbehaving or
    # throwing an ambiguous-column AnalysisException mid-plan
    reserved = {"__ts", "__side", "__r", "__match", "__rts"}
    clash = (set(left.columns) | set(right.columns)) & reserved
    if clash:
        raise ValueError(
            f"asof_join: input columns {sorted(clash)} collide with "
            f"internal names {sorted(reserved)}; rename them first"
        )
    out_suffixed = {f"{c}{suffix}" for c in [ts_col, *rcols]}
    kept = set(by) | {ts_col} | {
        c for c in left.columns if c not in by and c != ts_col
    }
    clash = kept & out_suffixed
    if clash:
        raise ValueError(
            f"asof_join: left columns {sorted(clash)} collide with "
            f"suffixed right outputs (suffix={suffix!r}); pass a "
            f"different suffix or rename them first"
        )
    payload = F.struct(
        F.col(ts_col).alias("__rts"), *[F.col(c) for c in rcols]
    )
    r = right.select(
        *by,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__r"),
    )
    lcols = [c for c in left.columns if c not in by and c != ts_col]
    l = left.select(
        *by,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        *lcols,
    )
    u = r.select(*by, "__ts", "__side", "__r", *[
        F.lit(None).cast(l.schema[c].dataType).alias(c) for c in lcols
    ]).unionByName(l)
    if direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__ts").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.last("__r", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__ts").asc(), F.col("__side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = F.first("__r", ignorenulls=True).over(w)
    out = (
        u.withColumn("__match", carried)
        .filter(F.col("__side") == 1)
        .drop("__side", "__r")
    )
    if tolerance is not None:
        gap = (
            F.col("__ts") - F.col("__match.__rts")
            if direction == "backward"
            else F.col("__match.__rts") - F.col("__ts")
        )
        out = out.withColumn(
            "__match",
            F.when(
                gap <= F.expr(f"INTERVAL {tolerance}"), F.col("__match")
            ),
        )
    return out.select(
        *by,
        F.col("__ts").alias(ts_col),
        *lcols,
        F.col("__match.__rts").alias(f"{ts_col}{suffix}"),
        *[F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in rcols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: list[str],
    start_col: str,
    end_col: str,
    ts_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval-point range join: pair each left interval
    ``[start, end)`` with the right rows whose ``ts`` falls inside it,
    per ``key``.

    Spark-first plan: quantize time into ``bucket_seconds``-sized
    cells, explode each left interval into the cells it covers,
    equi-join on (key, cell), then apply the exact residual predicate.
    Catalyst would otherwise plan the pure-inequality join as a
    broadcast nested loop / cartesian — the classic range-join
    scale-killer.  Each right row lives in exactly ONE cell, so no
    post-join dedup is needed.  Pick the bucket near the typical
    interval length: cells per interval ~= interval/bucket + 1.
    """
    def cell(c: str):
        # timestamp -> fractional epoch seconds -> cell ordinal (via
        # TIMESTAMP: NTZ has no direct double cast; the session runs
        # UTC so the instant is unchanged)
        return F.floor(
            F.col(c).cast("timestamp").cast("double")
            / F.lit(float(bucket_seconds))
        )

    l = left.withColumn(
        "__cell",
        F.explode(F.sequence(cell(start_col), cell(end_col))),
    )
    r = right.withColumn("__cell", cell(ts_col))
    resid = (F.col(ts_col) >= F.col(start_col)) & (
        F.col(ts_col) < F.col(end_col)
    )
    return l.join(r, key + ["__cell"]).filter(resid).drop("__cell")
