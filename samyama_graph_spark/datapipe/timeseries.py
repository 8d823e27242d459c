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
