"""Streaming operators: stream results must equal their batch twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from samyama_graph_spark.loaders import load_tables
from samyama_graph_spark.streaming.windows import (
    events_stream,
    hourly_windows,
    run_stream_to_memory,
    session_windows,
    stateful_running_totals,
)


def _batch_events(spark, sf_dir):
    return load_tables(spark, sf_dir, ["events"])["events"]


def test_hourly_stream_equals_batch(spark, sf_dir):
    stream = events_stream(spark, f"{sf_dir}/events.parquet")
    got = run_stream_to_memory(
        hourly_windows(stream), "hourly_test", "complete"
    )
    expected = hourly_windows(_batch_events(spark, sf_dir))
    g = {tuple(r) for r in got.collect()}
    e = {tuple(r) for r in expected.collect()}
    assert g == e and len(g) > 0


def test_session_windows_batch(spark, sf_dir):
    out = session_windows(_batch_events(spark, sf_dir)).collect()
    assert len(out) > 0
    for r in out:
        assert r["session_start"] <= r["session_end"]
        assert r["n_events"] >= 1


def test_stateful_running_totals(spark, sf_dir):
    stream = events_stream(spark, f"{sf_dir}/events.parquet")
    got = run_stream_to_memory(
        stateful_running_totals(stream), "totals_test", "update"
    )
    # final state per user == batch aggregate
    batch = (
        _batch_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        got.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    )
    g = {(r["user_id"], r["n_events"], r["total_value"]) for r in final.collect()}
    e = {(r["user_id"], r["n_events"], r["total_value"]) for r in batch.collect()}
    assert g == e


def test_stream_dedup_matches_batch(spark, sf_dir):
    from samyama_graph_spark.loaders import load_tables
    from samyama_graph_spark.streaming.windows import (
        events_stream,
        run_stream_to_memory,
        stream_dedup,
    )

    stream = events_stream(spark, f"{sf_dir}/events.parquet")
    got = run_stream_to_memory(
        stream_dedup(stream, ["user_id", "event_type"], watermark="90 days"),
        "t_dedup_stream",
        "append",
    )
    stream_keys = sorted(
        (r["user_id"], r["event_type"])
        for r in got.select("user_id", "event_type").collect()
    )
    batch = load_tables(spark, sf_dir, ["events"])["events"]
    batch_keys = sorted(
        (r["user_id"], r["event_type"])
        for r in batch.select("user_id", "event_type").distinct().collect()
    )
    assert stream_keys == batch_keys and len(stream_keys) > 0
