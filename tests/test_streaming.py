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


def test_watermark_append_finalization_contract(spark, tmp_path):
    """The append-mode watermark CONTRACT (Structured Streaming
    guarantees a lower bound, not eager dropping: data older than the
    horizon is ELIGIBLE to be dropped, data within it never is):

    - a window is emitted only once FINALIZED (window end <= final
      watermark) — no unfinalized window ever reaches the sink;
    - each finalized window is emitted exactly once;
    - in-horizon rows are never lost.

    Three parquet files force three micro-batches (maxFilesPerTrigger
    = 1) with the watermark advancing between them.  Verified on this
    Spark version: the beyond-horizon late row is retained and merged
    (state not yet evicted) — which the contract permits — so the test
    pins the guarantees, not the discretionary drop."""
    import datetime as dt
    import glob
    import os
    import shutil
    import time

    from samyama_graph_spark.streaming.windows import (
        events_stream,
        hourly_windows,
        run_stream_to_memory,
    )

    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    cols = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    files = [
        [(1, t(0, 10), 1, "click", 1.0, "{}")],
        [(2, t(5, 10), 1, "click", 1.0, "{}")],  # advances watermark
        [
            (3, t(4, 20), 1, "click", 1.0, "{}"),  # in-horizon late
            (4, t(0, 20), 1, "click", 1.0, "{}"),  # beyond horizon
            (5, t(5, 30), 1, "click", 1.0, "{}"),
        ],
    ]
    src = str(tmp_path / "late_events")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, cols).coalesce(1).write.parquet(
            f"{src}/f{i}"
        )
        part = glob.glob(f"{src}/f{i}/part-*.parquet")[0]
        shutil.copy(part, f"{src}/b{i}.parquet")
        os.utime(
            f"{src}/b{i}.parquet",
            (time.time() + i * 10, time.time() + i * 10),
        )
        shutil.rmtree(f"{src}/f{i}")

    got = run_stream_to_memory(
        hourly_windows(events_stream(spark, src)), "wm_contract", "append"
    ).collect()
    emitted = [(r["window_start"].hour, r["n"]) for r in got]
    hours = [h for h, _ in emitted]
    # exactly-once per window
    assert len(hours) == len(set(hours))
    # final watermark = 05:30 - 2h = 03:30: ONLY the hour-0 window is
    # finalized; hour-4/hour-5 must NOT appear (unfinalized)
    assert set(hours) == {0}
    # in-horizon data never lost: event 1 (00:10, on time) is in it;
    # the beyond-horizon row may or may not have merged (permitted)
    n0 = dict(emitted)[0]
    assert n0 in (1, 2)


def test_fused_window_sinks_multibatch_parity(spark, tmp_path):
    """run_windowed_sinks_fused must reproduce batch sessionization and
    bucket aggregation EXACTLY across micro-batch splits: three parquet
    files force three batches (maxFilesPerTrigger=1) whose timestamps
    interleave, so session fragments from different batches overlap,
    abut exactly at the gap (same-session per the oracle's <= rule),
    and nest — the cases the interval merge must get right."""
    import datetime as dt
    import glob
    import os
    import shutil
    import time

    from samyama_graph_spark.streaming.windows import (
        events_stream,
        run_windowed_sinks_fused,
        session_windows,
        tumbling_base,
    )

    t = lambda h, m=0, s=0: dt.datetime(2024, 1, 1, h, m, s)  # noqa: E731
    cols = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    files = [
        # user 1: fragment [0:10]; user 2: one lone event
        [
            (1, t(0, 10), 1, "click", 1.0, "{}"),
            (2, t(0, 14), 1, "click", 2.0, "{}"),
            (3, t(3, 0), 2, "view", 1.5, "{}"),
        ],
        # user 1: event at 0:24 — exactly gap (10m) after 0:14: SAME
        # session per the oracle's <= rule; plus a far-away session
        [
            (4, t(0, 24), 1, "click", 1.0, "{}"),
            (5, t(6, 0), 1, "view", 1.0, "{}"),
        ],
        # user 1: event at 0:12 NESTS inside the merged fragment span;
        # user 2: event within gap of 3:00 extends that session
        [
            (6, t(0, 12), 1, "view", 4.0, "{}"),
            (7, t(3, 9), 2, "click", 1.0, "{}"),
            (8, t(23, 59), 3, "click", 1.0, "{}"),
        ],
    ]
    src = str(tmp_path / "fused_events")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, cols).coalesce(1).write.parquet(
            f"{src}/f{i}"
        )
        part = glob.glob(f"{src}/f{i}/part-*.parquet")[0]
        shutil.copy(part, f"{src}/b{i}.parquet")
        os.utime(
            f"{src}/b{i}.parquet",
            (time.time() + i * 10, time.time() + i * 10),
        )
        shutil.rmtree(f"{src}/f{i}")

    base, sess = run_windowed_sinks_fused(events_stream(spark, src))
    all_rows = spark.createDataFrame(
        [r for f in files for r in f], cols
    )
    exp_base = tumbling_base(all_rows)
    exp_sess = session_windows(all_rows)
    gb = {tuple(r) for r in base.collect()}
    eb = {tuple(r) for r in exp_base.collect()}
    gs = {tuple(r) for r in sess.collect()}
    es = {tuple(r) for r in exp_sess.collect()}
    assert gb == eb and len(gb) > 0
    assert gs == es and len(gs) > 0
    # the cross-batch merge actually exercised: user 1's first three
    # events (two batches apart, one exactly-at-gap, one nested) are
    # ONE session of 4 events
    assert max(
        r["n_events"] for r in sess.collect() if r["user_id"] == 1
    ) == 4
