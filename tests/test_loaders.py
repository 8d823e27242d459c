"""Source/sink parity: CSV import (reference http/handler.rs:403-533),
snapshot export/restore (src/snapshot/format.rs gzip JSON-lines), and
the nanos-timestamp parquet quirk handled by load_tables."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from samyama_graph_spark.loaders import (
    load_tables,
    read_csv_graph_table,
    read_snapshot,
    write_snapshot,
)


def test_csv_import_header_typing(spark, tmp_path):
    p = str(tmp_path / "people.csv")
    with open(p, "w") as f:
        f.write("id|name|age|score\n1|Alice|30|0.5\n2|Bob|25|1.25\n")
    df = read_csv_graph_table(spark, p, sep="|")
    assert [f.name for f in df.schema.fields] == ["id", "name", "age", "score"]
    kinds = {f.name: f.dataType.typeName() for f in df.schema.fields}
    assert kinds["id"] in ("integer", "long") and kinds["score"] == "double"
    assert df.count() == 2


def test_snapshot_roundtrip(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "Alice", ["Person"]), (2, "Acme", ["Company"])],
        "id long, name string, labels array<string>",
    )
    path = str(tmp_path / "snap")
    write_snapshot(src, path)
    # gzip part files on disk, per the reference's .sgsnap format
    parts = [p for p in os.listdir(path) if p.endswith(".json.gz")]
    assert parts, f"expected gzip json parts, got {os.listdir(path)}"
    back = read_snapshot(spark, path)
    got = sorted(
        (r["id"], r["name"], list(r["labels"])) for r in back.collect()
    )
    assert got == [(1, "Alice", ["Person"]), (2, "Acme", ["Company"])]


def test_load_tables_nanos_timestamps(spark, sf_dir):
    events = load_tables(spark, sf_dir, ["events"])["events"]
    kinds = {f.name: f.dataType.typeName() for f in events.schema.fields}
    assert "timestamp" in str(kinds.get("ts", "")), kinds
    assert events.filter(F.col("ts").isNotNull()).count() > 0
