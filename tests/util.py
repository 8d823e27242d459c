"""Spark-vs-DuckDB comparison mirroring the driver's correctness gate:
sort columns by name, sort rows, compare values (floats approximately)."""

from __future__ import annotations

import math

import duckdb


def duckdb_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    out = con.sql(sql)
    cols = list(out.columns)
    rows = out.fetchall()
    con.close()
    return cols, rows


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def assert_matches_oracle(spark_df, sql: str, sf_dir: str):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = duckdb_oracle(sql, sf_dir)
    ns_cols, ns_rows = normalize(s_cols, s_rows)
    nd_cols, nd_rows = normalize(d_cols, d_rows)
    assert ns_cols == nd_cols, f"columns differ: spark={ns_cols} duckdb={nd_cols}"
    assert len(ns_rows) == len(nd_rows), (
        f"row counts differ: spark={len(ns_rows)} duckdb={len(nd_rows)}"
    )
    for i, (a, b) in enumerate(zip(ns_rows, nd_rows)):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9), (
                    f"row {i}: {a} != {b}"
                )
            else:
                assert str(x) == str(y), f"row {i}: {a} != {b} ({x!r} != {y!r})"
