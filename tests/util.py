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
    types = [str(t).upper() for t in out.types]
    rows = out.fetchall()
    con.close()
    return cols, rows, types


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


# Integer families whose stringified values agree between engines.  DuckDB
# HUGEINT (the default result of sum(BIGINT)) and DECIMAL are deliberately
# NOT here: the driver's value-hash normalizer renders them as floats
# ("123.0") while Spark emits plain ints ("123"), which is exactly the class
# of bug that slipped past the round-3 gate (doc_split_sample,
# sequence_packing).  Oracle SQL must CAST such sums to BIGINT.
_DUCK_INT = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
_SPARK_INT = {"tinyint", "smallint", "int", "bigint"}
_DUCK_FLOAT = {"FLOAT", "DOUBLE", "REAL"}
_SPARK_FLOAT = {"float", "double"}


def assert_dtype_parity(spark_df, d_cols, d_types):
    """Replays the driver gate's stringify-hash sensitivity: a Spark
    integer column must pair with a plain DuckDB integer (not HUGEINT /
    DECIMAL) and a Spark float column with a DuckDB float, else the two
    sides stringify differently even when every value is equal."""
    s_types = dict(spark_df.dtypes)
    for col, dtype in zip(d_cols, d_types):
        st = s_types.get(col)
        if st is None:
            continue  # column mismatch reported separately
        if st in _SPARK_INT and dtype not in _DUCK_INT:
            raise AssertionError(
                f"oracle dtype mismatch on {col!r}: spark={st} duckdb={dtype}"
                f" — wrap the oracle expression in CAST(... AS BIGINT)"
            )
        if st in _SPARK_FLOAT and dtype in _DUCK_INT | {"HUGEINT"}:
            raise AssertionError(
                f"oracle dtype mismatch on {col!r}: spark={st} duckdb={dtype}"
                f" — cast the oracle expression to DOUBLE"
            )


def assert_matches_oracle(spark_df, sql: str, sf_dir: str):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows, d_types = duckdb_oracle(sql, sf_dir)
    assert_dtype_parity(spark_df, d_cols, d_types)
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
