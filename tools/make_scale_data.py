#!/usr/bin/env python3
"""Synthesize an ~Nx replica of an sf testdata directory for scale-slope
measurement (BENCH_SCALE.json): each fact table is replicated with
disjoint shifted keys so joins fan out over N copies of the original
graph, dims (region/nation) stay shared, and document text is
deterministically word-shuffled per replica so near-dup volume scales
~linearly instead of exploding quadratically across replicas.

Usage: python tools/make_scale_data.py [N] [SRC] [DST]
Defaults: N=10, SRC=/root/testdata/sf0.1, DST=/tmp/testdata-sf1-synth.

Key stride is 10M per replica — far under the 1B per-label global-id
bases (loaders.ID_BASE), so shifted keys never cross label ranges.
"""

from __future__ import annotations

import os
import random
import sys

import duckdb

STRIDE = 10_000_000


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/testdata-sf1-synth"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def t(name: str) -> str:
        return f"'{src}/{name}.parquet'"

    def write(name: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)"
        )
        rows = con.execute(
            f"SELECT count(*) FROM '{dst}/{name}.parquet'"
        ).fetchone()[0]
        print(f"  {name}: {rows} rows")

    # dims: shared across replicas (same nations/regions — replication
    # grows the fact side of every join, like a bigger SF would)
    for d in ("region", "nation"):
        write(d, f"SELECT * FROM {t(d)}")

    reps = f"(SELECT unnest(range({n})) AS r)"

    write("customer", f"""
        SELECT c_custkey + r * {STRIDE} AS c_custkey,
               c_name || '_r' || r AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM {t('customer')} CROSS JOIN {reps}
    """)
    write("supplier", f"""
        SELECT s_suppkey + r * {STRIDE} AS s_suppkey,
               s_name || '_r' || r AS s_name, s_nationkey, s_acctbal
        FROM {t('supplier')} CROSS JOIN {reps}
    """)
    write("part", f"""
        SELECT p_partkey + r * {STRIDE} AS p_partkey,
               p_name || '_r' || r AS p_name,
               p_brand, p_type, p_size, p_retailprice
        FROM {t('part')} CROSS JOIN {reps}
    """)
    write("orders", f"""
        SELECT o_orderkey + r * {STRIDE} AS o_orderkey,
               o_custkey + r * {STRIDE} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {t('orders')} CROSS JOIN {reps}
    """)
    write("lineitem", f"""
        SELECT l_orderkey + r * {STRIDE} AS l_orderkey,
               l_partkey + r * {STRIDE} AS l_partkey,
               l_suppkey + r * {STRIDE} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {t('lineitem')} CROSS JOIN {reps}
    """)
    write("events", f"""
        SELECT event_id + r * {STRIDE} AS event_id, ts,
               user_id + r * {STRIDE} AS user_id, event_type, value, props
        FROM {t('events')} CROSS JOIN {reps}
    """)
    # embeddings: per-replica ORTHOGONAL ROTATION (replica 0 =
    # identity).  A rotation preserves every intra-replica cosine
    # exactly (the original near-dup structure replicates) while
    # cross-replica pairs decorrelate to cos ~ N(0, 1/dim) — without
    # it, every vector has N-1 exact copies and near-dup pair volume
    # grows quadratically in N instead of linearly with data.
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    etbl = pq.read_table(f"{src}/embeddings.parquet")
    evids = etbl.column("vec_id").to_pylist()
    evecs = np.array(etbl.column("embedding").to_pylist(), dtype=np.float64)
    elabels = etbl.column("label").to_pylist()
    dim = evecs.shape[1]
    out_v, out_e, out_l = [], [], []
    for r in range(n):
        if r == 0:
            rot = evecs
        else:
            q, _ = np.linalg.qr(
                np.random.default_rng(1000 + r).normal(size=(dim, dim))
            )
            rot = evecs @ q
        out_v.extend(v + r * STRIDE for v in evids)
        out_e.extend(row.astype(np.float32).tolist() for row in rot)
        out_l.extend(elabels)
    pq.write_table(
        pa.table(
            {"vec_id": out_v, "embedding": out_e, "label": out_l},
            schema=etbl.schema,
        ),
        f"{dst}/embeddings.parquet",
    )
    print(f"  embeddings: {len(out_v)} rows (rotated per replica)")

    # documents: python-side deterministic word shuffle per replica
    # (replica 0 = original) so cross-replica pairs are NOT near-dups
    # and MinHash/SimHash candidate volume scales ~linearly with N
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{src}/documents.parquet")
    cols = {c: tbl.column(c).to_pylist() for c in tbl.column_names}
    out = {c: [] for c in tbl.column_names}
    for r in range(n):
        rng = random.Random(r)
        for i in range(len(cols["doc_id"])):
            out["doc_id"].append(cols["doc_id"][i] + r * STRIDE)
            text = cols["text"][i]
            if r > 0:
                words = text.split(" ")
                rng.shuffle(words)
                text = " ".join(words)
            out["text"].append(text)
            out["lang"].append(cols["lang"][i])
            out["source"].append(cols["source"][i])
            out["n_chars"].append(len(text))
    pq.write_table(
        pa.table(out, schema=tbl.schema), f"{dst}/documents.parquet"
    )
    print(f"  documents: {len(out['doc_id'])} rows")
    print(f"wrote {dst} (x{n} of {src})")


if __name__ == "__main__":
    main()
