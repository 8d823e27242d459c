"""LDBC FinBench golden-query shapes, executed end-to-end.

The reference benches 12 FinBench Complex Reads over an account/
transfer graph (benches/finbench_benchmark.rs:42-170; schema
docs/ldbc/FINBENCH.md, FIXTURES.md F3).  This module runs the same
shapes through the Cypher engine on a transfer graph derived
deterministically from the driver's events table:

    Account        -> user_id and props.k ids (one id space)
    TRANSFER       -> purchase events, user_id -> k, amount = value,
                      plus eid/day edge properties
    TRANSFER_AGG   -> the (src, dst) aggregated view (total, n) used
                      by cycle/chain analytics where raw multi-edge
                      multiplicity would explode the pattern join
    Account.is_blocked -> id % 7 = 0 (deterministic analog of the
                      fixture's isBlocked flag)

Each entry has a DuckDB oracle replaying the same derivation
(json props extraction included) on the raw parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from samyama_graph_spark.cypher.engine import CypherEngine
from samyama_graph_spark.graph import EdgeMeta, PropertyGraph
from samyama_graph_spark.loaders import BASE, load_tables
from samyama_graph_spark.workloads import query

_AB = 9 * BASE  # Account id base (module-local; not a tpch label)

# shared oracle CTEs: raw transfers + the aggregated simple-edge view
TRANSFER_CTES = f"""
transfer AS (
    SELECT user_id + {_AB} AS src,
           CAST(props->>'k' AS BIGINT) + {_AB} AS dst,
           value AS amount, event_id AS eid,
           substring(CAST(ts AS VARCHAR), 1, 10) AS day
    FROM events WHERE event_type = 'purchase'
),
transfer_agg AS (
    SELECT src, dst, round(sum(amount), 2) AS total,
           count(*) AS n
    FROM transfer GROUP BY src, dst
)
"""

# weakly keyed on the live session (loaders.py:85 convention):
# id(spark) can be recycled by a new session after the old one is
# collected, which would hand out frames bound to a dead context
import weakref

_GRAPHS: "weakref.WeakKeyDictionary[SparkSession, dict[str, PropertyGraph]]" = (
    weakref.WeakKeyDictionary()
)
_ENGINES: "weakref.WeakKeyDictionary[SparkSession, dict[str, CypherEngine]]" = (
    weakref.WeakKeyDictionary()
)


def finbench_graph(spark: SparkSession, sf_dir: str) -> PropertyGraph:
    per = _GRAPHS.setdefault(spark, {})
    if sf_dir not in per:
        ev = load_tables(spark, sf_dir, ["events"])["events"]
        tr = ev.filter(F.col("event_type") == "purchase").select(
            (F.col("user_id") + F.lit(_AB)).cast("long").alias("src"),
            (
                F.get_json_object("props", "$.k").cast("long") + F.lit(_AB)
            ).alias("dst"),
            F.col("value").alias("amount"),
            F.col("event_id").alias("eid"),
            F.substring(F.col("ts").cast("string"), 1, 10).alias("day"),
        )
        agg = tr.groupBy("src", "dst").agg(
            F.round(F.sum("amount"), 2).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        accts = (
            tr.select(F.col("src").alias("id"))
            .unionByName(tr.select(F.col("dst").alias("id")))
            .distinct()
            .select(
                "id",
                ((F.col("id") - _AB) % 7 == 0).alias("is_blocked"),
            )
        )
        per[sf_dir] = PropertyGraph(
            spark,
            {"Account": accts},
            {"TRANSFER": tr, "TRANSFER_AGG": agg},
            {
                "TRANSFER": EdgeMeta("Account", "Account"),
                "TRANSFER_AGG": EdgeMeta("Account", "Account"),
            },
        )
    return per[sf_dir]


def _engine(spark: SparkSession, sf_dir: str) -> CypherEngine:
    per = _ENGINES.setdefault(spark, {})
    if sf_dir not in per:
        per[sf_dir] = CypherEngine(finbench_graph(spark, sf_dir))
    return per[sf_dir]


@query(
    "finbench_cr1_transfer_in",
    f"""
    WITH {TRANSFER_CTES}
    SELECT dst AS account,
           count(*) AS n_in, round(sum(amount), 2) AS total_in
    FROM transfer WHERE dst = {_AB + 7}
    GROUP BY dst
    """,
)
def finbench_cr1_transfer_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FinBench CR-1 (finbench_benchmark.rs:60-63): incoming-transfer
    count and sum for one anchored account — reverse expand + implicit
    aggregate over edge properties."""
    return _engine(spark, sf_dir).query(
        """
        MATCH (src:Account)-[t:TRANSFER]->(a:Account)
        WHERE id(a) = $acct
        RETURN id(a) AS account, count(*) AS n_in,
               round(sum(t.amount), 2) AS total_in
        """,
        {"acct": _AB + 7},
    )


@query(
    "finbench_cr2_blocked_transfers",
    f"""
    WITH {TRANSFER_CTES}
    SELECT src, dst, amount, eid
    FROM transfer
    WHERE (dst - {_AB}) % 7 = 0
      AND day >= '2024-01-05' AND day < '2024-01-20'
    ORDER BY amount DESC, eid
    LIMIT 20
    """,
)
def finbench_cr2_blocked_transfers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FinBench CR-2 (finbench_benchmark.rs:70-76): transfers into
    blocked accounts inside a time range, biggest first — node-property
    filter on the expansion target plus an edge-time predicate."""
    return _engine(spark, sf_dir).query(
        """
        MATCH (src:Account)-[t:TRANSFER]->(dst:Account)
        WHERE dst.is_blocked
          AND t.day >= '2024-01-05' AND t.day < '2024-01-20'
        RETURN id(src) AS src, id(dst) AS dst, t.amount AS amount,
               t.eid AS eid
        ORDER BY amount DESC, eid
        LIMIT 20
        """
    )


@query(
    "finbench_cr4_cycle",
    f"""
    WITH {TRANSFER_CTES}
    SELECT t1.src AS a, t1.dst AS b, t2.dst AS c,
           t1.total AS ab, t2.total AS bc, t3.total AS ca
    FROM transfer_agg t1
    JOIN transfer_agg t2 ON t2.src = t1.dst
    JOIN transfer_agg t3 ON t3.src = t2.dst AND t3.dst = t1.src
    WHERE t1.src < t1.dst AND t1.src < t2.dst
      AND t1.dst <> t2.dst
    ORDER BY a, b, c
    LIMIT 20
    """,
)
def finbench_cr4_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FinBench CR-4 Transfer Cycle Detection
    (finbench_benchmark.rs:93-98): directed 3-cycles a->b->c->a over
    the AGGREGATED transfer view (raw multi-edges would multiply each
    cycle by the product of its edge multiplicities), min-id-anchored
    so each cycle reports once.  This is the cyclic pattern the
    compiler's work-based path ordering exists for: the closing edge
    compiles to an expand-into."""
    return _engine(spark, sf_dir).query(
        """
        MATCH (a:Account)-[t1:TRANSFER_AGG]->(b:Account)
              -[t2:TRANSFER_AGG]->(c:Account)-[t3:TRANSFER_AGG]->(a)
        WHERE id(a) < id(b) AND id(a) < id(c) AND id(b) <> id(c)
        RETURN id(a) AS a, id(b) AS b, id(c) AS c,
               t1.total AS ab, t2.total AS bc, t3.total AS ca
        ORDER BY a, b, c
        LIMIT 20
        """
    )


@query(
    "finbench_cr7_chain",
    f"""
    WITH {TRANSFER_CTES}
    SELECT t1.src AS upstream, t1.dst AS mid,
           t1.total AS upstream_total, t2.total AS mid_total
    FROM transfer_agg t2
    JOIN transfer_agg t1 ON t1.dst = t2.src
    WHERE t2.dst = {_AB + 7}
    ORDER BY mid_total DESC, upstream, mid
    LIMIT 20
    """,
)
def finbench_cr7_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FinBench CR-7 Transfer Chain Analysis
    (finbench_benchmark.rs:132-137): two-hop upstream chain into an
    anchored account with per-hop totals, largest last-hop first."""
    return _engine(spark, sf_dir).query(
        """
        MATCH (up:Account)-[t1:TRANSFER_AGG]->(mid:Account)
              -[t2:TRANSFER_AGG]->(a:Account)
        WHERE id(a) = $acct
        RETURN id(up) AS upstream, id(mid) AS mid,
               t1.total AS upstream_total, t2.total AS mid_total
        ORDER BY mid_total DESC, upstream, mid
        LIMIT 20
        """,
        {"acct": _AB + 7},
    )
