"""DDL / introspection: CREATE/DROP/SHOW INDEX, constraints, SHOW
metadata (reference: DDL operators operator.rs:5248-5785)."""

from __future__ import annotations

import pytest

from samyama_graph_spark.cypher import CypherEngine
from samyama_graph_spark.graph import PropertyGraph


@pytest.fixture()
def engine(spark):
    persons = spark.createDataFrame(
        [(1, "Alice", 30), (2, "Bob", 25), (3, "Bob", 40)],
        "id long, name string, age long",
    )
    knows = spark.createDataFrame([(1, 2, 2020)], "src long, dst long, since long")
    return CypherEngine(PropertyGraph(spark, {"Person": persons}, {"KNOWS": knows}))


def test_index_roundtrip(engine):
    r = engine.query("CREATE INDEX ON :Person(age)").collect()
    assert r[0]["status"] == "CREATED"
    engine.query("CREATE VECTOR INDEX ON :Person(embedding)")
    idx = engine.query("SHOW INDEXES").collect()
    kinds = {r["name"]: r["kind"] for r in idx}
    assert kinds == {"idx_person_age": "range", "idx_person_embedding": "vector"}
    engine.query("DROP INDEX idx_person_age")
    assert len(engine.query("SHOW INDEXES").collect()) == 1


def test_constraint_and_validation(engine):
    engine.query("CREATE CONSTRAINT ON :Person(name)")
    rows = engine.query("SHOW CONSTRAINTS").collect()
    assert rows[0]["kind"] == "unique"
    violations = engine.catalog.validate_constraint(engine.graph, "c_person_name")
    got = violations.collect()
    assert len(got) == 1 and got[0]["name"] == "Bob" and got[0]["n"] == 2


def test_show_metadata(engine):
    assert [r[0] for r in engine.query("SHOW LABELS").collect()] == ["Person"]
    assert [r[0] for r in engine.query("SHOW RELATIONSHIP TYPES").collect()] == [
        "KNOWS"
    ]
    keys = [r[0] for r in engine.query("SHOW PROPERTY KEYS").collect()]
    assert "age" in keys and "since" in keys


def test_explain_and_profile(engine):
    plan = engine.query(
        "EXPLAIN MATCH (p:Person)-[:KNOWS]->(q:Person) WHERE p.age > 28 "
        "RETURN p.name AS name"
    ).collect()
    text = "\n".join(r["plan"] for r in plan)
    assert "Scan" in text  # physical plan rendered
    # planner diagnostics: candidate anchors + costs (reference
    # planner.rs:73 EXPLAIN candidate reporting)
    assert "Planner Candidates" in text and "anchor" in text
    prof = engine.query(
        "PROFILE MATCH (p:Person) RETURN count(*) AS n"
    ).collect()[0]
    assert prof["rows"] == 1 and prof["elapsed_ms"] > 0


def test_analyze_prewarms_planner_stats(spark):
    """ANALYZE reports per-label counts and per-edge-type degree stats
    and memoizes them (no recount on re-access)."""
    from pyspark.sql import functions as F

    from samyama_graph_spark.cypher.engine import CypherEngine
    from samyama_graph_spark.graph import PropertyGraph

    n = spark.range(0, 30)
    e = spark.range(0, 90).select(
        (F.col("id") % 30).alias("src"), ((F.col("id") * 7) % 30).alias("dst")
    )
    eng = CypherEngine(PropertyGraph(spark, {"N": n}, {"T": e}))
    rows = {r["entity"]: r for r in eng.query("ANALYZE").collect()}
    assert rows[":N"]["count_or_out_deg"] == 30.0
    assert rows["[:T]"]["kind"] == "edge_type"
    assert rows["[:T]"]["count_or_out_deg"] > 0
    # the typeless aggregates the compiler's untyped-hop costing uses
    # are pre-warmed too
    assert rows["(any)"]["count_or_out_deg"] == 30.0
    assert "\x00ALL" in eng.graph.__dict__["_deg_cache"]
    # memoized: the cache keys are present (value equality alone would
    # pass even if memoization silently broke and recounted)
    assert eng.graph.__dict__["_count_cache"]["N"] == 30
    assert eng.graph.edge_degree_est("T", "out") == rows["[:T]"][
        "count_or_out_deg"
    ]
    # ANALYZE is a REFRESH: a stale carried-over cache is recomputed
    eng.graph.__dict__["_count_cache"]["N"] = 1
    rows2 = {r["entity"]: r for r in eng.query("ANALYZE").collect()}
    assert rows2[":N"]["count_or_out_deg"] == 30.0
