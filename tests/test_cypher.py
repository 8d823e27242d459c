"""Cypher engine end-to-end tests on the F1 social-micro fixture
(FIXTURES.md; modeled on the reference's tests/advanced_cypher.rs
fixture graph)."""

from __future__ import annotations

import pytest

from samyama_graph_spark.cypher import CypherEngine
from samyama_graph_spark.cypher.parser import parse
from samyama_graph_spark.graph import EdgeMeta, PropertyGraph


@pytest.fixture(scope="module")
def engine(spark):
    persons = spark.createDataFrame(
        [
            (1, "Alice", 30, "NY"),
            (2, "Bob", 25, "SF"),
            (3, "Charlie", 35, "NY"),
            (4, "David", 40, "SF"),
            (5, "Eve", 28, "CHI"),
        ],
        "id long, name string, age long, city string",
    )
    companies = spark.createDataFrame(
        [(10, "Acme", 1990), (11, "Globex", 2000)],
        "id long, name string, founded long",
    )
    knows = spark.createDataFrame(
        [(1, 2, 2020, 0.9), (1, 3, 2019, 0.7), (2, 4, 2021, 0.5), (3, 5, 2018, 0.8)],
        "src long, dst long, since long, strength double",
    )
    works = spark.createDataFrame(
        [(1, 10, "eng", 2015), (2, 10, "mgr", 2018), (3, 11, "eng", 2019)],
        "src long, dst long, position string, since long",
    )
    g = PropertyGraph(
        spark,
        {"Person": persons, "Company": companies},
        {"KNOWS": knows, "WORKS_AT": works},
        {
            "KNOWS": EdgeMeta("Person", "Person"),
            "WORKS_AT": EdgeMeta("Person", "Company"),
        },
    )
    return CypherEngine(g)


def rows(engine, q, params=None):
    return [tuple(r) for r in engine.query(q, params).collect()]


def test_scan_filter_order(engine):
    assert rows(
        engine, "MATCH (n:Person) WHERE n.age > 28 RETURN n.name AS name ORDER BY name"
    ) == [("Alice",), ("Charlie",), ("David",)]


def test_expand_with_edge_props(engine):
    got = rows(
        engine,
        "MATCH (a:Person)-[k:KNOWS]->(b:Person) "
        "RETURN a.name AS a, b.name AS b, k.since AS since ORDER BY a, b",
    )
    assert got == [
        ("Alice", "Bob", 2020),
        ("Alice", "Charlie", 2019),
        ("Bob", "David", 2021),
        ("Charlie", "Eve", 2018),
    ]


def test_reverse_and_undirected(engine):
    assert rows(
        engine,
        "MATCH (a:Person)<-[:KNOWS]-(b:Person) RETURN a.name AS a, b.name AS b ORDER BY a",
    ) == [("Bob", "Alice"), ("Charlie", "Alice"), ("David", "Bob"), ("Eve", "Charlie")]
    got = dict(
        rows(
            engine,
            "MATCH (a:Person)-[:KNOWS]-(b:Person) RETURN a.name AS a, count(*) AS n ORDER BY a",
        )
    )
    assert got == {"Alice": 2, "Bob": 2, "Charlie": 2, "David": 1, "Eve": 1}


def test_optional_match(engine):
    got = rows(
        engine,
        "MATCH (a:Person) OPTIONAL MATCH (a)-[:WORKS_AT]->(c:Company) "
        "RETURN a.name AS name, c.name AS company ORDER BY name",
    )
    assert ("David", None) in got and ("Alice", "Acme") in got


def test_exists_and_not_exists(engine):
    assert rows(
        engine,
        "MATCH (a:Person) WHERE EXISTS { (a)-[:WORKS_AT]->(:Company) } "
        "RETURN a.name AS name ORDER BY name",
    ) == [("Alice",), ("Bob",), ("Charlie",)]
    assert rows(
        engine,
        "MATCH (a:Person) WHERE NOT EXISTS { (a)-[:WORKS_AT]->() } "
        "RETURN a.name AS name ORDER BY name",
    ) == [("David",), ("Eve",)]


def test_var_length(engine):
    got = rows(
        engine,
        "MATCH (a:Person {name: 'Alice'})-[:KNOWS*1..2]->(b) "
        "RETURN b.name AS b ORDER BY b",
    )
    assert got == [("Bob",), ("Charlie",), ("David",), ("Eve",)]


def test_var_length_exact(engine):
    got = rows(
        engine,
        "MATCH (a:Person {name: 'Alice'})-[:KNOWS*2]->(b) RETURN b.name AS b ORDER BY b",
    )
    assert got == [("David",), ("Eve",)]


def test_with_pipeline(engine):
    got = rows(
        engine,
        "MATCH (p:Person) WITH p.city AS city, count(*) AS n WHERE n > 1 "
        "RETURN city, n ORDER BY city",
    )
    assert got == [("NY", 2), ("SF", 2)]


def test_unwind_union_distinct(engine):
    assert rows(engine, "UNWIND [3,1,2] AS x RETURN x ORDER BY x") == [
        (1,), (2,), (3,),
    ]
    got = rows(
        engine,
        "MATCH (p:Person) RETURN p.city AS v UNION MATCH (p:Person) RETURN p.name AS v",
    )
    assert len(got) == 8  # 3 cities + 5 names, distinct


def test_aggregates(engine):
    got = rows(
        engine,
        "MATCH (p:Person) RETURN sum(p.age) AS total, avg(p.age) AS mean, "
        "min(p.age) AS lo, max(p.age) AS hi, count(DISTINCT p.city) AS cities",
    )
    assert got == [(158, 31.6, 25, 40, 3)]


def test_order_by_unprojected(engine):
    assert rows(
        engine, "MATCH (p:Person) RETURN p.name AS name ORDER BY p.age DESC LIMIT 2"
    ) == [("David",), ("Charlie",)]


def test_case_string_ops_params(engine):
    got = rows(
        engine,
        "MATCH (p:Person) WHERE p.age > $a RETURN p.name AS name, "
        "CASE WHEN p.city = 'NY' THEN 'east' ELSE 'other' END AS coast ORDER BY name",
        {"a": 29},
    )
    assert got == [("Alice", "east"), ("Charlie", "east"), ("David", "other")]


def test_graph_meta_functions(engine):
    got = rows(
        engine,
        "MATCH (p:Person {name:'Alice'}) RETURN id(p) AS i, labels(p) AS l",
    )
    assert got == [(1, ["Person"])]
    got = rows(
        engine,
        "MATCH (:Person {name:'Alice'})-[k:KNOWS]->(:Person {name:'Bob'}) "
        "RETURN type(k) AS t, startNode(k) AS s, endNode(k) AS e",
    )
    assert got == [("KNOWS", 1, 2)]


def test_list_ops(engine):
    assert rows(engine, "RETURN [1,2,3][0] AS a, [1,2,3][-1] AS b, [1,2,3,4][1..3] AS c") == [
        (1, 3, [2, 3])
    ]
    assert rows(engine, "RETURN reduce(acc = 0, x IN [1,2,3] | acc + x) AS t") == [(6,)]
    assert rows(
        engine, "RETURN all(x IN [2,4] WHERE x % 2 = 0) AS a, any(x IN [1,3] WHERE x > 2) AS b"
    ) == [(True, True)]
    assert rows(
        engine, "RETURN [x IN range(1,5) WHERE x % 2 = 1 | x * 10] AS odds"
    ) == [([10, 30, 50],)]


def test_call_procedures(engine):
    assert rows(engine, "CALL db.labels") == [("Company",), ("Person",)]
    assert rows(engine, "CALL db.relationshipTypes") == [("KNOWS",), ("WORKS_AT",)]
    pr = rows(
        engine,
        "CALL algo.pageRank({iterations: 5}) YIELD nodeId, score "
        "RETURN nodeId, round(score, 4) AS r ORDER BY r DESC LIMIT 1",
    )
    assert pr[0][0] == 10  # Acme has highest in-degree mass


def test_algo_yield_reference_schemas(engine):
    """Reference YIELD parity (operator.rs:6302-6902): node is the full
    node value, path algos yield (path, cost), mst yields a total_weight
    summary row + (source, target, weight) edge rows."""
    got = rows(
        engine,
        "CALL algo.pageRank('Person', 'KNOWS') YIELD node, score "
        "RETURN node.name AS name ORDER BY score DESC LIMIT 1",
    )
    # sinks 4/5 accumulate the most rank mass; node.name must resolve
    assert got[0][0] in ("David", "Eve")
    comp = rows(
        engine,
        "CALL algo.wcc('Person', 'KNOWS') YIELD node, componentId "
        "RETURN count(DISTINCT componentId) AS c",
    )
    assert comp[0][0] >= 1
    # fixture graph: 1-KNOWS->2 (Alice->Bob), so path 1->2 has cost 1
    pc = rows(
        engine,
        "CALL algo.shortestPath(1, 2) YIELD path, cost RETURN path, cost",
    )
    assert pc == [([1, 2], 1.0)]
    m = rows(
        engine,
        "CALL algo.mst() YIELD source, target, weight, total_weight "
        "RETURN count(*) AS rows, max(total_weight) AS tw",
    )
    assert m[0][0] >= 2 and m[0][1] is not None
    lc = rows(
        engine,
        "CALL algo.lcc('Person', 'KNOWS') YIELD node, coefficient "
        "RETURN count(*) AS n",
    )
    assert lc[0][0] >= 1


def test_algo_yield_node_struct_cross_label(engine):
    """The label-scoped node packing (fast path: one table instead of
    unified_nodes) must expose the SAME struct schema as the unified
    path — properties that live only on another label resolve to NULL
    instead of raising an unresolved-field error."""
    # 'founded' exists only on Company; Person-scoped YIELD resolves NULL
    got = rows(
        engine,
        "CALL algo.pageRank('Person', 'KNOWS') YIELD node, score "
        "RETURN node.name AS name, node.founded AS founded "
        "ORDER BY score DESC LIMIT 1",
    )
    assert got[0][0] in ("David", "Eve") and got[0][1] is None
    # struct schema is identical whether or not the label path fired
    scoped = engine.query(
        "CALL algo.pageRank('Person', 'KNOWS') YIELD node RETURN node"
    ).schema["node"].dataType
    unified = engine.query(
        "CALL algo.pageRank({iterations: 1}) YIELD node RETURN node"
    ).schema["node"].dataType
    assert [(f.name, f.dataType) for f in scoped.fields] == [
        (f.name, f.dataType) for f in unified.fields
    ]


def test_multi_path_join(engine):
    # comma patterns with shared variable
    got = rows(
        engine,
        "MATCH (a:Person)-[:KNOWS]->(b:Person), (a)-[:WORKS_AT]->(c:Company) "
        "RETURN a.name AS a, b.name AS b, c.name AS c ORDER BY a, b",
    )
    assert ("Alice", "Bob", "Acme") in got and ("Charlie", "Eve", "Globex") in got


def test_parse_errors():
    with pytest.raises(Exception):
        parse("MATCH (a:Person RETURN a")
    with pytest.raises(Exception):
        parse("FROB (a) RETURN a")


def test_duration_functions(engine):
    got = rows(
        engine,
        "RETURN duration({days: 2, hours: 3}).days AS d, "
        "duration({days: 2, hours: 3}).seconds AS s, "
        "duration({years: 1, months: 2}).months AS m",
    )
    assert got == [(2, 10800, 14)]
    got = rows(
        engine,
        "RETURN duration.between(datetime('2024-01-01 00:00:00'), "
        "datetime('2024-01-03 06:30:00')) AS d",
    )
    d = got[0][0]
    assert (d["months"], d["days"], d["seconds"], d["nanos"]) == (0, 2, 23400, 0)
    # calendar months with month-end clamping (reference
    # property.rs:92-97): Jan 31 + P1M = Feb 29 (leap), +1 day = Mar 1
    got = rows(
        engine,
        "RETURN duration.between(datetime('2020-01-31 00:00:00'), "
        "datetime('2020-03-01 00:00:00')) AS d",
    )
    d = got[0][0]
    assert (d["months"], d["days"], d["seconds"]) == (1, 1, 0)
    # negative interval: every component carries the interval's sign
    got = rows(
        engine,
        "RETURN duration.between(datetime('2020-03-01 00:00:00'), "
        "datetime('2020-01-31 00:00:00')) AS d",
    )
    d = got[0][0]
    assert (d["months"], d["days"], d["seconds"]) == (-1, -1, 0)


# ----------------------------------------------------- CALL { subquery }
# (reference ast.rs:86-87 parses these but has no execution operator;
# implemented properly here, like UNION)


def test_call_subquery_uncorrelated(engine):
    got = rows(
        engine,
        "CALL { MATCH (c:Company) RETURN count(c) AS n_companies } "
        "MATCH (p:Person) WHERE p.age > 30 "
        "RETURN p.name AS name, n_companies ORDER BY name",
    )
    assert got == [("Charlie", 2), ("David", 2)]


def test_call_subquery_correlated_agg(engine):
    # count(k) must be 0 (not a dropped row) for persons with no KNOWS edge
    got = rows(
        engine,
        "MATCH (p:Person) "
        "CALL { WITH p MATCH (p)-[:KNOWS]->(k) RETURN count(k) AS n } "
        "RETURN p.name AS name, n ORDER BY name",
    )
    assert got == [
        ("Alice", 2),
        ("Bob", 1),
        ("Charlie", 1),
        ("David", 0),
        ("Eve", 0),
    ]


def test_call_subquery_correlated_rows(engine):
    # non-aggregate subquery: inner join semantics, one row per match
    got = rows(
        engine,
        "MATCH (p:Person) "
        "CALL { WITH p MATCH (p)-[:WORKS_AT]->(c) RETURN c.name AS company } "
        "RETURN p.name AS name, company ORDER BY name",
    )
    assert got == [("Alice", "Acme"), ("Bob", "Acme"), ("Charlie", "Globex")]


def test_call_subquery_union_inside(engine):
    got = rows(
        engine,
        "CALL { MATCH (c:Company) RETURN c.name AS name "
        "UNION ALL MATCH (p:Person) WHERE p.city = 'CHI' RETURN p.name AS name } "
        "RETURN name ORDER BY name",
    )
    assert got == [("Acme",), ("Eve",), ("Globex",)]


def test_call_subquery_multistage_correlated(engine):
    # WITH stage between the import and RETURN, aggregate chained after
    got = rows(
        engine,
        "MATCH (p:Person) "
        "CALL { WITH p MATCH (p)-[k:KNOWS]->(q) "
        "  WITH q, k.strength AS s WHERE s >= 0.7 "
        "  RETURN sum(s) AS strong } "
        "RETURN p.name AS name, round(strong, 1) AS strong ORDER BY name",
    )
    assert got == [
        ("Alice", 1.6),
        ("Bob", 0.0),
        ("Charlie", 0.8),
        ("David", 0.0),
        ("Eve", 0.0),
    ]


# ------------------------------------------------- pattern comprehension
# (reference: eval_pattern_comprehension operator.rs:2417)


def test_pattern_comprehension_basic(engine):
    got = rows(
        engine,
        "MATCH (p:Person) "
        "RETURN p.name AS name, [(p)-[:KNOWS]->(q) | q.name] AS friends "
        "ORDER BY name",
    )
    as_sets = [(n, sorted(f)) for n, f in got]
    assert as_sets == [
        ("Alice", ["Bob", "Charlie"]),
        ("Bob", ["David"]),
        ("Charlie", ["Eve"]),
        ("David", []),
        ("Eve", []),
    ]


def test_pattern_comprehension_where_and_size(engine):
    # inside size() and with a WHERE filter on the pattern
    got = rows(
        engine,
        "MATCH (p:Person) "
        "RETURN p.name AS name, "
        "size([(p)-[k:KNOWS]->(q) WHERE k.strength >= 0.7 | q.name]) AS n_strong "
        "ORDER BY name",
    )
    assert got == [
        ("Alice", 2),
        ("Bob", 0),
        ("Charlie", 1),
        ("David", 0),
        ("Eve", 0),
    ]


def test_pattern_comprehension_in_match_where(engine):
    got = rows(
        engine,
        "MATCH (p:Person) "
        "WHERE size([(p)-[:KNOWS]->(q) | q]) >= 1 "
        "RETURN p.name AS name ORDER BY name",
    )
    assert got == [("Alice",), ("Bob",), ("Charlie",)]


def test_pattern_comprehension_with_aggregate(engine):
    # reverse-direction pattern from the bound anchor
    got = rows(
        engine,
        "MATCH (c:Company) "
        "RETURN c.name AS company, size([(c)<-[:WORKS_AT]-(e) | e.name]) AS staff "
        "ORDER BY company",
    )
    assert got == [("Acme", 2), ("Globex", 1)]


# ------------------------- EXISTS{} / COUNT{} in expression positions


def test_count_subquery_in_return(engine):
    got = rows(
        engine,
        "MATCH (p:Person) "
        "RETURN p.name AS name, COUNT { MATCH (p)-[:KNOWS]->(q) } AS n "
        "ORDER BY name",
    )
    assert got == [
        ("Alice", 2),
        ("Bob", 1),
        ("Charlie", 1),
        ("David", 0),
        ("Eve", 0),
    ]


def test_exists_subquery_in_return(engine):
    got = rows(
        engine,
        "MATCH (p:Person) "
        "RETURN p.name AS name, EXISTS { MATCH (p)-[:WORKS_AT]->(c) } AS employed "
        "ORDER BY name",
    )
    assert got == [
        ("Alice", True),
        ("Bob", True),
        ("Charlie", True),
        ("David", False),
        ("Eve", False),
    ]


def test_exists_in_or_disjunct(engine):
    # nested EXISTS inside OR can't semi-join; falls to materialization
    got = rows(
        engine,
        "MATCH (p:Person) "
        "WHERE p.age >= 40 OR EXISTS { MATCH (p)-[:WORKS_AT]->(c) } "
        "RETURN p.name AS name ORDER BY name",
    )
    assert got == [("Alice",), ("Bob",), ("Charlie",), ("David",)]


def test_call_yield_alias(engine):
    got = rows(engine, "CALL db.labels() YIELD label AS l RETURN l ORDER BY l")
    assert got == [("Company",), ("Person",)]


def test_integer_division_parity(engine):
    # reference arithmetic_div: int/int truncates toward zero; any
    # float operand -> double division
    got = rows(
        engine,
        "RETURN 7 / 2 AS a, -7 / 2 AS b, 7.0 / 2 AS c, 7 / 2.0 AS d, "
        "toInteger('9') / 4 AS e",
    )
    assert got == [(3, -3, 3.5, 3.5, 2)]


def test_integer_division_on_properties(engine):
    got = rows(
        engine,
        "MATCH (p:Person {name:'Charlie'}) "
        "RETURN p.age / 2 AS half, p.age / 2.0 AS halff",
    )
    assert got == [(17, 17.5)]


def test_conversion_ornull_variants(engine):
    got = rows(
        engine,
        "RETURN toIntegerOrNull('xyz') AS a, toIntegerOrNull('42') AS b, "
        "toFloatOrNull('bad') AS c, toBooleanOrNull('true') AS d",
    )
    assert got == [(None, 42, None, True)]


def test_value_type(engine):
    got = rows(
        engine,
        "MATCH (p:Person {name:'Alice'}) "
        "RETURN valueType(p) AS n, valueType(p.age) AS i, "
        "valueType(p.name) AS s, valueType(null) AS z, "
        "valueType([1]) AS l, valueType(1.5) AS f",
    )
    assert got == [("NODE", "INTEGER", "STRING", "NULL", "LIST", "FLOAT")]


def test_list_scalar_aggregate_forms(engine):
    # aggregate-named functions over literal lists are scalars
    # (reference stubs these; computed properly here)
    got = rows(
        engine,
        "RETURN percentileCont([1,2,3,4], 0.5) AS pc, "
        "percentileDisc([1,2,3,4], 0.5) AS pd, "
        "round(stDev([1,2,3]), 4) AS sd, stDevP([2,2]) AS sp",
    )
    assert got == [(2.5, 2.0, 1.0, 0.0)]
    # genuine aggregate position still aggregates over rows
    agg = rows(
        engine,
        "MATCH (p:Person) RETURN round(stDev(p.age), 2) AS sd",
    )
    assert agg[0][0] > 0


def test_cross_type_coercions(spark):
    """String<->Boolean equality and DateTime<->Integer comparison
    (reference coerced_eq / compare_lt, operator.rs:2481-2519)."""
    import datetime

    flags = spark.createDataFrame(
        [
            (1, True, datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)),
            (2, False, datetime.datetime(2024, 6, 1, tzinfo=datetime.timezone.utc)),
            (3, None, None),
        ],
        "id long, active boolean, created timestamp",
    )
    g = PropertyGraph(spark, {"Flag": flags}, {}, {})
    eng = CypherEngine(g)
    assert rows(
        eng, "MATCH (f:Flag) WHERE f.active = 'true' RETURN f.id AS id"
    ) == [(1,)]
    assert rows(
        eng, "MATCH (f:Flag) WHERE f.active = 'TRUE' RETURN f.id AS id"
    ) == [(1,)]
    assert rows(
        eng, "MATCH (f:Flag) WHERE 'false' = f.active RETURN f.id AS id"
    ) == [(2,)]
    # garbage strings equal no boolean; nulls propagate (filter drops)
    assert rows(
        eng, "MATCH (f:Flag) WHERE f.active = 'yes' RETURN f.id AS id"
    ) == []
    assert rows(
        eng,
        "MATCH (f:Flag) WHERE f.active <> 'true' RETURN f.id AS id",
    ) == [(2,)]
    # DateTime vs Integer: epoch-millis comparison
    feb = 1706745600000  # 2024-02-01T00:00:00Z
    got = rows(
        eng,
        f"MATCH (f:Flag) WHERE f.created > {feb} RETURN f.id AS id",
    )
    assert got == [(2,)]
    got = rows(
        eng,
        f"MATCH (f:Flag) WHERE {feb} > f.created RETURN f.id AS id",
    )
    assert got == [(1,)]


def test_time_of_day_functions(engine):
    """time()/localtime() millis-since-midnight (reference CY-27/28)."""
    got = rows(
        engine,
        "RETURN time('14:30:05') AS t, time('14:30:05.250') AS tm, "
        "localtime('00:00:01') AS l, time({hour: 2, minute: 5}) AS m",
    )
    assert got == [
        (
            (14 * 3600 + 30 * 60 + 5) * 1000,
            (14 * 3600 + 30 * 60 + 5) * 1000 + 250,
            1000,
            (2 * 3600 + 5 * 60) * 1000,
        )
    ]
    now = rows(engine, "RETURN time() AS t")[0][0]
    assert 0 <= now < 86_400_000


def test_order_by_null_position(spark):
    """Reference total order (property.rs:109-142): Null is the
    SMALLEST value, so ORDER BY ASC puts null-aged rows first and
    DESC puts them last — Spark's default null ordering agrees."""
    from samyama_graph_spark.cypher import CypherEngine
    from samyama_graph_spark.graph import PropertyGraph

    persons = spark.createDataFrame(
        [(1, "a", 30), (2, "b", None), (3, "c", 10)],
        "id long, name string, age long",
    )
    eng = CypherEngine(PropertyGraph(spark, {"Person": persons}, {}))
    asc = [r["n"] for r in eng.query(
        "MATCH (p:Person) RETURN p.name AS n ORDER BY p.age").collect()]
    desc = [r["n"] for r in eng.query(
        "MATCH (p:Person) RETURN p.name AS n ORDER BY p.age DESC").collect()]
    assert asc == ["b", "c", "a"]
    assert desc == ["a", "c", "b"]


def test_temporal_map_construction(spark):
    """date()/datetime() from component maps (reference
    operator.rs:1212-1221, :1242-1260); missing keys default to
    1970-01-01 midnight."""
    from samyama_graph_spark.cypher import CypherEngine
    from samyama_graph_spark.graph import PropertyGraph

    eng = CypherEngine(PropertyGraph(spark, {}, {}))
    r = eng.query(
        "RETURN date({year: 1999, month: 7, day: 4}) AS d, "
        "datetime({year: 2000, month: 1, day: 2, hour: 3, minute: 4, "
        "second: 5}) AS dt, date({year: 1988}) AS dflt"
    ).collect()[0]
    assert str(r["d"]) == "1999-07-04"
    assert str(r["dt"]).startswith("2000-01-02 03:04:05")
    assert str(r["dflt"]) == "1988-01-01"


def test_rebind_applies_late_label_constraint(spark):
    """A variable first bound WITHOUT a label must still honor a label
    carried by a later occurrence (MATCH (x {k: 1}), (x:B)) — the
    constraint becomes a semi-join instead of being dropped.  Matters
    doubly since cost-based path reordering can move the unlabeled
    occurrence first."""
    from samyama_graph_spark.cypher import CypherEngine
    from samyama_graph_spark.graph import PropertyGraph

    a = spark.range(0, 100).selectExpr("id", "id % 10 AS k")
    b = spark.range(100, 150).selectExpr("id", "id % 10 AS k")
    eng = CypherEngine(PropertyGraph(spark, {"A": a, "B": b}, {}))
    n_all = eng.query("MATCH (x {k: 1}) RETURN count(*) AS n").collect()
    assert n_all[0]["n"] == 15  # 10 in A + 5 in B
    n_b = eng.query("MATCH (x {k: 1}), (x:B) RETURN count(*) AS n").collect()
    assert n_b[0]["n"] == 5


def test_anonymous_vars_not_shared_across_sibling_clauses(spark):
    """Regression: the anonymous-variable counter must advance past a
    subclause's allocations.  Before the fix, the second clause's
    anonymous node reused __n_1 (already in scope from the OPTIONAL
    MATCH), compiling an expand-into that silently dropped every row;
    with anonymous edges it raised 'bound twice'."""
    from samyama_graph_spark.cypher import CypherEngine
    from samyama_graph_spark.graph import PropertyGraph

    x = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    r = spark.createDataFrame([(1, 2)], "src long, dst long")
    s = spark.createDataFrame([(1, 3)], "src long, dst long")
    eng = CypherEngine(PropertyGraph(spark, {"X": x}, {"R": r, "S": s}))
    got = eng.query(
        "MATCH (a:X) OPTIONAL MATCH (a)-[r1:R]->() "
        "MATCH (a)-[r2:S]->() RETURN id(a) AS aid"
    ).collect()
    assert [row["aid"] for row in got] == [1]
    got2 = eng.query(
        "MATCH (a:X) OPTIONAL MATCH (a)-[:R]->() "
        "OPTIONAL MATCH (a)-[:S]->() RETURN count(*) AS n"
    ).collect()
    assert got2[0]["n"] == 3


def test_reference_compatibility_gaps_execute(spark):
    """Every 'Remaining Gap' in the reference's own compatibility
    matrix (docs/CYPHER_COMPATIBILITY.md:77-84 — list slicing, pattern
    comprehensions covered elsewhere, named paths, split/rand/log/exp/
    timestamp, collect(DISTINCT)) executes here: the DataFrame
    compilation gets them from Spark's function library for free."""
    from samyama_graph_spark.cypher import CypherEngine
    from samyama_graph_spark.graph import PropertyGraph

    eng = CypherEngine(PropertyGraph(spark, {}, {}))
    eng.query("CREATE (a:P {name: 'x', v: 3})-[:R]->(b:P {name: 'y', v: 4})")
    assert eng.query("RETURN [1,2,3,4,5][1..3] AS s").first()["s"] == [2, 3]
    assert sorted(
        eng.query(
            "MATCH (p:P) RETURN collect(DISTINCT p.v % 2) AS c"
        ).first()["c"]
    ) == [0, 1]
    assert eng.query("RETURN split('a,b,c', ',') AS s").first()["s"] == [
        "a", "b", "c",
    ]
    assert eng.query(
        "RETURN round(log(exp(2.0)), 6) AS v"
    ).first()["v"] == 2.0
    assert eng.query("RETURN timestamp() > 0 AS ok").first()["ok"]
    assert eng.query("RETURN rand() >= 0 AS ok").first()["ok"]
    row = eng.query(
        "MATCH p = (a:P)-[:R]->(b:P) RETURN length(p) AS l, "
        "size(nodes(p)) AS n"
    ).first()
    assert (row["l"], row["n"]) == (1, 2)


def test_plan_cache_hits_and_invalidation(spark):
    """Repeat parameterized reads return the cached compiled plan;
    writes (graph swap), DDL (catalog version), or.solve (effectful),
    and differing params all miss."""
    persons = spark.createDataFrame(
        [(1, "Alice", 30), (2, "Bob", 25)], "id long, name string, age long"
    )
    g = PropertyGraph(spark, {"Person": persons}, {})
    eng = CypherEngine(g)
    q = "MATCH (p:Person) WHERE p.age > $a RETURN p.name AS name ORDER BY name"
    r1 = eng.query(q, {"a": 20})
    assert eng.query(q, {"a": 20}) is r1  # cache hit: identical plan object
    assert eng.query(q, {"a": 28}) is not r1  # params key differs
    assert [r["name"] for r in r1.collect()] == ["Alice", "Bob"]
    # a write swaps the graph -> miss, and the new data is visible
    eng.query("CREATE (n:Person {id: 3, name: 'Zed', age: 50})")
    r2 = eng.query(q, {"a": 20})
    assert r2 is not r1
    assert [r["name"] for r in r2.collect()] == ["Alice", "Bob", "Zed"]
    # DDL bumps the catalog version -> miss
    r3 = eng.query(q, {"a": 20})
    assert r3 is r2
    eng.query("CREATE INDEX ON :Person(age)")
    assert eng.query(q, {"a": 20}) is not r3
    # unhashable params and or.solve are never cached
    assert eng._plan_key("MATCH (n) RETURN n", {"x": {1, 2}}) is None
    assert eng._plan_key(
        "CALL algo.or.solve('Person', {property: 'w', budget: 1.0})", None
    ) is None


def test_plan_cache_param_type_distinction(spark):
    """1, 1.0, and True are equal (and hash-equal) in Python, but a
    plan compiled with an int literal has different comparison/typing
    semantics than the bool or double variants — the cache key must
    carry the type, not just the value."""
    persons = spark.createDataFrame(
        [(1, "Alice")], "id long, name string"
    )
    eng = CypherEngine(PropertyGraph(spark, {"Person": persons}, {}))
    q = "MATCH (p:Person) RETURN $f AS v"
    keys = {eng._plan_key(q, {"f": v}) for v in (1, 1.0, True)}
    assert len(keys) == 3
    r_int = eng.query(q, {"f": 1})
    assert eng.query(q, {"f": True}) is not r_int
    assert eng.query(q, {"f": 1.0}) is not r_int
    assert eng.query(q, {"f": 1}) is r_int
    # each plan keeps its own literal's type (pre-fix, whichever of the
    # three compiled first was served verbatim for the other two)
    assert eng.query(q, {"f": 1}).schema["v"].dataType.simpleString() in (
        "int", "bigint"
    )
    assert eng.query(q, {"f": 1.0}).schema["v"].dataType.simpleString() == "double"
    assert eng.query(q, {"f": True}).schema["v"].dataType.simpleString() == "boolean"
    # nested containers distinguish too
    assert eng._plan_key(q, {"f": [1]}) != eng._plan_key(q, {"f": [True]})


def test_plan_cache_or_solve_writeback_invalidates(spark):
    """or.solve mutates the live graph's node frame in place; the
    mutation epoch must invalidate cached read plans so the written
    property is visible."""
    persons = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        "id long, name string, cost double",
    )
    g = PropertyGraph(spark, {"Item": persons}, {})
    eng = CypherEngine(g)
    q = "MATCH (i:Item) RETURN i.name AS name, i.alloc AS alloc ORDER BY name"
    before = eng.query(q)
    assert all(r["alloc"] is None for r in before.collect())
    eng.query(
        "CALL algo.or.solve({label: 'Item', property: 'alloc', "
        "cost_property: 'cost', budget: 10.0, max_iterations: 5})"
    ).collect()
    after = eng.query(q)
    assert after is not before
    assert all(r["alloc"] is not None for r in after.collect())
