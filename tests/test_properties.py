"""Property-based tests (hypothesis) — a layer the reference lacks
entirely (SURVEY.md §5 "property-based / fuzz: absent").  Each example
ships a LIST of generated values through one UNWIND query so a
hypothesis run costs one Spark job per example, not per value.

Oracles are Python models of the REFERENCE semantics:
string functions (operator.rs eval_function +841-901), list slice
(eval_list_slice operator.rs:289-314: negative indexes resolve from
the end, clamp to [0, len], empty when start >= end), integer
division (arithmetic_div :2619, truncation toward zero).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from samyama_graph_spark.cypher import CypherEngine
from samyama_graph_spark.graph import PropertyGraph

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texts = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=30
)


@pytest.fixture(scope="module")
def eng(spark):
    return CypherEngine(PropertyGraph(spark, {}, {}, {}))


def run_unwind(eng, ret_sql: str, xs: list) -> list[tuple]:
    df = eng.query(f"UNWIND $xs AS x RETURN {ret_sql}", {"xs": xs})
    return [tuple(r) for r in df.collect()]


@settings(**SETTINGS)
@given(st.lists(texts, min_size=1, max_size=20))
def test_string_functions_match_python(eng, xs):
    got = run_unwind(
        eng,
        "toUpper(x) AS u, toLower(x) AS l, trim(x) AS t, reverse(x) AS r, "
        "left(x, 3) AS lf, right(x, 3) AS rt, size(x) AS n",
        xs,
    )
    for x, (u, l, t, r, lf, rt, n) in zip(xs, got):
        assert u == x.upper() and l == x.lower() and t == x.strip()
        assert r == x[::-1] and lf == x[:3] and rt == (x[-3:] if x else "")
        assert n == len(x)


@settings(**SETTINGS)
@given(
    st.lists(st.integers(-100, 100), min_size=1, max_size=15),
    st.integers(-8, 8),
    st.integers(-8, 8),
)
def test_list_slice_matches_reference(eng, arr, a, b):
    def resolve(i, n):
        return max(n + i, 0) if i < 0 else min(i, n)

    n = len(arr)
    s, e = resolve(a, n), resolve(b, n)
    expect = [] if s >= e else arr[s:e]
    got = run_unwind(eng, f"x[{a}..{b}] AS s", [arr])
    assert list(got[0][0]) == expect


@settings(**SETTINGS)
@given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=20),
       st.integers(-50, 50).filter(lambda d: d != 0))
def test_integer_division_truncates(eng, xs, d):
    got = run_unwind(eng, f"x / {d} AS q, x % {d} AS m", xs)
    for x, (q, m) in zip(xs, got):
        assert q == int(x / d)  # truncation toward zero, like Rust i64
        assert m == x - int(x / d) * d


@settings(**SETTINGS)
@given(st.lists(st.one_of(st.none(), st.booleans()), min_size=1, max_size=9),
       st.lists(st.one_of(st.none(), st.booleans()), min_size=1, max_size=9))
def test_three_valued_logic(eng, ls, rs):
    # Kleene AND/OR/NOT truth tables over null/true/false
    pairs = [(a, b) for a in ls for b in rs]
    xs = [[a, b] for a, b in pairs]
    got = run_unwind(
        eng, "(x[0] AND x[1]) AS a, (x[0] OR x[1]) AS o, (NOT x[0]) AS n", xs
    )
    def k_and(a, b):
        if a is False or b is False:
            return False
        if a is None or b is None:
            return None
        return True

    def k_or(a, b):
        if a is True or b is True:
            return True
        if a is None or b is None:
            return None
        return False

    for (a, b), (ga, go, gn) in zip(pairs, got):
        assert ga == k_and(a, b) and go == k_or(a, b)
        assert gn == (None if a is None else (not a))


# ---------------------------------------------------------------------------
# Mixed-type ORDER BY total order (reference property.rs:109-142):
# Null < Boolean < Integer < Float < String < DateTime < Array, strict
# type rank (an Integer sorts before a Float regardless of magnitude),
# NaN orderable after +inf (total_cmp, property.rs:42-48).
# ---------------------------------------------------------------------------


def test_mixed_type_total_order(spark):
    from pyspark.sql import functions as F

    from samyama_graph_spark.operators.ordering import order_mixed, variant

    rows = [
        # (tag, b, i, f, s, t, arr) -- expected ascending order below
        ("null", None, None, None, None, None, None),
        ("false", False, None, None, None, None, None),
        ("true", True, None, None, None, None, None),
        ("int_-5", None, -5, None, None, None, None),
        ("int_999", None, 999, None, None, None, None),
        ("float_-2.5", None, None, -2.5, None, None, None),
        ("float_0.5", None, None, 0.5, None, None, None),
        ("float_inf", None, None, float("inf"), None, None, None),
        ("float_nan", None, None, float("nan"), None, None, None),
        ("str_apple", None, None, None, "apple", None, None),
        ("str_zed", None, None, None, "zed", None, None),
        ("dt_2020", None, None, None, None, "2020-01-01 00:00:00", None),
        ("dt_2024", None, None, None, None, "2024-06-01 00:00:00", None),
        ("arr_a", None, None, None, None, None, ["a"]),
        ("arr_b", None, None, None, None, None, ["b", "a"]),
    ]
    import random

    shuffled = rows[:]
    random.Random(7).shuffle(shuffled)
    df = spark.createDataFrame(
        shuffled,
        "tag string, b boolean, i long, f double, s string, "
        "ts string, arr array<string>",
    ).select(
        "tag",
        variant(
            b=F.col("b"), i=F.col("i"), f=F.col("f"), s=F.col("s"),
            t=F.to_timestamp("ts"), arr=F.col("arr"),
        ).alias("v"),
    )
    got = [r["tag"] for r in order_mixed(df, "v").select("tag").collect()]
    assert got == [r[0] for r in rows], got
    # 999 (Integer) sorts BEFORE -2.5 (Float): strict type rank,
    # no numeric interleaving -- the reference's documented choice
    assert got.index("int_999") < got.index("float_-2.5")
