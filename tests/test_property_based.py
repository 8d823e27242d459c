"""Property-based tests (hypothesis) for pure-Python kernels — the
reference has no property tests (SURVEY §5 'absent'); these exceed its
test strategy where randomized inputs are cheap (no Spark session)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from samyama_graph_spark.datapipe.multimodal import png_decode, png_encode


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    data=st.data(),
)
def test_png_codec_round_trip(w, h, data):
    """encode -> decode is the identity on any RGB8 image."""
    rgb = data.draw(
        st.lists(
            st.tuples(*[st.integers(0, 255)] * 3),
            min_size=w * h,
            max_size=w * h,
        )
    )
    blob = png_encode(w, h, rgb)
    w2, h2, ch, px = png_decode(blob)
    assert (w2, h2, ch) == (w, h, 3)
    flat = [v for p in rgb for v in p]
    assert list(px) == flat


@settings(max_examples=60, deadline=None)
@given(st.text(min_size=1, max_size=40))
def test_parser_handles_arbitrary_string_literals(s):
    """Any text round-trips through a quoted Cypher string literal
    (lexer escaping must never crash or mis-parse)."""
    from samyama_graph_spark.cypher import ast as A
    from samyama_graph_spark.cypher.parser import parse

    lit = s.replace("\\", "\\\\").replace("'", "\\'")
    q = parse(f"RETURN '{lit}' AS v")
    item = q.parts[0].ret.items[0]
    assert isinstance(item.expr, A.Literal)
    assert item.expr.value == s


@settings(max_examples=80, deadline=None)
@given(
    st.one_of(
        st.integers(min_value=-(2**53), max_value=2**53),
        st.floats(
            allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
        ),
    )
)
def test_parser_numeric_literal_round_trip(x):
    """Any numeric literal (negatives, decimals) survives parsing with
    its exact value and Python type (int stays int, float stays float —
    the Integer/Float distinction the reference's type system keeps,
    property.rs:82-99)."""
    from samyama_graph_spark.cypher import ast as A
    from samyama_graph_spark.cypher.parser import parse

    text = repr(x)
    q = parse(f"RETURN {text} AS v")
    e = q.parts[0].ret.items[0].expr
    # leading '-' may parse as unary minus over a literal
    if isinstance(e, A.UnaryOp):
        assert e.op in ("-", "NEG")
        val = -e.operand.value
    else:
        val = e.value
    assert val == x and isinstance(val, type(x))


@settings(max_examples=30, deadline=None)
@given(
    dim=st.integers(min_value=1, max_value=16),
    planes=st.integers(min_value=1, max_value=8),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_hyperplanes_deterministic_and_bounded(dim, planes, seed):
    """LSH hyperplane generation is deterministic per seed (plans must
    be reproducible across sessions/engines) with components in
    [-1, 1]."""
    from samyama_graph_spark.datapipe.similarity import _hyperplanes

    a = _hyperplanes(dim, planes, seed)
    b = _hyperplanes(dim, planes, seed)
    assert a == b
    assert len(a) == planes and all(len(row) == dim for row in a)
    assert all(-1.0 <= v <= 1.0 for row in a for v in row)


# ---------------------------------------------------------------------------
# Expression-compiler semantics vs an independent Python evaluator.
# One engine query per hypothesis example would cost a Spark job each;
# instead every example draws a LIST of cases and runs them through one
# UNWIND $cases query — one job per example, shrinking still works.
# ---------------------------------------------------------------------------


import pytest


@pytest.fixture(scope="module")
def xengine(spark):
    from samyama_graph_spark.cypher.engine import CypherEngine
    from samyama_graph_spark.graph import PropertyGraph

    return CypherEngine(PropertyGraph(spark, {}, {}))


_ASCII = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    max_size=24,
)


@settings(max_examples=12, deadline=None)
@given(cases=st.lists(_ASCII, min_size=1, max_size=24))
def test_prop_string_functions_parity(xengine, cases):
    """toUpper/toLower/reverse/trim/size match Python on arbitrary
    printable-ASCII strings (reference eval_function semantics,
    operator.rs:841-975)."""
    rows = xengine.query(
        "UNWIND $cases AS s RETURN toUpper(s) AS u, toLower(s) AS l, "
        "reverse(s) AS r, trim(s) AS t, size(s) AS n",
        {"cases": cases},
    ).collect()
    assert len(rows) == len(cases)
    for s, row in zip(cases, rows):
        assert row["u"] == s.upper()
        assert row["l"] == s.lower()
        assert row["r"] == s[::-1]
        assert row["t"] == s.strip(" ")
        assert row["n"] == len(s)


_OPT_INT = st.one_of(st.none(), st.integers(-10**9, 10**9))


@settings(max_examples=12, deadline=None)
@given(
    cases=st.lists(st.tuples(_OPT_INT, _OPT_INT), min_size=1, max_size=24)
)
def test_prop_arithmetic_three_valued_logic(xengine, cases):
    """+ * - and < propagate NULL (SQL/Cypher 3VL, property.rs:24-31);
    non-null arithmetic matches Python exactly at int64 scale."""
    payload = [{"x": x, "y": y} for x, y in cases]
    rows = xengine.query(
        "UNWIND $cases AS c RETURN c.x + c.y AS s, c.x * c.y AS p, "
        "c.x - c.y AS d, c.x < c.y AS lt",
        {"cases": payload},
    ).collect()
    for (x, y), row in zip(cases, rows):
        if x is None or y is None:
            assert row["s"] is None and row["p"] is None
            assert row["d"] is None and row["lt"] is None
        else:
            assert row["s"] == x + y
            assert row["p"] == x * y
            assert row["d"] == x - y
            assert row["lt"] == (x < y)


@settings(max_examples=12, deadline=None)
@given(
    cases=st.lists(
        st.lists(st.integers(-1000, 1000), max_size=16),
        min_size=1,
        max_size=12,
    )
)
def test_prop_list_ops_parity(xengine, cases):
    """reduce/comprehension/head/last/tail/size over arbitrary int
    lists match the Python semantics (reference list functions,
    operator.rs:944-1174; reduce/comprehension ast.rs:287-405)."""
    rows = xengine.query(
        "UNWIND $cases AS l RETURN "
        "reduce(acc = 0, v IN l | acc + v) AS total, "
        "[v IN l WHERE v % 2 = 0] AS evens, "
        "head(l) AS h, last(l) AS t, size(l) AS n",
        {"cases": cases},
    ).collect()
    for l, row in zip(cases, rows):
        assert row["total"] == sum(l)
        assert row["evens"] == [v for v in l if v % 2 == 0]
        assert row["h"] == (l[0] if l else None)
        assert row["t"] == (l[-1] if l else None)
        assert row["n"] == len(l)


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.one_of(
            st.integers(-10**6, 10**6),
            st.floats(allow_nan=False, allow_infinity=True, width=64),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_prop_order_by_numeric_total_order(xengine, vals):
    """ORDER BY over mixed int/float values matches Python's numeric
    sort (reference total_cmp ordering, property.rs:109-142)."""
    rows = xengine.query(
        "UNWIND $vals AS v RETURN v ORDER BY v",
        {"vals": vals},
    ).collect()
    got = [r["v"] for r in rows]
    assert got == sorted(vals, key=float)


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.text(alphabet="abcdefgh", min_size=1, max_size=5),
            st.integers(0, 1000),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_prop_unwind_create_roundtrip(spark, rows):
    """Bulk CREATE from parameter rows lands exactly len(rows) nodes
    with the exact property values (write path, reference
    CreateNodeOperator semantics)."""
    from samyama_graph_spark.cypher.engine import CypherEngine
    from samyama_graph_spark.graph import PropertyGraph

    eng = CypherEngine(PropertyGraph(spark, {}, {}))
    eng.query(
        "UNWIND $rows AS r CREATE (n:D {name: r.name, age: r.age})",
        {"rows": [{"name": n, "age": a} for n, a in rows]},
    )
    got = eng.query(
        "MATCH (n:D) RETURN count(*) AS c, sum(n.age) AS s"
    ).first()
    assert got["c"] == len(rows)
    assert got["s"] == sum(a for _, a in rows)


@settings(max_examples=8, deadline=None)
@given(
    names=st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=4),
        min_size=1,
        max_size=10,
    ),
    data=st.data(),
)
def test_prop_bulk_merge_set_semantics(spark, names, data):
    """Bulk MERGE is set-semantics and idempotent: distinct names in,
    distinct nodes out; re-merging any subset changes nothing."""
    from samyama_graph_spark.cypher.engine import CypherEngine
    from samyama_graph_spark.graph import PropertyGraph

    eng = CypherEngine(PropertyGraph(spark, {}, {}))
    q = "UNWIND $rows AS r MERGE (n:M {name: r.name})"
    eng.query(q, {"rows": [{"name": n} for n in names]})
    count = "MATCH (n:M) RETURN count(*) AS c"
    assert eng.query(count).first()["c"] == len(set(names))
    subset = data.draw(st.lists(st.sampled_from(names), max_size=6))
    if subset:
        eng.query(q, {"rows": [{"name": n} for n in subset]})
    assert eng.query(count).first()["c"] == len(set(names))


@settings(max_examples=8, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)),
        min_size=1,
        max_size=14,
    )
)
def test_prop_sparql_path_closure_parity(spark, edges):
    """?x p+ ?y over an arbitrary (cyclic, self-looping) digraph equals
    the Python transitive closure; ?x p* ?y adds the identity over all
    graph terms (SPARQL 1.1 closure evaluation)."""
    from samyama_graph_spark.rdf import RdfStore

    ex = "http://e/"
    st_ = RdfStore(spark)
    st_.insert_ntriples(
        "\n".join(f"<{ex}n{a}> <{ex}p> <{ex}n{b}> ." for a, b in edges)
    )
    # independent closure: iterate to fixpoint over the pair set
    pairs = set(edges)
    closure = set(pairs)
    while True:
        nxt = closure | {
            (a, d) for a, b in closure for c, d in pairs if b == c
        }
        if nxt == closure:
            break
        closure = nxt
    got_plus = {
        (r["x"], r["y"])
        for r in st_.sparql(
            f"SELECT ?x ?y WHERE {{ ?x <{ex}p>+ ?y . }}"
        ).collect()
    }
    assert got_plus == {(f"{ex}n{a}", f"{ex}n{b}") for a, b in closure}
    terms = {n for e in edges for n in e}
    want_star = {(f"{ex}n{a}", f"{ex}n{b}") for a, b in closure} | {
        (f"{ex}n{t}", f"{ex}n{t}") for t in terms
    }
    got_star = {
        (r["x"], r["y"])
        for r in st_.sparql(
            f"SELECT ?x ?y WHERE {{ ?x <{ex}p>* ?y . }}"
        ).collect()
    }
    assert got_star == want_star


@settings(max_examples=10, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)),
        min_size=1,
        max_size=60,
    )
)
def test_prop_triangle_stats_vs_bruteforce(spark, edges):
    """The vectorized wedge-closing driver kernel must equal a literal
    brute-force triangle count on arbitrary multigraphs (duplicates,
    reversals, self-loops)."""
    from samyama_graph_spark.algorithms.topology import triangle_stats

    pairs = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    verts = sorted({x for e in pairs for x in e})
    nbrs = {v: set() for v in verts}
    for u, v in pairs:
        nbrs[u].add(v)
        nbrs[v].add(u)
    expect = {}
    for v in verts:
        t = 0
        ns = sorted(nbrs[v])
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                if (ns[i], ns[j]) in pairs:
                    t += 1
        expect[v] = (len(nbrs[v]), t)

    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {
        r["id"]: (r["deg"], r["triangles"])
        for r in triangle_stats(df).collect()
    }
    assert got == expect


@settings(max_examples=10, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)),
        min_size=1,
        max_size=40,
    ),
    iters=st.integers(1, 3),
)
def test_prop_cdlp_driver_vs_naive(spark, edges, iters):
    """The lexsort CDLP kernel must equal a literal implementation of
    the smallest-among-most-frequent rule over the in+out neighbor
    multiset (reciprocal edges counted twice)."""
    from collections import Counter

    from samyama_graph_spark.algorithms import cdlp

    verts = sorted({x for e in edges for x in e})
    nbr_multiset = {v: [] for v in verts}
    for u, v in edges:
        nbr_multiset[v].append(u)
        nbr_multiset[u].append(v)
    lab = {v: v for v in verts}
    for _ in range(iters):
        new = {}
        for v in verts:
            if not nbr_multiset[v]:
                new[v] = lab[v]
                continue
            cnt = Counter(lab[u] for u in nbr_multiset[v])
            top = max(cnt.values())
            new[v] = min(l for l, c in cnt.items() if c == top)
        lab = new

    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {
        r["id"]: r["label"] for r in cdlp(df, iterations=iters).collect()
    }
    assert got == lab


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.text(max_size=25),
            st.integers(min_value=-(2**62), max_value=2**62),
            st.floats(allow_nan=False, allow_infinity=False, width=64),
            st.booleans(),
            st.none(),
            st.lists(st.integers(min_value=-100, max_value=100), max_size=4),
        ),
        min_size=1,
        max_size=5,
    )
)
def test_sql_literal_row_roundtrip(spark, values):
    """The write path's one-round-trip literal encoding (_sql_literal /
    _literal_row) must reproduce every driver value exactly — strings
    with quotes/backslashes/newlines, extreme ints, float edge cases,
    booleans, NULLs, int arrays."""
    from samyama_graph_spark.cypher.writes import _literal_row

    cols = {f"c{i}": v for i, v in enumerate(values)}
    row = _literal_row(spark, cols).first()
    for i, v in enumerate(values):
        got = row[f"c{i}"]
        if isinstance(v, float):
            assert got == v or (got != got and v != v)
        elif isinstance(v, list):
            assert list(got or []) == v or (got is None and v == [])
        else:
            assert got == v, (got, v)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "", "boiler"]),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_dedup_lines_idempotent(spark, docs):
    """Corpus-wide line dedup is a FIXPOINT operator: running it on its
    own output changes nothing (every surviving line is, by
    construction, the unique first occurrence)."""
    from samyama_graph_spark.datapipe.dedup import dedup_lines

    df = spark.createDataFrame(
        [(i, "\n".join(lines)) for i, lines in enumerate(docs)],
        "doc_id long, text string",
    )
    once = dedup_lines(df, "text", "doc_id").select("doc_id", "text")
    twice = dedup_lines(once, "text", "doc_id")
    got1 = {r["doc_id"]: r["text"] for r in once.collect()}
    got2 = {r["doc_id"]: (r["text"], r["removed_lines"])
            for r in twice.collect()}
    for k, t in got1.items():
        assert got2[k] == (t, 0), (k, t, got2[k])
