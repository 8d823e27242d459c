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
