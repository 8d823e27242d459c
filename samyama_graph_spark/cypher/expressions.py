"""AST expression -> pyspark Column compilation.

3-valued logic, CASE, list HOFs (comprehension -> transform/filter,
quantifiers -> forall/exists, reduce -> aggregate), string predicates,
IN, regex — the expression surface of SURVEY.md §2.1/§2.2.  Catalyst
natively implements Cypher's 3VL for comparisons/AND/OR, so the
mapping is direct.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from samyama_graph_spark.cypher import ast as A
from samyama_graph_spark.cypher.functions import (
    AGGREGATES,
    LIST_SCALAR_AGGS,
    SCALARS,
    list_scalar_agg,
)


class CompileError(ValueError):
    pass


@dataclass
class VarInfo:
    kind: str  # "node" | "edge" | "value"
    column: str  # top-level column name in the frame
    label: str | None = None  # node label / edge type when known
    # Spark DataType of the column, refreshed from the live frame's
    # schema (compiler._refresh_dtypes) — lets the static typer use
    # Catalyst's own analysis for int-division / size-on-string parity
    dtype: Any = None


@dataclass
class Scope:
    """Variable bindings visible to expressions."""

    vars: dict[str, VarInfo] = field(default_factory=dict)
    params: dict[str, Any] = field(default_factory=dict)
    # lambda-bound names (list comprehension / reduce) -> Column
    locals: dict[str, Column] = field(default_factory=dict)
    # pre-computed aggregate sub-expressions: id(ast-node) -> Column
    # (two-phase aggregation: aggregates evaluate in groupBy().agg(),
    # outer expressions then reference their result columns)
    agg_subs: dict[int, Column] = field(default_factory=dict)
    # PropertyGraph for static property-type lookups (integer-division
    # parity); None disables schema-based inference
    graph: Any = None

    def child_with_local(self, name: str, col: Column) -> "Scope":
        s = Scope(
            self.vars, self.params, dict(self.locals), self.agg_subs, self.graph
        )
        s.locals[name] = col
        return s


def _is_list_scalar_form(e: A.Expr) -> bool:
    """stDev([1,2,3]) / percentileCont([...], p): aggregate-named
    functions applied to an in-row list are scalars, not aggregates."""
    return (
        isinstance(e, A.FunctionCall)
        and e.name in LIST_SCALAR_AGGS
        and bool(e.args)
        and isinstance(e.args[0], (A.ListLiteral, A.ListComprehension))
    )


def is_aggregate(e: A.Expr) -> bool:
    """Does this expression contain an aggregate call anywhere —
    detection for implicit GROUP BY (reference planner.rs:1057-1096)."""
    if isinstance(e, A.FunctionCall) and e.name in AGGREGATES:
        if not _is_list_scalar_form(e):
            return True
    return any(is_aggregate(c) for c in _children(e))


# Temporal component access, dt.year / dt.month / ... (reference
# datetime values expose calendar fields; operator.rs:1196-1410)
_TEMPORAL_FIELDS = {
    "year": F.year,
    "quarter": F.quarter,
    "month": F.month,
    "week": F.weekofyear,
    "day": F.dayofmonth,
    "ordinalday": F.dayofyear,
    "dayofweek": F.dayofweek,
    "hour": F.hour,
    "minute": F.minute,
    "second": F.second,
    "millisecond": lambda c: (F.unix_millis(c) % 1000).cast("long"),
    "epochmillis": F.unix_millis,
    "epochseconds": F.unix_seconds,
}


def expr_name(e: A.Expr) -> str:
    """Canonical output column name for an unaliased item."""
    if isinstance(e, A.Variable):
        return e.name
    if isinstance(e, A.Property):
        return f"{expr_name(e.subject)}.{e.key}"
    if isinstance(e, A.FunctionCall):
        inner = ", ".join(expr_name(a) for a in e.args) if e.args else "*"
        d = "DISTINCT " if e.distinct else ""
        return f"{e.name}({d}{inner})"
    if isinstance(e, A.Literal):
        return repr(e.value)
    return "expr"


def collect_aggregates(e: A.Expr, out: list[A.FunctionCall]) -> None:
    """Top-most aggregate FunctionCall nodes anywhere in the tree."""
    if isinstance(e, A.FunctionCall):
        if e.name in AGGREGATES and not _is_list_scalar_form(e):
            out.append(e)
            return
        for a in e.args:
            collect_aggregates(a, out)
        return
    for child in _children(e):
        collect_aggregates(child, out)


def _children(e: A.Expr) -> list[A.Expr]:
    if isinstance(e, A.FunctionCall):
        return list(e.args)
    if isinstance(e, A.BinaryOp):
        return [e.left, e.right]
    if isinstance(e, A.UnaryOp):
        return [e.operand]
    if isinstance(e, A.Property):
        return [e.subject]
    if isinstance(e, A.CaseExpr):
        out = [e.subject] if e.subject else []
        for c, v in e.whens:
            out += [c, v]
        if e.default:
            out.append(e.default)
        return out
    if isinstance(e, A.ListIndex):
        return [e.subject, e.index]
    if isinstance(e, A.ListSlice):
        return [x for x in (e.subject, e.start, e.end) if x is not None]
    if isinstance(e, A.ListLiteral):
        return e.items
    if isinstance(e, A.MapLiteral):
        return list(e.entries.values())
    if isinstance(e, A.ListComprehension):
        return [x for x in (e.source, e.where, e.projection) if x is not None]
    if isinstance(e, A.QuantifiedPredicate):
        return [e.source, e.predicate]
    if isinstance(e, A.ReduceExpr):
        return [e.init, e.source, e.body]
    return []


def _param_literal(v) -> Column:
    """Python parameter value -> literal Column, recursively.  Dicts
    become STRUCT literals: heterogeneous and all-NULL values are fine
    (``c.key`` access compiles to getField either way), while a map
    literal needs one common value type and F.lit rejects an all-null
    dict outright.  Lists recurse so lists-of-maps (UNWIND $rows AS r)
    work."""
    if isinstance(v, (list, tuple)):
        return F.array(*[_param_literal(x) for x in v])
    if isinstance(v, dict):
        return F.struct(
            *[_param_literal(x).alias(str(k)) for k, x in v.items()]
        )
    if isinstance(v, bool):  # before int: bool is an int subclass
        return F.lit(v)
    if isinstance(v, int):
        # Cypher integers are 64-bit (reference Integer(i64),
        # property.rs:85); a 32-bit literal overflows under ANSI
        # arithmetic for products that i64 holds fine
        return F.lit(v).cast("long")
    return F.lit(v)


def compile_expr(e: A.Expr, scope: Scope) -> Column:
    if id(e) in scope.agg_subs:
        return scope.agg_subs[id(e)]

    if isinstance(e, A.Literal):
        if isinstance(e.value, list):
            return F.array(*[compile_expr(A.Literal(v), scope) for v in e.value])
        return F.lit(e.value)

    if isinstance(e, A.Parameter):
        if e.name not in scope.params:
            raise CompileError(f"missing parameter ${e.name}")
        return _param_literal(scope.params[e.name])

    if isinstance(e, A.PatternComprehension):
        # materialized by the compiler (join + collect) before expression
        # compilation; reaching here means an unsupported position
        raise CompileError(
            "pattern comprehension is supported in RETURN/WITH items and "
            "MATCH WHERE predicates only"
        )

    if isinstance(e, A.Variable):
        if e.name in scope.locals:
            return scope.locals[e.name]
        info = scope.vars.get(e.name)
        if info is None:
            raise CompileError(f"unknown variable {e.name}")
        return F.col(info.column)

    if isinstance(e, A.Property):
        subj = compile_expr(e.subject, scope)
        if isinstance(e.subject, A.MapLiteral):
            return subj[e.key]
        dt = None
        if isinstance(e.subject, A.Variable):
            info = scope.vars.get(e.subject.name)
            dt = getattr(info, "dtype", None) if info is not None else None
        if isinstance(dt, T.StructType):
            if e.key not in dt.names:
                # schema-free parity (property.rs:8-14): reading a
                # property the entity never carried is NULL, not an
                # analysis error
                return F.lit(None)
        elif isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            fn = _TEMPORAL_FIELDS.get(e.key.lower())
            if fn is None:
                raise CompileError(f"unknown temporal component {e.key}")
            return fn(subj)
        return subj.getField(e.key)

    if isinstance(e, A.BinaryOp):
        return _binary(e, scope)

    if isinstance(e, A.UnaryOp):
        x = compile_expr(e.operand, scope)
        if e.op == "NOT":
            return ~x
        if e.op == "NEG":
            return -x
        if e.op == "IS_NULL":
            return x.isNull()
        if e.op == "IS_NOT_NULL":
            return x.isNotNull()
        raise CompileError(f"unary {e.op}")

    if isinstance(e, A.FunctionCall):
        # size()/length() work on strings too in the reference
        # (operator.rs +944-975); Spark's size is array/map-only, so
        # dispatch on the statically-known argument type
        if (
            e.name in ("size", "length")
            and len(e.args) == 1
            and _is_string(e.args[0], scope)
        ):
            return F.length(compile_expr(e.args[0], scope)).cast("long")
        if e.name == "valuetype" and len(e.args) == 1:
            return _value_type(e.args[0], scope)
        if _is_list_scalar_form(e):
            arr = compile_expr(e.args[0], scope)
            p = (
                compile_expr(e.args[1], scope) if len(e.args) > 1 else None
            )
            return list_scalar_agg(e.name, arr, p)
        return _call(e, scope)

    if isinstance(e, A.CaseExpr):
        out = None
        for cond, val in e.whens:
            c = (
                compile_expr(cond, scope)
                if e.subject is None
                else compile_expr(e.subject, scope) == compile_expr(cond, scope)
            )
            v = compile_expr(val, scope)
            out = F.when(c, v) if out is None else out.when(c, v)
        if out is None:
            raise CompileError("CASE with no WHEN")
        return out.otherwise(compile_expr(e.default, scope)) if e.default else out

    if isinstance(e, A.ListIndex):
        # lists only — the reference's maps are not indexable
        # (property.rs:141-142).  Cypher indexes are 0-based with
        # negatives from the end, and an out-of-bounds index is NULL:
        # get() gives all three (element_at raises on invalid indices).
        subj = compile_expr(e.subject, scope)
        idx = compile_expr(e.index, scope)
        return F.when(idx >= 0, F.get(subj, idx.cast("int"))).otherwise(
            F.get(subj, (F.size(subj) + idx).cast("int"))
        )

    if isinstance(e, A.ListSlice):
        # reference eval_list_slice (operator.rs:289-314): negative
        # indexes resolve from the end, clamp to [0, len]; start >= end
        # -> empty.  Clamped start+1 >= 1, so slice() never sees its
        # illegal 0 start.
        subj = compile_expr(e.subject, scope)
        n = F.size(subj)
        start = compile_expr(e.start, scope) if e.start else F.lit(0)
        end = compile_expr(e.end, scope) if e.end else n
        start = F.when(start < 0, F.greatest(n + start, F.lit(0))).otherwise(
            F.least(start, n)
        )
        end = F.when(end < 0, F.greatest(n + end, F.lit(0))).otherwise(
            F.least(end, n)
        )
        return F.slice(
            subj, (start + 1).cast("int"),
            F.greatest(end - start, F.lit(0)).cast("int"),
        )

    if isinstance(e, A.ListLiteral):
        return F.array(*[compile_expr(x, scope) for x in e.items])

    if isinstance(e, A.MapLiteral):
        pairs = []
        for k, v in e.entries.items():
            pairs += [F.lit(k), compile_expr(v, scope)]
        return F.create_map(*pairs)

    if isinstance(e, A.ListComprehension):
        src = compile_expr(e.source, scope)
        if e.where is not None:
            src = F.filter(
                src,
                lambda x: compile_expr(
                    e.where, scope.child_with_local(e.var, x)
                ),
            )
        if e.projection is not None:
            src = F.transform(
                src,
                lambda x: compile_expr(
                    e.projection, scope.child_with_local(e.var, x)
                ),
            )
        return src

    if isinstance(e, A.QuantifiedPredicate):
        src = compile_expr(e.source, scope)
        pred = lambda x: compile_expr(e.predicate, scope.child_with_local(e.var, x))  # noqa: E731
        if e.kind == "all":
            return F.forall(src, pred)
        if e.kind == "any":
            return F.exists(src, pred)
        if e.kind == "none":
            return ~F.exists(src, pred)
        if e.kind == "single":
            return F.size(F.filter(src, pred)) == 1
        raise CompileError(f"quantifier {e.kind}")

    if isinstance(e, A.ReduceExpr):
        src = compile_expr(e.source, scope)
        init = compile_expr(e.init, scope)
        # aggregate() requires the merge lambda's type to EQUAL the
        # init's; an int-literal init (32-bit) over an int64 list fails
        # analysis, while a long init absorbs int elements fine —
        # Cypher integers are i64 (property.rs:85), so widen
        if isinstance(e.init, A.Literal) and isinstance(e.init.value, int) \
                and not isinstance(e.init.value, bool):
            init = init.cast("long")
        return F.aggregate(
            src,
            init,
            lambda acc, x: compile_expr(
                e.body,
                scope.child_with_local(e.acc, acc).child_with_local(e.var, x),
            ),
        )

    if isinstance(e, (A.ExistsSubquery, A.CountSubquery)):
        raise CompileError(
            "EXISTS{}/COUNT{} subqueries are only supported as top-level "
            "WHERE conjuncts (compiled to semi/anti joins)"
        )

    raise CompileError(f"cannot compile {type(e).__name__}")


# functions whose results are certainly integers (reference returns
# PropertyValue::Integer from eval_function for these)
_INT_FUNCS = {
    "tointeger", "toint", "tointegerornull", "size", "length", "id",
    "timestamp", "abs_int",
}


_INTEGRAL_TYPES = ("long", "integer", "short", "byte")

# string-returning scalar functions (reference eval_function +841-901)
_STR_FUNCS = {
    "toupper", "touppercase", "tolower", "tolowercase", "trim", "ltrim",
    "rtrim", "replace", "substring", "left", "right", "tostring",
    "tostringornull",
}


def _static_type(e: A.Expr, scope: Scope) -> str | None:
    """Best-effort static Spark type name of an expression; None when
    unknown.  Sources: literal/param Python types, known function
    result types, VarInfo.dtype refreshed from the live frame schema,
    struct-field types for properties, graph schema as fallback."""
    if isinstance(e, A.Literal):
        v = e.value
        if v is None:
            return "void"
        if isinstance(v, bool):
            return "boolean"
        if isinstance(v, int):
            return "long"
        if isinstance(v, float):
            return "double"
        if isinstance(v, str):
            return "string"
        if isinstance(v, list):
            return "array"
        return None
    if isinstance(e, A.ListLiteral) or isinstance(e, A.ListComprehension):
        return "array"
    if isinstance(e, A.MapLiteral):
        return "map"
    if isinstance(e, A.Parameter):
        v = scope.params.get(e.name)
        if isinstance(v, bool):
            return "boolean"
        if isinstance(v, int):
            return "long"
        if isinstance(v, float):
            return "double"
        if isinstance(v, str):
            return "string"
        return None
    if isinstance(e, A.UnaryOp) and e.op == "NEG":
        return _static_type(e.operand, scope)
    if isinstance(e, A.BinaryOp) and e.op in ("+", "-", "*", "%"):
        lt = _static_type(e.left, scope)
        rt = _static_type(e.right, scope)
        if lt in _INTEGRAL_TYPES and rt in _INTEGRAL_TYPES:
            return "long"
        if lt in ("double", "float") or rt in ("double", "float"):
            return "double"
        return None
    if isinstance(e, A.FunctionCall):
        if e.distinct:
            return None
        if e.name in _INT_FUNCS:
            return "long"
        if e.name in _STR_FUNCS:
            return "string"
        return None
    if isinstance(e, A.Variable):
        if e.name in scope.locals:
            return None
        info = scope.vars.get(e.name)
        if info is not None and info.dtype is not None:
            return info.dtype.typeName()
        return None
    if isinstance(e, A.Property) and isinstance(e.subject, A.Variable):
        info = scope.vars.get(e.subject.name)
        if info is None:
            return None
        if info.dtype is not None and info.dtype.typeName() == "struct":
            for fld in info.dtype.fields:
                if fld.name == e.key:
                    return fld.dataType.typeName()
            return None
        if info.label is not None and scope.graph is not None:
            try:
                df = (
                    scope.graph.node_df(info.label)
                    if info.kind == "node"
                    else scope.graph.edge_df(info.label)
                )
            except Exception:
                return None
            for fld in df.schema.fields:
                if fld.name == e.key:
                    return fld.dataType.typeName()
    return None


def _is_integer(e: A.Expr, scope: Scope) -> bool:
    """True only when the expression is certainly integer-valued (used
    for reference-parity truncating integer division, operator.rs
    arithmetic_div:2619).  Unknown -> False -> double division."""
    t = _static_type(e, scope)
    return t in _INTEGRAL_TYPES


def _is_string(e: A.Expr, scope: Scope) -> bool:
    return _static_type(e, scope) == "string"


_VALUE_TYPE_NAMES = {
    "long": "INTEGER", "integer": "INTEGER", "short": "INTEGER",
    "byte": "INTEGER",
    "double": "FLOAT", "float": "FLOAT", "decimal": "FLOAT",
    "string": "STRING", "boolean": "BOOLEAN", "array": "LIST",
    "map": "MAP", "void": "NULL",
}


def _value_type(arg: A.Expr, scope: Scope) -> Column:
    """valueType() (reference CY-26, operator.rs:1511-1528): the
    static type name, with NODE/RELATIONSHIP/PATH from variable kinds
    and a runtime null check (a typed engine can answer the rest at
    compile time)."""
    if isinstance(arg, A.Variable):
        info = scope.vars.get(arg.name)
        if info is not None and info.kind in ("node", "edge", "path"):
            kind = {"node": "NODE", "edge": "RELATIONSHIP", "path": "PATH"}
            return F.lit(kind[info.kind])
    t = _static_type(arg, scope)
    name = _VALUE_TYPE_NAMES.get(t or "", "ANY")
    if t == "struct":
        name = "MAP"
    col = compile_expr(arg, scope)
    if name == "NULL":
        return F.lit("NULL")
    return F.when(col.isNull(), F.lit("NULL")).otherwise(F.lit(name))


_TEMPORAL_TYPES = {"timestamp", "timestamp_ntz", "date"}


def _coerce_compare(
    e: A.BinaryOp, l: Column, r: Column, scope: Scope
) -> tuple[Column, Column] | Column | None:
    """Cross-type comparison coercions of the reference's coerced_eq /
    compare_* (operator.rs:2481-2519): String<->Boolean equality
    ('LLMs often generate prop = true') and DateTime<->Integer
    (DateTime is epoch millis there).  Nulls stay 3VL (the driver's
    DuckDB oracle is 3VL; the reference's false-on-null is a filter
    no-op either way)."""
    lt = _static_type(e.left, scope)
    rt = _static_type(e.right, scope)
    if e.op in ("=", "<>") and {lt, rt} == {"boolean", "string"}:
        b, s = (l, r) if lt == "boolean" else (r, l)
        ls = F.lower(s)
        eq = (
            F.when(b.isNull() | s.isNull(), F.lit(None).cast("boolean"))
            .when(ls == "true", b)
            .when(ls == "false", ~b)
            .otherwise(F.lit(False))
        )
        return eq if e.op == "=" else ~eq
    if lt in _TEMPORAL_TYPES and rt in _INTEGRAL_TYPES:
        return F.unix_millis(l.cast("timestamp")), r
    if rt in _TEMPORAL_TYPES and lt in _INTEGRAL_TYPES:
        return l, F.unix_millis(r.cast("timestamp"))
    return None


_DURATION_FIELDS = {"months", "days", "seconds", "nanos"}


def _is_duration_expr(e: A.Expr, scope: Scope) -> bool:
    """Static check: does this expression produce the 4-component
    Duration struct (property.rs:92-97)?"""
    if isinstance(e, A.FunctionCall) and e.name in ("duration", "duration.between"):
        return True
    if isinstance(e, A.Variable):
        info = scope.vars.get(e.name)
        dt = getattr(info, "dtype", None) if info is not None else None
        return isinstance(dt, T.StructType) and set(dt.names) == _DURATION_FIELDS
    if isinstance(e, A.BinaryOp) and e.op in ("+", "-"):
        return _is_duration_expr(e.left, scope) and _is_duration_expr(e.right, scope)
    return False


def _duration_interval(c: Column) -> Column:
    """Duration struct -> Catalyst interval for timestamp arithmetic."""
    z = F.lit(0)
    secs = (
        c.getField("seconds").cast("double")
        + c.getField("nanos").cast("double") / 1e9
    ).cast("decimal(18,6)")
    return F.make_interval(
        z, c.getField("months").cast("int"), z,
        c.getField("days").cast("int"), z, z, secs,
    )


def _binary(e: A.BinaryOp, scope: Scope) -> Column:
    op = e.op
    l = compile_expr(e.left, scope)
    r = compile_expr(e.right, scope)
    if op in ("=", "<>", "<", "<=", ">", ">="):
        coerced = _coerce_compare(e, l, r, scope)
        if isinstance(coerced, Column):
            return coerced
        if coerced is not None:
            l, r = coerced
    if op == "=":
        return l == r
    if op == "<>":
        return l != r
    if op == "<":
        return l < r
    if op == "<=":
        return l <= r
    if op == ">":
        return l > r
    if op == ">=":
        return l >= r
    if op == "AND":
        return l & r
    if op == "OR":
        return l | r
    if op == "XOR":
        return (l | r) & ~(l & r)
    if op in ("+", "-"):
        ld = _is_duration_expr(e.left, scope)
        rd = _is_duration_expr(e.right, scope)
        if ld and rd:
            sign = 1 if op == "+" else -1
            return F.struct(
                *[
                    (l.getField(f) + sign * r.getField(f)).alias(f)
                    for f in ("months", "days", "seconds", "nanos")
                ]
            )
        if rd:  # datetime ± duration (reference temporal arithmetic)
            iv = _duration_interval(r)
            ts = l.cast("timestamp")
            return ts + iv if op == "+" else ts - iv
        if ld and op == "+":  # duration + datetime
            return r.cast("timestamp") + _duration_interval(l)
    if op == "+":
        return l + r
    if op == "-":
        return l - r
    if op == "*":
        return l * r
    if op == "/":
        # int / int truncates toward zero in the reference (Rust i64
        # division, operator.rs:2619); everything else is double.
        # Division by zero yields null (vectorized execution cannot
        # raise per-row; the reference errors the whole query).
        if _is_integer(e.left, scope) and _is_integer(e.right, scope):
            return (l / r).cast("long")
        return l / r
    if op == "%":
        return l % r
    if op == "^":
        return F.pow(l, r)
    if op == "STARTS_WITH":
        return l.startswith(r)
    if op == "ENDS_WITH":
        return l.endswith(r)
    if op == "CONTAINS":
        return l.contains(r)
    if op == "=~":
        return l.rlike(compile_expr(e.right, scope).cast("string")) if not isinstance(
            e.right, A.Literal
        ) else l.rlike(e.right.value)
    if op == "IN":
        return F.array_contains(r, l)
    raise CompileError(f"binary {op}")


def _call(e: A.FunctionCall, scope: Scope) -> Column:
    name = e.name
    if name in AGGREGATES:
        raise CompileError(
            f"aggregate {name}() outside aggregation context"
        )
    # graph-metadata functions need VarInfo
    if name in ("id", "elementid"):
        return _subject_field(e, scope, "id")
    if name == "length" and e.args and isinstance(e.args[0], A.Variable):
        info = scope.vars.get(e.args[0].name)
        if info is not None and info.kind == "path":
            # length(p) of a shortestPath binding = hop count
            return compile_expr(e.args[0], scope).getField("hops")
    if name == "labels":
        v = e.args[0]
        if isinstance(v, A.Variable):
            info = scope.vars.get(v.name)
            if info and info.label:
                return F.array(F.lit(info.label))
        return compile_expr(v, scope).getField("_labels")
    if name == "type":
        v = e.args[0]
        if isinstance(v, A.Variable):
            info = scope.vars.get(v.name)
            if info and info.label:
                return F.lit(info.label)
        return compile_expr(v, scope).getField("_type")
    if name in ("nodes", "relationships", "rels"):
        v = e.args[0]
        if isinstance(v, A.Variable):
            info = scope.vars.get(v.name)
            if info is not None and info.kind == "path":
                fld = "nodes" if name == "nodes" else "rels"
                return compile_expr(v, scope).getField(fld)
        raise CompileError(f"{name}() expects a path variable")
    if name == "startnode":
        return compile_expr(e.args[0], scope).getField("src")
    if name == "endnode":
        return compile_expr(e.args[0], scope).getField("dst")
    if name == "properties":
        return compile_expr(e.args[0], scope)
    if name == "exists":
        return compile_expr(e.args[0], scope).isNotNull()
    if (
        name in ("date", "datetime", "localdatetime")
        and e.args
        and isinstance(e.args[0], A.MapLiteral)
    ):
        return _temporal_from_map(name, e.args[0], scope)
    if name == "duration":
        return _duration(e, scope)
    if name == "duration.between":
        return _duration_between(e, scope)
    if name in ("time", "localtime"):
        return _time_of_day(e, scope)
    if name in SCALARS:
        args = [compile_expr(a, scope) for a in e.args]
        return SCALARS[name](*args)
    raise CompileError(f"unknown function {name}")


def _temporal_from_map(name: str, m: A.MapLiteral, scope: Scope) -> Column:
    """date/datetime/localdatetime({year, month, day[, hour, minute,
    second]}) — component-map construction (reference
    operator.rs:1212-1221, :1242-1260; missing keys default to
    1970-01-01 / midnight).  Keys outside the supported component set
    raise (the reference rejects unknown components rather than
    silently dropping them, operator.rs:1212-1260)."""
    parts = {k.lower(): compile_expr(v, scope) for k, v in m.entries.items()}
    supported = (
        {"year", "month", "day"}
        if name == "date"
        else {"year", "month", "day", "hour", "minute", "second"}
    )
    unknown = sorted(set(parts) - supported)
    if unknown:
        raise CompileError(
            f"{name}() map: unsupported component(s) {unknown}; "
            f"supported: {sorted(supported)}"
        )

    def get(key: str, default: int) -> Column:
        return (
            parts[key].cast("int") if key in parts else F.lit(default)
        )

    if name == "date":
        return F.make_date(get("year", 1970), get("month", 1), get("day", 1))
    return F.call_function(
        "make_timestamp",
        get("year", 1970), get("month", 1), get("day", 1),
        get("hour", 0), get("minute", 0), get("second", 0),
    )


def _time_of_day(e: A.FunctionCall, scope: Scope) -> Column:
    """time() / localtime() (reference CY-27/CY-28, operator.rs:1243-
    1330): millis since midnight — now-UTC with no args, parsed from
    'HH:MM:SS[.fff]' (timezone suffix ignored), or built from a
    {hour, minute, second} map."""
    if not e.args:
        return (
            F.unix_millis(F.current_timestamp()) % F.lit(86_400_000)
        ).cast("long")
    arg = e.args[0]
    if isinstance(arg, A.MapLiteral):
        parts = {k: compile_expr(v, scope) for k, v in arg.entries.items()}
        zero = F.lit(0).cast("long")

        def get(key):
            return parts[key].cast("long") if key in parts else zero

        return (
            get("hour") * 3600 + get("minute") * 60 + get("second")
        ) * 1000
    s = compile_expr(arg, scope).cast("string")
    pat = r"^(\d{1,2}):(\d{2}):(\d{2})(?:\.(\d+))?"
    h = F.regexp_extract(s, pat, 1).cast("long")
    mi = F.regexp_extract(s, pat, 2).cast("long")
    sec = F.regexp_extract(s, pat, 3).cast("long")
    frac = F.regexp_extract(s, pat, 4)
    ms = F.when(
        frac == "", F.lit(0).cast("long")
    ).otherwise(F.substring(F.rpad(frac, 3, "0"), 1, 3).cast("long"))
    return (
        F.when(
            F.regexp_extract(s, pat, 0) == "",
            F.lit(None).cast("long"),
        ).otherwise((h * 3600 + mi * 60 + sec) * 1000 + ms)
    )


def _duration(e: A.FunctionCall, scope: Scope) -> Column:
    """duration({years, months, days, hours, minutes, seconds,
    milliseconds, microseconds, nanoseconds}) -> the reference's
    4-component Duration struct (property.rs:92-97)."""
    if not e.args or not isinstance(e.args[0], A.MapLiteral):
        raise CompileError("duration() takes a map literal")
    parts = {k: compile_expr(v, scope) for k, v in e.args[0].entries.items()}
    zero = F.lit(0).cast("long")

    def get(key):
        return parts[key].cast("long") if key in parts else zero

    months = get("years") * 12 + get("months")
    days = get("weeks") * 7 + get("days")
    seconds = get("hours") * 3600 + get("minutes") * 60 + get("seconds")
    nanos = (
        get("milliseconds") * 1_000_000
        + get("microseconds") * 1_000
        + get("nanoseconds")
    )
    return F.struct(
        months.alias("months"),
        days.alias("days"),
        seconds.alias("seconds"),
        nanos.alias("nanos"),
    )


def _duration_between(e: A.FunctionCall, scope: Scope) -> Column:
    """duration.between(a, b): calendar-aware decomposition into the
    reference's 4-component Duration (property.rs:92-97) — whole
    calendar months first (month-end clamped, so Jan 31 + P1M =
    Feb 28/29), then whole days, then seconds/nanos.  All components
    share the sign of the interval (truncation toward zero), matching
    the reference's normalized component model."""
    a = compile_expr(e.args[0], scope).cast("timestamp")
    b = compile_expr(e.args[1], scope).cast("timestamp")
    # candidate month delta from the calendar fields alone, then one
    # conditional adjustment for day-of-month/clamping overshoot
    m0 = (
        (F.year(b) - F.year(a)) * 12 + (F.month(b) - F.month(a))
    ).cast("int")
    shifted0 = F.timestamp_add("MONTH", m0, a)
    months = (
        F.when((b >= a) & (shifted0 > b), m0 - 1)
        .when((b < a) & (shifted0 < b), m0 + 1)
        .otherwise(m0)
    ).cast("int")
    base = F.timestamp_add("MONTH", months, a)
    rem_us = F.unix_micros(b) - F.unix_micros(base)
    days = (rem_us / 86_400_000_000).cast("long")  # trunc toward zero
    rem2 = rem_us - days * 86_400_000_000
    seconds = (rem2 / 1_000_000).cast("long")
    nanos = ((rem2 - seconds * 1_000_000) * 1000).cast("long")
    return F.struct(
        months.cast("long").alias("months"),
        days.alias("days"),
        seconds.alias("seconds"),
        nanos.alias("nanos"),
    )


def _subject_field(e: A.FunctionCall, scope: Scope, fld: str) -> Column:
    return compile_expr(e.args[0], scope).getField(fld)
