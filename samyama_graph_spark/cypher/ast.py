"""Cypher AST.

Shapes mirror the reference's ast.rs:69-133 (Query struct), :287-405
(Expression) — re-derived from the language surface, not a port.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

# ----------------------------------------------------------- expressions


@dataclass
class Expr:
    pass


@dataclass
class Literal(Expr):
    value: Any  # None | bool | int | float | str | list


@dataclass
class Parameter(Expr):
    name: str


@dataclass
class Variable(Expr):
    name: str


@dataclass
class Property(Expr):
    subject: Expr
    key: str


@dataclass
class BinaryOp(Expr):
    op: str  # = <> < <= > >= AND OR XOR + - * / % ^ STARTS_WITH ENDS_WITH CONTAINS IN =~
    left: Expr
    right: Expr


@dataclass
class UnaryOp(Expr):
    op: str  # NOT, NEG, IS_NULL, IS_NOT_NULL
    operand: Expr


@dataclass
class FunctionCall(Expr):
    name: str  # lowercased
    args: list[Expr]
    distinct: bool = False


@dataclass
class CaseExpr(Expr):
    subject: Expr | None  # simple CASE has a subject; searched has None
    whens: list[tuple[Expr, Expr]]
    default: Expr | None


@dataclass
class ListIndex(Expr):
    subject: Expr
    index: Expr


@dataclass
class ListSlice(Expr):
    subject: Expr
    start: Expr | None
    end: Expr | None


@dataclass
class ListLiteral(Expr):
    items: list[Expr]


@dataclass
class MapLiteral(Expr):
    entries: dict[str, Expr]


@dataclass
class ListComprehension(Expr):
    var: str
    source: Expr
    where: Expr | None
    projection: Expr | None


@dataclass
class PatternComprehension(Expr):
    """``[(a)-[:R]->(b) WHERE pred | expr]`` — evaluated per row as a
    collected list (reference: eval_pattern_comprehension,
    operator.rs:2417)."""

    path: "PatternPath"
    where: Expr | None
    projection: Expr


@dataclass
class QuantifiedPredicate(Expr):
    kind: str  # all | any | none | single
    var: str
    source: Expr
    predicate: Expr


@dataclass
class ReduceExpr(Expr):
    acc: str
    init: Expr
    var: str
    source: Expr
    body: Expr


@dataclass
class ExistsSubquery(Expr):
    pattern: list[PatternPath]
    where: Expr | None


@dataclass
class CountSubquery(Expr):
    pattern: list[PatternPath]
    where: Expr | None


# -------------------------------------------------------------- patterns


@dataclass
class NodePattern:
    var: str | None
    labels: list[str]
    properties: dict[str, Expr] = field(default_factory=dict)


@dataclass
class EdgePattern:
    var: str | None
    types: list[str]
    direction: str  # "out" (->), "in" (<-), "both" (undirected)
    properties: dict[str, Expr] = field(default_factory=dict)
    min_hops: int | None = None  # None => plain 1-hop (no *)
    max_hops: int | None = None


@dataclass
class PatternPath:
    """Alternating nodes/edges: nodes[0] -edges[0]- nodes[1] ..."""

    nodes: list[NodePattern]
    edges: list[EdgePattern]
    path_var: str | None = None
    shortest: str | None = None  # None | "shortest" | "allShortest"


# --------------------------------------------------------------- clauses


@dataclass
class MatchClause:
    paths: list[PatternPath]
    optional: bool = False
    where: Expr | None = None


@dataclass
class UnwindClause:
    expr: Expr
    alias: str


@dataclass
class ReturnItem:
    expr: Expr
    alias: str | None


@dataclass
class WithClause:
    items: list[ReturnItem]
    distinct: bool = False
    where: Expr | None = None
    order_by: list[tuple[Expr, bool]] = field(default_factory=list)  # (expr, asc)
    skip: Expr | None = None
    limit: Expr | None = None


@dataclass
class ReturnClause:
    items: list[ReturnItem]  # empty + star=True for RETURN *
    distinct: bool = False
    star: bool = False
    order_by: list[tuple[Expr, bool]] = field(default_factory=list)
    skip: Expr | None = None
    limit: Expr | None = None


@dataclass
class CallClause:
    procedure: str
    args: list[Expr]
    # (name, alias-or-None) — reference cypher.pest:35 yield_item
    yields: list[tuple[str, str | None]] = field(default_factory=list)


@dataclass
class CallSubqueryClause:
    """``CALL { <query> }`` (reference ast.rs:86-87 — parsed there but
    never planned; implemented properly here, like UNION)."""

    query: "Query"


# ----------------------------------------------------------- write clauses


@dataclass
class CreateClause:
    paths: list[PatternPath]


@dataclass
class SetItem:
    target: Property  # n.prop
    value: Expr


@dataclass
class SetClause:
    items: list[SetItem]


@dataclass
class RemoveLabelItem:
    """``REMOVE n:Label`` (reference RemoveItem::Label, ast.rs:521 —
    parsed there but dropped by the planner; executed here)."""

    var: str
    label: str


@dataclass
class RemoveClause:
    items: list[Property]


@dataclass
class DeleteClause:
    vars: list[str]
    detach: bool = False


@dataclass
class MergeClause:
    path: PatternPath
    on_create: list[SetItem] = field(default_factory=list)
    on_match: list[SetItem] = field(default_factory=list)


@dataclass
class ForeachClause:
    var: str
    source: Expr
    updates: list[SetClause]


@dataclass
class SingleQuery:
    # ordered reading clauses: MatchClause | UnwindClause | WithClause | CallClause
    clauses: list[Any]
    ret: ReturnClause | None


@dataclass
class Query:
    """Possibly a UNION chain of single queries."""

    parts: list[SingleQuery]
    union_all: list[bool] = field(default_factory=list)  # len = parts-1
    params: dict[str, Any] = field(default_factory=dict)
