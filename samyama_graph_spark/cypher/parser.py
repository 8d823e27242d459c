"""Recursive-descent Cypher parser.

Covers the clause set of SURVEY.md §2.1 (reference ast.rs:69-133):
MATCH / OPTIONAL MATCH / WHERE / WITH / UNWIND / RETURN (DISTINCT,
ORDER BY, SKIP, LIMIT) / UNION [ALL] / CALL proc YIELD, pattern
syntax with multi-label nodes, multi-type edges, direction, inline
property maps, var-length ``*min..max``, shortestPath, and the full
expression grammar (Pratt-style precedence, matching the reference's
documented precedence list parser.rs:45-51).
"""

from __future__ import annotations

from typing import Any

from samyama_graph_spark.cypher import ast as A
from samyama_graph_spark.cypher.lexer import Token, tokenize


class ParseError(ValueError):
    pass


class Parser:
    def __init__(self, text: str):
        self.toks = tokenize(text)
        self.i = 0
        self._anon = 0

    # ------------------------------------------------------------ helpers
    def peek(self, ahead: int = 0) -> Token:
        return self.toks[min(self.i + ahead, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_kw(self, *words: str) -> bool:
        t = self.peek()
        return t.kind == "KEYWORD" and t.value.lower() in words

    def at_punct(self, *vals: str) -> bool:
        t = self.peek()
        return t.kind == "PUNCT" and t.value in vals

    def eat_kw(self, word: str) -> None:
        if not self.at_kw(word):
            raise ParseError(f"expected {word.upper()} at {self.peek()}")
        self.next()

    def eat_punct(self, val: str) -> None:
        if not self.at_punct(val):
            raise ParseError(f"expected {val!r} at {self.peek()}")
        self.next()

    def try_kw(self, *words: str) -> bool:
        if self.at_kw(*words):
            self.next()
            return True
        return False

    def try_punct(self, val: str) -> bool:
        if self.at_punct(val):
            self.next()
            return True
        return False

    def anon(self, prefix: str) -> str:
        self._anon += 1
        return f"__{prefix}{self._anon}"

    def ident(self) -> str:
        t = self.peek()
        if t.kind in ("IDENT", "KEYWORD"):
            self.next()
            return t.value
        raise ParseError(f"expected identifier at {t}")

    # -------------------------------------------------------------- query
    def parse(self) -> A.Query:
        parts = [self.parse_single()]
        union_all: list[bool] = []
        while self.at_kw("union"):
            self.next()
            union_all.append(self.try_kw("all"))
            parts.append(self.parse_single())
        if self.peek().kind != "EOF" and not self.at_punct(";"):
            raise ParseError(f"trailing input at {self.peek()}")
        return A.Query(parts, union_all)

    def parse_single(self) -> A.SingleQuery:
        clauses: list[Any] = []
        ret: A.ReturnClause | None = None
        while True:
            if self.at_kw("optional"):
                self.next()
                self.eat_kw("match")
                clauses.append(self.parse_match(optional=True))
            elif self.at_kw("match"):
                self.next()
                clauses.append(self.parse_match(optional=False))
            elif self.at_kw("unwind"):
                self.next()
                e = self.expr()
                self.eat_kw("as")
                clauses.append(A.UnwindClause(e, self.ident()))
            elif self.at_kw("with"):
                self.next()
                clauses.append(self.parse_with())
            elif self.at_kw("call"):
                self.next()
                if self.at_punct("{"):
                    clauses.append(self.parse_call_subquery())
                else:
                    clauses.append(self.parse_call())
            elif self.at_kw("create"):
                self.next()
                paths = [self.parse_path()]
                while self.try_punct(","):
                    paths.append(self.parse_path())
                clauses.append(A.CreateClause(paths))
            elif self.at_kw("merge"):
                self.next()
                clauses.append(self.parse_merge())
            elif self.at_kw("set"):
                self.next()
                clauses.append(A.SetClause(self.parse_set_items()))
            elif self.at_kw("remove"):
                self.next()
                items = [self._remove_item()]
                while self.try_punct(","):
                    items.append(self._remove_item())
                clauses.append(A.RemoveClause(items))  # type: ignore[arg-type]
            elif self.at_kw("foreach"):
                self.next()
                self.eat_punct("(")
                fvar = self.ident()
                self.eat_kw("in")
                src = self.expr()
                self.eat_punct("|")
                updates = []
                while self.try_kw("set"):
                    updates.append(A.SetClause(self.parse_set_items()))
                self.eat_punct(")")
                clauses.append(A.ForeachClause(fvar, src, updates))
            elif self.at_kw("detach"):
                self.next()
                self.eat_kw("delete")
                clauses.append(A.DeleteClause(self._var_list(), detach=True))
            elif self.at_kw("delete"):
                self.next()
                clauses.append(A.DeleteClause(self._var_list(), detach=False))
            elif self.at_kw("return"):
                self.next()
                ret = self.parse_return()
                break
            else:
                break
        return A.SingleQuery(clauses, ret)

    def _var_list(self) -> list[str]:
        out = [self.ident()]
        while self.try_punct(","):
            out.append(self.ident())
        return out

    def parse_set_items(self) -> list[A.SetItem]:
        items = []
        while True:
            target = self.expr_postfix()
            if not isinstance(target, A.Property):
                raise ParseError("SET target must be a property access")
            self.eat_punct("=")
            items.append(A.SetItem(target, self.expr()))
            if not self.try_punct(","):
                break
        return items

    def parse_merge(self) -> A.MergeClause:
        path = self.parse_path()
        on_create: list[A.SetItem] = []
        on_match: list[A.SetItem] = []
        while self.at_kw("on"):
            self.next()
            if self.try_kw("create"):
                self.eat_kw("set")
                on_create = self.parse_set_items()
            elif self.try_kw("match"):
                self.eat_kw("set")
                on_match = self.parse_set_items()
            else:
                raise ParseError(f"expected CREATE or MATCH after ON at {self.peek()}")
        return A.MergeClause(path, on_create, on_match)

    # ------------------------------------------------------------ clauses
    def parse_match(self, optional: bool) -> A.MatchClause:
        paths = [self.parse_path()]
        while self.try_punct(","):
            paths.append(self.parse_path())
        where = self.expr() if self.try_kw("where") else None
        return A.MatchClause(paths, optional=optional, where=where)

    def _return_items(self) -> tuple[list[A.ReturnItem], bool]:
        star = False
        items: list[A.ReturnItem] = []
        if self.at_punct("*"):
            self.next()
            star = True
            if not self.try_punct(","):
                return items, star
        while True:
            e = self.expr()
            alias = self.ident() if self.try_kw("as") else None
            items.append(A.ReturnItem(e, alias))
            if not self.try_punct(","):
                break
        return items, star

    def _order_skip_limit(self):
        order_by: list[tuple[A.Expr, bool]] = []
        skip = limit = None
        if self.try_kw("order"):
            self.eat_kw("by")
            while True:
                e = self.expr()
                asc = True
                if self.try_kw("asc", "ascending"):
                    asc = True
                elif self.try_kw("desc", "descending"):
                    asc = False
                order_by.append((e, asc))
                if not self.try_punct(","):
                    break
        if self.try_kw("skip"):
            skip = self.expr()
        if self.try_kw("limit"):
            limit = self.expr()
        return order_by, skip, limit

    def parse_with(self) -> A.WithClause:
        distinct = self.try_kw("distinct")
        items, star = self._return_items()
        if star:
            raise ParseError("WITH * not supported yet")
        order_by, skip, limit = self._order_skip_limit()
        where = self.expr() if self.try_kw("where") else None
        return A.WithClause(items, distinct, where, order_by, skip, limit)

    def parse_return(self) -> A.ReturnClause:
        distinct = self.try_kw("distinct")
        items, star = self._return_items()
        order_by, skip, limit = self._order_skip_limit()
        return A.ReturnClause(items, distinct, star, order_by, skip, limit)

    def parse_call(self) -> A.CallClause:
        # CALL ns.name.proc(arg, ...) [YIELD a, b]
        name_parts = [self.ident()]
        while self.try_punct("."):
            name_parts.append(self.ident())
        args: list[A.Expr] = []
        if self.try_punct("("):
            if not self.at_punct(")"):
                args.append(self.expr())
                while self.try_punct(","):
                    args.append(self.expr())
            self.eat_punct(")")
        yields: list[tuple[str, str | None]] = []
        if self.try_kw("yield"):
            yields.append(self._yield_item())
            while self.try_punct(","):
                yields.append(self._yield_item())
        return A.CallClause(".".join(name_parts), args, yields)

    def _remove_item(self):
        # remove_item = property_access | variable ":" label
        # (reference cypher.pest:57)
        if (
            self.peek().kind == "IDENT"
            and self.peek(1).kind == "PUNCT"
            and self.peek(1).value == ":"
        ):
            var = self.ident()
            self.eat_punct(":")
            return A.RemoveLabelItem(var, self.ident())
        return self.expr_postfix()

    def _yield_item(self) -> tuple[str, str | None]:
        # yield_item = variable (AS variable)?  (reference cypher.pest:35)
        name = self.ident()
        return (name, self.ident() if self.try_kw("as") else None)

    def parse_call_subquery(self) -> A.CallSubqueryClause:
        # CALL { <single query> [UNION [ALL] <single query>]* }
        self.eat_punct("{")
        parts = [self.parse_single()]
        union_all: list[bool] = []
        while self.at_kw("union"):
            self.next()
            union_all.append(self.try_kw("all"))
            parts.append(self.parse_single())
        self.eat_punct("}")
        return A.CallSubqueryClause(A.Query(parts, union_all))

    # ------------------------------------------------------------ patterns
    def parse_path(self) -> A.PatternPath:
        path_var = None
        shortest = None
        if self.peek().kind == "IDENT" and self.peek(1).kind == "PUNCT" and self.peek(1).value == "=":
            path_var = self.ident()
            self.eat_punct("=")
        if self.at_kw("shortestpath", "allshortestpaths"):
            kw = self.next().value.lower()
            shortest = "shortest" if kw == "shortestpath" else "allShortest"
            self.eat_punct("(")
            inner = self.parse_path_body()
            self.eat_punct(")")
            inner.path_var = path_var
            inner.shortest = shortest
            return inner
        p = self.parse_path_body()
        p.path_var = path_var
        return p

    def parse_path_body(self) -> A.PatternPath:
        nodes = [self.parse_node()]
        edges: list[A.EdgePattern] = []
        while self.at_punct("-", "<-"):
            edges.append(self.parse_edge())
            nodes.append(self.parse_node())
        return A.PatternPath(nodes, edges)

    def parse_node(self) -> A.NodePattern:
        self.eat_punct("(")
        var = None
        if self.peek().kind == "IDENT" and not self.at_punct(":"):
            var = self.ident()
        labels = []
        while self.try_punct(":"):
            labels.append(self.ident())
        props: dict[str, A.Expr] = {}
        if self.at_punct("{"):
            props = self.parse_prop_map()
        self.eat_punct(")")
        return A.NodePattern(var, labels, props)

    def parse_prop_map(self) -> dict[str, A.Expr]:
        self.eat_punct("{")
        out: dict[str, A.Expr] = {}
        if not self.at_punct("}"):
            while True:
                k = self.ident()
                self.eat_punct(":")
                out[k] = self.expr()
                if not self.try_punct(","):
                    break
        self.eat_punct("}")
        return out

    def parse_edge(self) -> A.EdgePattern:
        # directions: -[..]-> out, <-[..]- in, -[..]- both; also --, -->, <--
        direction = "both"
        if self.try_punct("<-"):
            direction = "in"
        else:
            self.eat_punct("-")
        var = None
        types: list[str] = []
        props: dict[str, A.Expr] = {}
        min_h = max_h = None
        if self.try_punct("["):
            if self.peek().kind == "IDENT" and not self.at_punct(":"):
                var = self.ident()
            if self.try_punct(":"):
                types.append(self.ident())
                while self.try_punct("|"):
                    self.try_punct(":")  # allow |:TYPE
                    types.append(self.ident())
            if self.try_punct("*"):
                min_h, max_h = 1, None
                if self.peek().kind == "INT":
                    min_h = int(self.next().value)
                    max_h = min_h  # *n means exactly n unless .. follows
                if self.try_punct(".."):
                    max_h = None
                    if self.peek().kind == "INT":
                        max_h = int(self.next().value)
            if self.at_punct("{"):
                props = self.parse_prop_map()
            self.eat_punct("]")
        if direction == "in":
            self.eat_punct("-")
        elif self.try_punct("->"):
            direction = "out"
        else:
            self.eat_punct("-")
        return A.EdgePattern(var, types, direction, props, min_h, max_h)

    # --------------------------------------------------------- expressions
    def expr(self) -> A.Expr:
        return self.expr_or()

    def expr_or(self) -> A.Expr:
        left = self.expr_xor()
        while self.at_kw("or"):
            self.next()
            left = A.BinaryOp("OR", left, self.expr_xor())
        return left

    def expr_xor(self) -> A.Expr:
        left = self.expr_and()
        while self.at_kw("xor"):
            self.next()
            left = A.BinaryOp("XOR", left, self.expr_and())
        return left

    def expr_and(self) -> A.Expr:
        left = self.expr_not()
        while self.at_kw("and"):
            self.next()
            left = A.BinaryOp("AND", left, self.expr_not())
        return left

    def expr_not(self) -> A.Expr:
        if self.at_kw("not"):
            self.next()
            return A.UnaryOp("NOT", self.expr_not())
        return self.expr_cmp()

    def expr_cmp(self) -> A.Expr:
        left = self.expr_add()
        while True:
            t = self.peek()
            if t.kind == "PUNCT" and t.value in ("=", "<>", "<", "<=", ">", ">=", "=~"):
                self.next()
                left = A.BinaryOp(t.value, left, self.expr_add())
            elif self.at_kw("in"):
                self.next()
                left = A.BinaryOp("IN", left, self.expr_add())
            elif self.at_kw("starts"):
                self.next()
                self.eat_kw("with")
                left = A.BinaryOp("STARTS_WITH", left, self.expr_add())
            elif self.at_kw("ends"):
                self.next()
                self.eat_kw("with")
                left = A.BinaryOp("ENDS_WITH", left, self.expr_add())
            elif self.at_kw("contains"):
                self.next()
                left = A.BinaryOp("CONTAINS", left, self.expr_add())
            elif self.at_kw("is"):
                self.next()
                if self.try_kw("not"):
                    self.eat_kw("null")
                    left = A.UnaryOp("IS_NOT_NULL", left)
                else:
                    self.eat_kw("null")
                    left = A.UnaryOp("IS_NULL", left)
            else:
                return left

    def expr_add(self) -> A.Expr:
        left = self.expr_mul()
        while self.at_punct("+", "-"):
            op = self.next().value
            left = A.BinaryOp(op, left, self.expr_mul())
        return left

    def expr_mul(self) -> A.Expr:
        left = self.expr_pow()
        while self.at_punct("*", "/", "%"):
            op = self.next().value
            left = A.BinaryOp(op, left, self.expr_pow())
        return left

    def expr_pow(self) -> A.Expr:
        left = self.expr_unary()
        if self.at_punct("^"):
            self.next()
            return A.BinaryOp("^", left, self.expr_pow())  # right-assoc
        return left

    def expr_unary(self) -> A.Expr:
        if self.at_punct("-"):
            self.next()
            return A.UnaryOp("NEG", self.expr_unary())
        if self.at_punct("+"):
            self.next()
            return self.expr_unary()
        return self.expr_postfix()

    def expr_postfix(self) -> A.Expr:
        e = self.expr_atom()
        while True:
            if self.at_punct("."):
                self.next()
                e = A.Property(e, self.ident())
            elif self.at_punct("["):
                self.next()
                if self.try_punct(".."):  # x[..b]
                    end = None if self.at_punct("]") else self.expr()
                    self.eat_punct("]")
                    e = A.ListSlice(e, None, end)
                    continue
                first = self.expr()
                if self.try_punct(".."):
                    end = None if self.at_punct("]") else self.expr()
                    self.eat_punct("]")
                    e = A.ListSlice(e, first, end)
                else:
                    self.eat_punct("]")
                    e = A.ListIndex(e, first)
            else:
                return e

    def expr_atom(self) -> A.Expr:
        t = self.peek()
        if t.kind == "INT":
            self.next()
            return A.Literal(int(t.value))
        if t.kind == "FLOAT":
            self.next()
            return A.Literal(float(t.value))
        if t.kind == "STRING":
            self.next()
            return A.Literal(t.value)
        if t.kind == "PARAM":
            self.next()
            return A.Parameter(t.value)
        if t.kind == "KEYWORD":
            kv = t.value.lower()
            if kv == "null":
                self.next()
                return A.Literal(None)
            if kv == "true":
                self.next()
                return A.Literal(True)
            if kv == "false":
                self.next()
                return A.Literal(False)
            if kv == "case":
                return self.parse_case()
            if kv == "exists":
                return self.parse_exists()
            if kv == "count" and self.peek(1).kind == "PUNCT" and self.peek(1).value == "{":
                return self.parse_count_sub()
            if kv in ("any", "all", "none", "single"):
                return self.parse_quantifier()
            if kv == "reduce":
                return self.parse_reduce()
            if kv == "count":
                return self.parse_call_like()
        if t.kind == "IDENT":
            # namespaced function call: IDENT ('.' IDENT)* '(' — a dotted
            # chain ending in '(' is always a function (Cypher has no
            # method-call syntax), e.g. duration.between(...)
            j = 1
            while (
                self.peek(j).kind == "PUNCT"
                and self.peek(j).value == "."
                and self.peek(j + 1).kind in ("IDENT", "KEYWORD")
            ):
                j += 2
            if self.peek(j).kind == "PUNCT" and self.peek(j).value == "(":
                return self.parse_call_like()
            self.next()
            return A.Variable(t.value)
        if self.try_punct("("):
            e = self.expr()
            self.eat_punct(")")
            return e
        if self.at_punct("["):
            return self.parse_list_or_comprehension()
        if self.at_punct("{"):
            return A.MapLiteral(self.parse_prop_map())
        raise ParseError(f"unexpected token {t}")

    def parse_call_like(self) -> A.Expr:
        name = self.next().value.lower()
        while self.try_punct("."):
            name += "." + self.ident().lower()
        self.eat_punct("(")
        distinct = self.try_kw("distinct")
        args: list[A.Expr] = []
        if not self.at_punct(")"):
            if self.at_punct("*") and name == "count":
                self.next()
            else:
                args.append(self.expr())
                while self.try_punct(","):
                    args.append(self.expr())
        self.eat_punct(")")
        return A.FunctionCall(name, args, distinct)

    def parse_case(self) -> A.Expr:
        self.eat_kw("case")
        subject = None
        if not self.at_kw("when"):
            subject = self.expr()
        whens: list[tuple[A.Expr, A.Expr]] = []
        while self.try_kw("when"):
            cond = self.expr()
            self.eat_kw("then")
            whens.append((cond, self.expr()))
        default = self.expr() if self.try_kw("else") else None
        self.eat_kw("end")
        return A.CaseExpr(subject, whens, default)

    def parse_exists(self) -> A.Expr:
        self.eat_kw("exists")
        if self.try_punct("{"):
            self.try_kw("match")
            paths = [self.parse_path()]
            while self.try_punct(","):
                paths.append(self.parse_path())
            where = self.expr() if self.try_kw("where") else None
            self.eat_punct("}")
            return A.ExistsSubquery(paths, where)
        # exists(n.prop) legacy form
        self.eat_punct("(")
        e = self.expr()
        self.eat_punct(")")
        return A.UnaryOp("IS_NOT_NULL", e)

    def parse_count_sub(self) -> A.Expr:
        self.eat_kw("count")
        self.eat_punct("{")
        self.try_kw("match")
        paths = [self.parse_path()]
        while self.try_punct(","):
            paths.append(self.parse_path())
        where = self.expr() if self.try_kw("where") else None
        self.eat_punct("}")
        return A.CountSubquery(paths, where)

    def parse_quantifier(self) -> A.Expr:
        kind = self.next().value.lower()
        self.eat_punct("(")
        var = self.ident()
        self.eat_kw("in")
        source = self.expr()
        self.eat_kw("where")
        pred = self.expr()
        self.eat_punct(")")
        return A.QuantifiedPredicate(kind, var, source, pred)

    def parse_reduce(self) -> A.Expr:
        self.eat_kw("reduce")
        self.eat_punct("(")
        acc = self.ident()
        self.eat_punct("=")
        init = self.expr()
        self.eat_punct(",")
        var = self.ident()
        self.eat_kw("in")
        source = self.expr()
        self.eat_punct("|")
        body = self.expr()
        self.eat_punct(")")
        return A.ReduceExpr(acc, init, var, source, body)

    def parse_list_or_comprehension(self) -> A.Expr:
        self.eat_punct("[")
        if self.at_punct("]"):
            self.next()
            return A.ListLiteral([])
        # backtracking lookahead: [ (pattern) ... | proj ] -> pattern
        # comprehension (needs >=1 relationship, and a | projection)
        if self.at_punct("("):
            save = self.i
            try:
                path = self.parse_path_body()
                if path.edges and (self.at_kw("where") or self.at_punct("|")):
                    where = self.expr() if self.try_kw("where") else None
                    self.eat_punct("|")
                    proj = self.expr()
                    self.eat_punct("]")
                    return A.PatternComprehension(path, where, proj)
                self.i = save
            except ParseError:
                self.i = save
        # lookahead: IDENT IN -> comprehension
        if (
            self.peek().kind == "IDENT"
            and self.peek(1).kind == "KEYWORD"
            and self.peek(1).value.lower() == "in"
        ):
            var = self.ident()
            self.next()  # IN
            source = self.expr()
            where = self.expr() if self.try_kw("where") else None
            proj = self.expr() if self.try_punct("|") else None
            self.eat_punct("]")
            return A.ListComprehension(var, source, where, proj)
        items = [self.expr()]
        while self.try_punct(","):
            items.append(self.expr())
        self.eat_punct("]")
        return A.ListLiteral(items)


def parse(text: str) -> A.Query:
    return Parser(text).parse()
