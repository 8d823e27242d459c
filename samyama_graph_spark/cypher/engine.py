"""CypherEngine: the user-facing query API.

``CypherEngine(graph).query("MATCH ...", params)`` returns a
DataFrame.  Parsed ASTs are memo-cached on normalized query text —
the Spark analogue of the reference's LRU AST cache
(src/query/mod.rs:131-190); Catalyst separately caches analyzed
plans.  ``explain()`` surfaces the physical plan (EXPLAIN/PROFILE,
executor/mod.rs:185-215).
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame

from samyama_graph_spark.cypher.compiler import Compiler
from samyama_graph_spark.cypher.parser import parse
from samyama_graph_spark.graph import PropertyGraph

_WS = re.compile(r"\s+")


class CypherEngine:
    def __init__(self, graph: PropertyGraph, cache_size: int = 1024):
        self.graph = graph
        self._ast_cache: dict[str, Any] = {}
        self._cache_size = cache_size

    def _parse_cached(self, text: str):
        key = _WS.sub(" ", text.strip())
        ast = self._ast_cache.get(key)
        if ast is None:
            ast = parse(text)
            if len(self._ast_cache) >= self._cache_size:
                self._ast_cache.pop(next(iter(self._ast_cache)))
            self._ast_cache[key] = ast
        return ast

    def query(self, text: str, params: dict[str, Any] | None = None) -> DataFrame:
        """Read query -> result DataFrame.  Queries containing write
        clauses are routed to the write executor; the summary counters
        DataFrame is returned and the session graph is swapped to the
        new version (MutQueryExecutor equivalent)."""
        from samyama_graph_spark.cypher.writes import WriteExecutor, has_write_clause

        ast = self._parse_cached(text)
        if len(ast.parts) == 1 and has_write_clause(ast.parts[0]):
            new_graph, summary = WriteExecutor(self.graph, params).execute(
                ast.parts[0]
            )
            self.graph = new_graph
            return summary
        return Compiler(self.graph, params).compile_query(ast)

    def explain(self, text: str, params: dict[str, Any] | None = None) -> str:
        df = self.query(text, params)
        return df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
