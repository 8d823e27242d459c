"""OpenCypher-style query front-end.

Pipeline: Cypher text -> lexer/parser (recursive descent, porting the
grammar *surface* of the reference's pest PEG, src/query/cypher.pest
— not its code) -> AST -> pattern compiler that emits a declarative
DataFrame plan.  Catalyst then does all logical/physical optimization
(predicate pushdown, column pruning, join strategy) — our compiler
only decides pattern join order and clause chaining, mirroring the
division of labor described in SURVEY.md §3-4.
"""

from samyama_graph_spark.cypher.engine import CypherEngine

__all__ = ["CypherEngine"]
