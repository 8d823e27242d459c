"""samyama_graph_spark — a PySpark-native property-graph analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of samyama-ai/samyama-graph (a Rust in-memory graph +
vector database; studied read-only) on top of Apache Spark:

- Property graph data model as two DataFrames (``nodes``, ``edges``)
  with GraphFrames-style column conventions.
- An OpenCypher-style query front-end (parser -> pattern graph ->
  DataFrame-expression compiler) that emits declarative Spark plans
  and lets Catalyst do logical/physical optimization.
- Graph algorithms (PageRank, WCC, BFS, SSSP, triangle count, LCC,
  CDLP, ...) as Pregel-style DataFrame iteration.
- Vector k-NN search (exact brute-force cosine/L2/dot + LSH at scale).
- Large-scale training-data pipeline operators: dedup (exact /
  MinHash-LSH / SimHash / n-gram Jaccard / embedding near-dup),
  similarity search, text analysis, multimodal column plumbing.

Everything is DataFrame-first: no collect() in query paths, joins are
broadcast-hinted where a side is dimension-sized, aggregations rely on
Catalyst partial aggregation, and iteration checkpoints lineage.
"""

from samyama_graph_spark.graph import PropertyGraph
from samyama_graph_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["PropertyGraph", "get_spark", "__version__"]
