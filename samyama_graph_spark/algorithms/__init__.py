"""Graph algorithms as Pregel-style DataFrame iteration.

Re-expresses the reference's algorithm library
(crates/samyama-graph-algorithms: pagerank.rs, community.rs,
pathfinding.rs, cdlp.rs, lcc.rs, topology.rs) on Spark DataFrames:
message passing = join edges with vertex state on src, aggregate by
dst; iteration = a driver loop with localCheckpoint() to truncate
lineage.  No collect() of vertex state — only scalar convergence
checks cross the driver boundary.
"""

from samyama_graph_spark.algorithms.components import cdlp, wcc
from samyama_graph_spark.algorithms.pagerank import pagerank
from samyama_graph_spark.algorithms.paths import bfs, shortest_path_length, sssp
from samyama_graph_spark.algorithms.pca import PcaModel, pca_fit, pca_transform
from samyama_graph_spark.algorithms.scc import scc
from samyama_graph_spark.algorithms.topology import lcc, triangle_count

__all__ = [
    "pagerank",
    "wcc",
    "scc",
    "cdlp",
    "bfs",
    "sssp",
    "shortest_path_length",
    "triangle_count",
    "lcc",
    "PcaModel",
    "pca_fit",
    "pca_transform",
]
