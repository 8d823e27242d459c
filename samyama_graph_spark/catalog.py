"""Index/constraint DDL catalog.

In the reference, CREATE INDEX builds a B-tree / HNSW structure
(operator.rs:5248-5785).  On Spark, parquet min/max statistics,
dictionary encoding, and partition pruning serve the B-tree's role,
and vector search is brute-force/LSH — so index DDL becomes metadata:
recorded so SHOW INDEXES / SHOW CONSTRAINTS round-trip, and usable as
*physical layout hints* (a property index suggests sorting/bucketing
the table by that column at write time).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class IndexDef:
    name: str
    label: str
    properties: list[str]
    kind: str = "range"  # range | vector | composite
    options: dict = field(default_factory=dict)


@dataclass
class ConstraintDef:
    name: str
    label: str
    properties: list[str]
    kind: str = "unique"


class Catalog:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.indexes: dict[str, IndexDef] = {}
        self.constraints: dict[str, ConstraintDef] = {}
        # bumped on every catalog mutation; compiled-plan caches key on
        # it so an index/constraint change invalidates stale plans
        self.version = 0

    # ------------------------------------------------------------ indexes
    def create_index(
        self, label: str, properties: list[str], kind: str = "range",
        name: str | None = None, options: dict | None = None,
    ) -> IndexDef:
        name = name or f"idx_{label.lower()}_{'_'.join(p.lower() for p in properties)}"
        idx = IndexDef(name, label, list(properties), kind, options or {})
        self.indexes[name] = idx
        self.version += 1
        return idx

    def create_vector_index(
        self, label: str, prop: str, dim: int | None = None,
        metric: str = "cosine", name: str | None = None,
    ) -> IndexDef:
        return self.create_index(
            label, [prop], kind="vector",
            name=name, options={"dim": dim, "metric": metric},
        )

    def drop_index(self, name: str) -> bool:
        self.version += 1
        return self.indexes.pop(name, None) is not None

    def build_vector_index_layout(
        self, graph, name: str, path: str, nlist: int = 16, nprobe: int = 4
    ) -> IndexDef:
        """Materialize a vector index's at-rest IVF layout and wire it
        into the planner: after this, db.index.vector.queryNodes on the
        indexed (label, prop) routes to the cell-partitioned parquet
        (partition-pruned probe, similarity.knn_ivf_partitioned)
        instead of the brute-force scan — the Spark analogue of the
        reference building an HNSW structure on CREATE VECTOR INDEX
        (vector/index.rs:136 persists per-index config the same way).

        Centroids are the embeddings of the ``nlist`` lowest node ids
        (the deterministic knn_ivf convention); parameters persist in
        the layout's ``_meta`` record and in the IndexDef options."""
        from pyspark.sql import functions as F

        from samyama_graph_spark.datapipe.similarity import (
            ivf_write_partitioned,
        )

        from samyama_graph_spark.cypher.procedures import _normalize_metric

        idx = self.indexes[name]
        if idx.kind != "vector":
            raise ValueError(f"index {name} is not a vector index")
        prop = idx.properties[0]
        # normalize EXACTLY like the queryNodes read path, or a layout
        # built on 'euclidean'/'inner_product' spellings would fail
        # every probe's _meta validation
        metric = _normalize_metric(idx.options.get("metric") or "cosine")
        nodes = graph.node_df(idx.label).filter(F.col(prop).isNotNull())
        cents = [
            [float(x) for x in r[prop]]
            for r in nodes.select("id", prop).orderBy("id").limit(nlist).collect()
        ]
        ivf_write_partitioned(nodes, prop, cents, path, metric=metric)
        idx.options.update(
            {"layout_path": path, "nlist": nlist, "nprobe": nprobe}
        )
        self.version += 1
        return idx

    def show_indexes(self) -> DataFrame:
        from samyama_graph_spark.graph import local_string_frame

        rows = [
            (i.name, i.label, ",".join(i.properties), i.kind)
            for i in sorted(self.indexes.values(), key=lambda x: x.name)
        ]
        return local_string_frame(
            self.spark, rows, ["name", "label", "properties", "kind"]
        )

    # -------------------------------------------------------- constraints
    def create_constraint(
        self, label: str, properties: list[str], kind: str = "unique",
        name: str | None = None,
    ) -> ConstraintDef:
        name = name or f"c_{label.lower()}_{'_'.join(p.lower() for p in properties)}"
        c = ConstraintDef(name, label, list(properties), kind)
        self.constraints[name] = c
        self.version += 1
        return c

    def show_constraints(self) -> DataFrame:
        from samyama_graph_spark.graph import local_string_frame

        rows = [
            (c.name, c.label, ",".join(c.properties), c.kind)
            for c in sorted(self.constraints.values(), key=lambda x: x.name)
        ]
        return local_string_frame(
            self.spark, rows, ["name", "label", "properties", "kind"]
        )

    def validate_constraint(self, graph, name: str) -> DataFrame:
        """Violations of a uniqueness constraint: rows whose key repeats."""
        from pyspark.sql import functions as F

        c = self.constraints[name]
        df = graph.node_df(c.label)
        return (
            df.groupBy(*c.properties)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
        )
