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

    # ------------------------------------------------------------ indexes
    def create_index(
        self, label: str, properties: list[str], kind: str = "range",
        name: str | None = None, options: dict | None = None,
    ) -> IndexDef:
        name = name or f"idx_{label.lower()}_{'_'.join(p.lower() for p in properties)}"
        idx = IndexDef(name, label, list(properties), kind, options or {})
        self.indexes[name] = idx
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
        return self.indexes.pop(name, None) is not None

    def show_indexes(self) -> DataFrame:
        rows = [
            (i.name, i.label, ",".join(i.properties), i.kind)
            for i in sorted(self.indexes.values(), key=lambda x: x.name)
        ]
        return self.spark.createDataFrame(
            rows or [(None, None, None, None)],
            "name string, label string, properties string, kind string",
        ).filter("name IS NOT NULL")

    # -------------------------------------------------------- constraints
    def create_constraint(
        self, label: str, properties: list[str], kind: str = "unique",
        name: str | None = None,
    ) -> ConstraintDef:
        name = name or f"c_{label.lower()}_{'_'.join(p.lower() for p in properties)}"
        c = ConstraintDef(name, label, list(properties), kind)
        self.constraints[name] = c
        return c

    def show_constraints(self) -> DataFrame:
        rows = [
            (c.name, c.label, ",".join(c.properties), c.kind)
            for c in sorted(self.constraints.values(), key=lambda x: x.name)
        ]
        return self.spark.createDataFrame(
            rows or [(None, None, None, None)],
            "name string, label string, properties string, kind string",
        ).filter("name IS NOT NULL")

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
