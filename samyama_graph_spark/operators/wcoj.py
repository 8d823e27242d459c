"""Worst-case-optimal cycle join via adjacency intersection.

The reference executes dense cyclic patterns with a LeapFrog TrieJoin
(leapfrog.rs:265): per output prefix it intersects sorted adjacency
ranges, so no wedge (open two-path) is ever materialized.  A binary
join plan for a triangle ``(a)-->(b)-->(c)-->(a)`` materializes and
shuffles every wedge first — at 100 TB the wedge count (sum over b of
indeg(b)*outdeg(b)) dwarfs both the input and the output, and that
shuffle is the scale-killer AGE/Neo4j-style engines avoid with WCOJ.

Spark-first equivalent (this module): reduce each pattern edge to a
distinct-pair frame with a multiplicity count, turn one side into
grouped adjacency arrays and another into a per-vertex hash map
(``map_from_entries``), and compute the closing intersection with a
JVM-side higher-order ``filter`` + ``element_at`` probe inside
whole-stage codegen.  Shuffled volume is bounded by the distinct edge
pairs plus the output: the wedge stream exists only transiently inside
the generated loop, never as a shuffle or a materialized frame —
exactly the LFTJ guarantee, re-expressed in Catalyst terms.

Semantics parity with the binary-join plan: Cypher binds one result
row per *edge combination* (no relationship-uniqueness anti-join in
this engine, matching the reference executor), so each (a, b, c)
binding carries multiplicity cnt1*cnt2*cnt3 over the deduplicated pair
frames; ``explode(sequence(1, mult))`` restores the exact row multiset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Collapse an edge frame to distinct (u, v) pairs with an edge
    count.  The WCOJ plan operates on pairs; multiplicity is restored
    multiplicatively at the end."""
    return (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def triangle_intersection(
    p1: DataFrame, p2: DataFrame, p3: DataFrame
) -> DataFrame:
    """Triangle bindings for the cycle a-(p1)->b-(p2)->c-(p3)->a.

    Inputs are pair-count frames (columns u, v, cnt) as produced by
    :func:`pair_counts`, oriented in pattern direction.  Returns
    ``(a, b, c, mult)`` where ``mult`` is the number of distinct edge
    combinations realizing the binding.

    Plan shape (all JVM-side, no Python boundary):

    - ``p2`` grouped to adjacency arrays keyed by its source vertex;
    - ``p3`` grouped to a per-target-vertex hash map (closing edge);
    - ``p1`` joins both on its endpoints, then the candidate set for
      ``c`` is ``filter(adj(b), x -> element_at(map(a), x.v) != null)``
      — an O(outdeg(b)) probe loop with O(1) hash lookups, fused into
      whole-stage codegen.  Non-closing wedges die inside the loop;
      they are never shuffled, never row-materialized.
    """
    adj2 = p2.groupBy(F.col("u").alias("__b")).agg(
        F.collect_list(F.struct(F.col("v").alias("w"), F.col("cnt").alias("c2"))).alias(
            "__adj"
        )
    )
    # per (c, a) pairs are already distinct after pair_counts, so the
    # map keys (c for a given a) are unique — map_from_entries is safe
    close3 = p3.groupBy(F.col("v").alias("__a")).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("u"), F.col("cnt")))
        ).alias("__close")
    )
    hits = (
        p1.join(adj2, F.col("v") == F.col("__b"))
        .join(close3, F.col("u") == F.col("__a"))
        .select(
            F.col("u").alias("a"),
            F.col("v").alias("b"),
            F.col("cnt").alias("c1"),
            F.col("__close"),
            F.explode(
                F.filter(
                    F.col("__adj"),
                    lambda x: F.element_at(F.col("__close"), x["w"]).isNotNull(),
                )
            ).alias("__hit"),
        )
    )
    return hits.select(
        "a",
        "b",
        F.col("__hit.w").alias("c"),
        (
            F.col("c1")
            * F.col("__hit.c2")
            * F.element_at(F.col("__close"), F.col("__hit.w"))
        ).alias("mult"),
    )


def expand_multiplicity(tri: DataFrame) -> DataFrame:
    """Restore the exact Cypher row multiset from (a, b, c, mult):
    one output row per realizing edge combination."""
    return tri.withColumn(
        "__dup", F.explode(F.sequence(F.lit(1), F.col("mult").cast("int")))
    ).drop("mult", "__dup")
