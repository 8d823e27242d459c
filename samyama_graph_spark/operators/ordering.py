"""Mixed-type total ORDER BY for dynamic value columns.

The reference defines one total order across ALL PropertyValue types
(property.rs:109-142): Null < Boolean < Integer < Float < String <
DateTime < Array (< Map), comparing WITHIN a type only — an Integer
always sorts before a Float regardless of magnitude (strict type
rank, no numeric interleaving), and floats use total_cmp so NaN is
orderable (after +inf).

Spark columns are statically typed, so mixed-type values only arise in
variant-shaped data (e.g. a property bag where different rows carry
different types).  The convention here: a VARIANT is a struct with at
most one non-null typed field per row:

    struct(b: boolean, i: long, f: double, s: string,
           t: timestamp, arr: array<string>)

``variant()`` builds one from typed columns; ``mixed_sort_key()``
produces an orderable struct ``(rank, b, i, f, s, t, arr)`` whose
ascending sort IS the reference's total order.  Everything stays a
Catalyst struct comparison — codegen'd, shuffle-safe, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# type ranks per property.rs:109-142
_RANKS = {"null": 0, "boolean": 1, "integer": 2, "float": 3,
          "string": 4, "datetime": 5, "array": 6}

_FIELDS = ("b", "i", "f", "s", "t", "arr")


def variant(
    b: Column | None = None,
    i: Column | None = None,
    f: Column | None = None,
    s: Column | None = None,
    t: Column | None = None,
    arr: Column | None = None,
) -> Column:
    """Pack typed columns into the variant struct (at most one non-null
    per row is the caller's contract)."""
    return F.struct(
        (b if b is not None else F.lit(None).cast("boolean")).alias("b"),
        (i if i is not None else F.lit(None).cast("long")).alias("i"),
        (f if f is not None else F.lit(None).cast("double")).alias("f"),
        (s if s is not None else F.lit(None).cast("string")).alias("s"),
        (t if t is not None else F.lit(None).cast("timestamp")).alias("t"),
        (arr if arr is not None else F.lit(None).cast("array<string>")).alias(
            "arr"
        ),
    )


def mixed_sort_key(v: Column) -> Column:
    """Orderable struct implementing the cross-type total order.

    rank = type tag (Null 0 .. Array 6); the per-type payload fields
    are null except the matching one, and Spark's struct comparison
    (field by field, nulls FIRST ascending) then compares within the
    type.  Floats: Spark sorts NaN greater than any value — matching
    total_cmp for the NaN-positive case the reference documents
    (property.rs:42-48).
    """
    rank = (
        F.when(v["b"].isNotNull(), F.lit(_RANKS["boolean"]))
        .when(v["i"].isNotNull(), F.lit(_RANKS["integer"]))
        .when(v["f"].isNotNull(), F.lit(_RANKS["float"]))
        .when(v["s"].isNotNull(), F.lit(_RANKS["string"]))
        .when(v["t"].isNotNull(), F.lit(_RANKS["datetime"]))
        .when(v["arr"].isNotNull(), F.lit(_RANKS["array"]))
        .otherwise(F.lit(_RANKS["null"]))
    )
    return F.struct(
        rank.alias("rank"),
        *[v[fld].alias(fld) for fld in _FIELDS],
    )


def order_mixed(df, variant_col: str, ascending: bool = True):
    """ORDER BY a variant column under the reference's total order."""
    key = mixed_sort_key(F.col(variant_col))
    return df.orderBy(key.asc() if ascending else key.desc())
