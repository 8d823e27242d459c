"""Cypher scalar + aggregate function library -> Spark Column builders.

Mirrors the reference's fixed eval_function dispatch
(operator.rs:838-1571, listed in SURVEY.md §2.2) with Spark built-ins;
names are case-insensitive.  Aggregates are tagged so the compiler can
detect implicit GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

AGGREGATES = {
    "count", "sum", "avg", "min", "max", "collect", "stdev", "stdevp",
    "percentilecont", "percentiledisc",
}

# Names that double as SCALARS over a literal list argument
# (reference +1444-1464 stubs these to degenerate fallbacks; computed
# properly here, like the other parse-only features)
LIST_SCALAR_AGGS = {"stdev", "stdevp", "percentilecont", "percentiledisc"}


def list_scalar_agg(name: str, arr: Column, p: Column | None) -> Column:
    """percentileCont/Disc and stDev/stDevP applied to an in-row list."""
    a = F.transform(arr, lambda x: x.cast("double"))
    n = F.size(a)
    nd = n.cast("double")
    if name in ("stdev", "stdevp"):
        total = F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x)
        mean = total / nd
        ss = F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + (x - mean) * (x - mean)
        )
        denom = nd if name == "stdevp" else nd - 1
        return F.when(denom <= 0, F.lit(0.0)).otherwise(F.sqrt(ss / denom))
    s = F.sort_array(a)
    if name == "percentiledisc":
        # smallest value whose cumulative relative rank reaches p
        idx = F.greatest(F.ceil(p * nd), F.lit(1)).cast("int")
        return F.when(n == 0, F.lit(None)).otherwise(F.element_at(s, idx))
    rank = p * (nd - 1)
    lo = F.floor(rank).cast("int")
    hi = F.ceil(rank).cast("int")
    vlo = F.element_at(s, lo + 1)
    vhi = F.element_at(s, hi + 1)
    return F.when(n == 0, F.lit(None)).otherwise(
        vlo + (vhi - vlo) * (rank - lo.cast("double"))
    )


def aggregate_fn(name: str, col: Column | None, distinct: bool, extra=None) -> Column:
    n = name.lower()
    if n == "count":
        if col is None:
            return F.count(F.lit(1))
        return F.count_distinct(col) if distinct else F.count(col)
    if distinct:
        col = None if col is None else col  # DISTINCT only affects count/collect
    if n == "sum":
        return F.sum(col)
    if n == "avg":
        return F.avg(col)
    if n == "min":
        return F.min(col)
    if n == "max":
        return F.max(col)
    if n == "collect":
        return F.collect_set(col) if distinct else F.collect_list(col)
    if n == "stdev":
        return F.stddev_samp(col)
    if n == "stdevp":
        return F.stddev_pop(col)
    if n == "percentilecont":
        return F.percentile(col, extra)
    if n == "percentiledisc":
        # exact discrete percentile: smallest value whose cumulative
        # relative rank reaches p (matches percentile_disc semantics)
        raise NotImplementedError(
            "percentileDisc needs the SQL form percentile_disc(...) WITHIN "
            "GROUP — use spark.sql or the DataFrame API (agg_stats workload)"
        )
    raise KeyError(name)


def _haversin(x: Column) -> Column:
    return (1 - F.cos(x)) / 2


def _scalar_table():
    return {
        # strings (reference +841-901)
        "toupper": lambda a: F.upper(a),
        "touppercase": lambda a: F.upper(a),
        "tolower": lambda a: F.lower(a),
        "tolowercase": lambda a: F.lower(a),
        "trim": lambda a: F.trim(a),
        "ltrim": lambda a: F.ltrim(a),
        "rtrim": lambda a: F.rtrim(a),
        "replace": lambda a, b, c: F.replace(a, b, c),
        "substring": lambda a, b, c=None: (
            F.substring(a, b + F.lit(1), c) if c is not None
            else a.substr(b + F.lit(1), F.length(a))
        ),
        "left": lambda a, b: F.substring(a, 1, b),
        "right": lambda a, b: a.substr(F.length(a) - b + 1, b),
        "reverse": lambda a: F.reverse(a),
        "split": lambda a, b: F.split(a, b),
        "tostring": lambda a: a.cast("string"),
        "tostringornull": lambda a: a.try_cast("string"),
        # conversions (+921-932, +1530-1570): strict variants error on
        # unparseable input in the reference — ANSI cast matches; the
        # OrNull variants yield null -> try_cast
        "tointeger": lambda a: a.cast("long"),
        "toint": lambda a: a.cast("long"),
        "tointegerornull": lambda a: a.try_cast("long"),
        "tofloat": lambda a: a.cast("double"),
        "tofloatornull": lambda a: a.try_cast("double"),
        "toboolean": lambda a: a.cast("boolean"),
        "tobooleanornull": lambda a: a.try_cast("boolean"),
        # math (+976-1050, +1465-1487)
        "abs": F.abs,
        "ceil": lambda a: F.ceil(a).cast("long"),
        "floor": lambda a: F.floor(a).cast("long"),
        "round": lambda a, b=None: F.round(a, 0) if b is None else F.round(a, b),
        "sqrt": F.sqrt,
        "sign": lambda a: F.signum(a).cast("long"),
        "log": F.log,
        "log10": F.log10,
        "exp": F.exp,
        "sin": F.sin,
        "cos": F.cos,
        "tan": F.tan,
        "cot": lambda a: 1 / F.tan(a),
        "asin": F.asin,
        "acos": F.acos,
        "atan": F.atan,
        "atan2": F.atan2,
        "sinh": F.sinh,
        "cosh": F.cosh,
        "tanh": F.tanh,
        "degrees": F.degrees,
        "radians": F.radians,
        "pi": lambda: F.lit(3.141592653589793),
        "e": lambda: F.exp(F.lit(1.0)),
        "haversin": _haversin,
        "isnan": F.isnan,
        "rand": lambda: F.rand(),
        # lists / collections (+944-975, +1058-1084, +1121-1174)
        "size": lambda a: F.size(a).cast("long"),
        "length": lambda a: F.size(a).cast("long"),
        # get(): 0-based and NULL on out-of-bounds — head([])/last([])
        # must be NULL (reference operator.rs list semantics), while
        # element_at raises under ANSI mode for invalid indices
        "head": lambda a: F.get(a, 0),
        "last": lambda a: F.get(a, F.size(a) - 1),
        "tail": lambda a: F.slice(a, 2, F.greatest(F.size(a) - 1, F.lit(0))),
        "range": lambda a, b, c=None: F.sequence(a, b, c if c is not None else F.lit(1)),
        "coalesce": lambda *xs: F.coalesce(*xs),
        "keys": lambda a: F.map_keys(a),
        "isempty": lambda a: F.size(a) == 0,
        # graph-specific (+1047-1120, +1489-1530) — struct-field access;
        # id/labels/type/startNode/endNode handled by the compiler since
        # they need variable metadata.
        "randomuuid": lambda: F.expr("uuid()"),
        "timestamp": lambda: (F.unix_timestamp() * 1000).cast("long"),
        # temporal (+1196-1410)
        "date": lambda a=None: F.current_date() if a is None else F.to_date(a),
        "datetime": lambda a=None: (
            F.current_timestamp() if a is None else F.to_timestamp(a)
        ),
        "localdatetime": lambda a=None: (
            F.current_timestamp() if a is None else F.to_timestamp(a)
        ),
    }


SCALARS = _scalar_table()
