"""Similarity search over embedding columns.

Reference parity: the vector subsystem (src/vector/index.rs; HNSW
search :196-258, metrics L2/Cosine/InnerProduct :71-77) exposed as
``db.index.vector.queryNodes(label, prop, vec, k)``.  HNSW is a
single-node in-memory structure; the Spark-native equivalents are:

- exact brute-force top-k (distributed scan + TakeOrderedAndProject):
  the correctness baseline, and at 100TB often the right answer when
  the query batch is large (one pass scores everything);
- random-hyperplane LSH bucketing for sub-scan candidate retrieval,
  re-ranked exactly — the scale path for selective queries.

All arithmetic is double precision through zip_with/aggregate HOFs
(JVM codegen, no Python).
"""

from __future__ import annotations



from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


_METRICS = {"cosine": cosine, "l2": l2, "dot": dot}


def _score(metric: str, v: Column, q: Column) -> tuple[Column, bool]:
    """(score column, descending?) — L2 ranks ascending, others descending."""
    if metric not in _METRICS:
        raise ValueError(f"metric must be one of {sorted(_METRICS)}")
    return _METRICS[metric](v, q), metric != "l2"


def knn_bruteforce(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k: ``(id, score)``, deterministic tie-break on id.

    The orderBy+limit compiles to TakeOrderedAndProject: each
    partition keeps a k-heap, the driver merges k*partitions rows —
    no global sort, scales linearly with the scan.
    """
    q = F.lit(query_vec).cast("array<double>")
    v = F.col(vec_col).cast("array<double>")
    score, desc = _score(metric, v, q)
    scored = df.select(F.col(id_col).alias("id"), score.alias("score"))
    order = [F.desc("score") if desc else F.asc("score"), F.asc("id")]
    return scored.orderBy(*order).limit(k)


def _hyperplanes(dim: int, num_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG; no numpy needed at
    plan-build time so plans stay serializable/repeatable)."""
    state = seed
    planes = []
    for _ in range(num_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append((state / float(1 << 63)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit i = sign(v · plane_i)."""
    bits = [
        F.when(dot(vec, F.lit(p).cast("array<double>")) >= 0, 1 << i).otherwise(0)
        for i, p in enumerate(planes)
    ]
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out.cast("long")


def component_sign_tables(
    dim: int, num_tables: int, num_planes: int
) -> list[list[list[float]]]:
    """Axis-aligned LSH family: table t's planes are the unit basis
    vectors e_{t*P+i} (wrapping past dim), so bucket bits are raw
    component signs.  Weaker than random hyperplanes for correlated
    dimensions but fully reproducible in plain SQL
    (``embedding[j] >= 0``) — oracle-checked workloads use it so the
    driver's DuckDB gate can recompute the exact candidate set."""
    tables = []
    j = 0
    for _t in range(num_tables):
        planes = []
        for _i in range(num_planes):
            v = [0.0] * dim
            v[j % dim] = 1.0
            j += 1
            planes.append(v)
        tables.append(planes)
    return tables


def knn_lsh(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    metric: str = "cosine",
    num_planes: int = 4,
    num_tables: int = 16,
    seed: int = 42,
    tables: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Approximate top-k: probe ``num_tables`` hyperplane-LSH tables,
    union candidates whose bucket matches the query's, re-rank
    exactly.  The scan prunes to matching buckets (a partition-
    prunable filter once bucket ids are materialized as a partition
    column at write time).  ``tables`` overrides the pseudo-random
    planes with an explicit per-table plane list (e.g.
    component_sign_tables for SQL-reproducible bucketing)."""
    dim = len(query_vec)
    v = F.col(vec_col).cast("array<double>")
    # ONE scan: evaluate all tables' signatures in a single projection
    # and keep rows matching the query bucket in any table (rather than
    # unioning num_tables filtered scans).  At rest, these signatures
    # would be precomputed write-time columns (partition-prunable).
    #
    # All num_tables*num_planes plane vectors ship inside ONE SQL
    # expression string (two F.expr calls total) — building per-plane
    # Column literals costs thousands of py4j round-trips (measured
    # 3-5s of pure driver time for 16x4 planes at dim=64 vs ~50ms for
    # the textual form; both plan identically).
    if tables is not None:
        num_tables = len(tables)
        num_planes = len(tables[0])
    all_planes: list[list[float]] = []
    qbits: list[bool] = []
    for t in range(num_tables):
        planes = (
            tables[t] if tables is not None
            else _hyperplanes(dim, num_planes, seed + t * 1000)
        )
        all_planes.extend(planes)
        for p in planes:
            qbits.append(sum(x * y for x, y in zip(query_vec, p)) >= 0)
    def dot_sql(p: list[float]) -> str:
        hot = [i for i, x in enumerate(p) if x != 0.0]
        if len(hot) == 1 and p[hot[0]] == 1.0:
            # one-hot plane: the dot is just that component
            return f"cast(`{vec_col}`[{hot[0]}] as double)"
        arr = "array(" + ",".join(repr(x) for x in p) + ")"
        return (
            f"aggregate(zip_with({arr}, cast(`{vec_col}` as array<double>), "
            "(x, y) -> x * y), cast(0.0 as double), (acc, d) -> acc + d)"
        )

    # flat codegen-able aggregates with short-circuit AND/OR — nesting
    # the dots inside a transform() lambda forces the interpreted HOF
    # path (~6x slower execution, measured)
    match_sql = " OR ".join(
        "("
        + " AND ".join(
            f"{dot_sql(all_planes[t * num_planes + i])} "
            + (">= 0" if qbits[t * num_planes + i] else "< 0")
            for i in range(num_planes)
        )
        + ")"
        for t in range(num_tables)
    )
    cands = df.filter(F.expr(match_sql))
    return knn_bruteforce(cands, vec_col, id_col, query_vec, k, metric)


def knn_join_bruteforce(
    left: DataFrame,
    right: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    metric: str = "cosine",
) -> DataFrame:
    """Batch k-NN join: for every left row, its top-k right rows —
    ``(x, y, score, rn)``.  Cross-join scored then window top-k; use
    only with a blocked/bucketed right side at scale."""
    from pyspark.sql import Window

    va = F.col(vec_col).cast("array<double>")
    a = left.select(F.col(id_col).alias("x"), va.alias("vx"))
    b = right.select(F.col(id_col).alias("y"), va.alias("vy"))
    if metric == "cosine":
        # hoist per-ROW norms above the pair join: pair scoring is then
        # one dot instead of dot + two norms (bit-identical value)
        a = a.withColumn("nx", norm(F.col("vx")))
        b = b.withColumn("ny", norm(F.col("vy")))
        score = dot(F.col("vx"), F.col("vy")) / (F.col("nx") * F.col("ny"))
        desc = True
    else:
        score, desc = _score(metric, F.col("vx"), F.col("vy"))
    scored = a.crossJoin(b).select("x", "y", score.alias("score"))
    w = Window.partitionBy("x").orderBy(
        F.desc("score") if desc else F.asc("score"), F.asc("y")
    )
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def knn_join_lsh(
    left: DataFrame,
    right: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    metric: str = "cosine",
    tables: list[list[list[float]]] | None = None,
    dim: int | None = None,
    num_tables: int = 8,
    num_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Blocked batch k-NN join — the scale-safe DEFAULT for joining
    two vector tables: LSH-bucket BOTH sides, equi-join per (table,
    bucket), dedup candidate pairs, exact re-rank, top-k per left row:
    ``(x, y, score, rn)``.

    Candidate volume is the sum of per-bucket products — never the
    all-pairs cross product (knn_join_bruteforce stays available as
    the exact small-side fallback).  Approximate: recall rises with
    ``num_tables``.  The bucket join shuffles both sides on
    (table, bucket) — at rest, signatures become write-time partition
    columns and the join is co-located.
    """
    from pyspark.sql import Window

    if tables is None:
        if dim is None:
            first = left.select(F.size(vec_col).alias("d")).first()
            dim = int(first["d"])
        tables = [
            _hyperplanes(dim, num_planes, seed + t * 1000)
            for t in range(num_tables)
        ]

    def bucket_sql(planes: list[list[float]]) -> str:
        def dot_sql(p: list[float]) -> str:
            hot = [i for i, x in enumerate(p) if x != 0.0]
            if len(hot) == 1 and p[hot[0]] == 1.0:
                return f"cast(`{vec_col}`[{hot[0]}] as double)"
            arr = "array(" + ",".join(repr(x) for x in p) + ")"
            return (
                f"aggregate(zip_with({arr}, cast(`{vec_col}` as "
                "array<double>), (x, y) -> x * y), cast(0.0 as double), "
                "(acc, d) -> acc + d)"
            )

        return " + ".join(
            f"(CASE WHEN {dot_sql(p)} >= 0 THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes)
        )

    sig = (
        "array("
        + ",".join(
            f"struct({t} AS t, cast({bucket_sql(planes)} AS long) AS b)"
            for t, planes in enumerate(tables)
        )
        + ")"
    )

    hoist = metric == "cosine"

    def side(df: DataFrame, id_out: str, vec_out: str, n_out: str) -> DataFrame:
        out = df.select(
            F.col(id_col).alias(id_out),
            F.col(vec_col).cast("array<double>").alias(vec_out),
            F.explode(F.expr(sig)).alias("tb"),
        )
        cols = [id_out, vec_out, F.col("tb.t").alias("t"), F.col("tb.b").alias("b")]
        if hoist:
            # per-ROW norm computed before the bucket join — pair
            # scoring then needs only the dot (bit-identical value)
            cols.insert(2, norm(F.col(vec_out)).alias(n_out))
        return out.select(*cols)

    a = side(left, "x", "vx", "nx")
    b = side(right, "y", "vy", "ny")
    keep = ["x", "vx", "y", "vy"] + (["nx", "ny"] if hoist else [])
    cand = a.join(b, ["t", "b"]).select(*keep).dropDuplicates(["x", "y"])
    if hoist:
        score = dot(F.col("vx"), F.col("vy")) / (F.col("nx") * F.col("ny"))
        desc = True
    else:
        score, desc = _score(metric, F.col("vx"), F.col("vy"))
    scored = cand.select("x", "y", score.alias("score"))
    w = Window.partitionBy("x").orderBy(
        F.desc("score") if desc else F.asc("score"), F.asc("y")
    )
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def ivf_assign(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
) -> DataFrame:
    """Assign each vector to its nearest (cosine) centroid: adds
    ``__ivf_cell``.  One projection, argmax over C centroid dots —
    the coarse-quantizer half of an IVF index.  At rest the cell id
    becomes a write-time partition column (partition-pruned probes)."""
    # one SQL string instead of per-centroid Column literals — the py4j
    # construction cost of C x dim literal expressions dominates small
    # queries (same fix as knn_lsh above).  argmax_i cos(v, c_i) =
    # argmax_i dot(v, c_i/|c_i|): the 1/|v| factor is common to every
    # centroid, so centroids pre-normalize in Python.
    #
    # The whole argmax is ONE fold over a nested-array literal (r11):
    # the former per-centroid `greatest(struct(dot_0,..), ...)` form
    # expanded to an O(C x dim) expression tree whose parse + codegen
    # measured ~0.4 s build and dominated execution at C=16, dim=64;
    # this form is O(1) expression nodes regardless of C, the same
    # math, and the same lowest-index tie-break (strict `>` keeps the
    # earlier centroid; Spark orders NaN above all values in both
    # forms).
    if len(centroids) <= 1:
        return df.withColumn("__ivf_cell", F.expr("0"))
    norm_rows = []
    for c in centroids:
        n = sum(x * x for x in c) ** 0.5 or 1.0
        norm_rows.append("array(" + ",".join(repr(x / n) for x in c) + ")")
    c_arr = "array(" + ",".join(norm_rows) + ")"
    best = f"""
    aggregate(
      zip_with({c_arr}, sequence(0, {len(centroids) - 1}),
               (c, i) -> struct(
                   aggregate(zip_with(c, cast(`{vec_col}` as array<double>),
                                      (x, y) -> x * y),
                             cast(0.0 as double), (acc, d) -> acc + d) AS s,
                   i AS i)),
      cast(null as struct<s: double, i: int>),
      (best, cur) -> if(best is null or cur.s > best.s, cur, best)
    ).i
    """
    return df.withColumn("__ivf_cell", F.expr(best))


def knn_ivf(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    metric: str = "cosine",
    nprobe: int = 4,
) -> DataFrame:
    """IVF approximate top-k: restrict the scan to the ``nprobe``
    cells whose centroids are closest to the query, re-rank exactly.
    Deterministic given the centroid list (callers derive centroids
    from fixed sample ids or offline k-means)."""
    probe = ivf_probe_cells(query_vec, centroids, nprobe)
    assigned = ivf_assign(df, vec_col, centroids)
    cands = assigned.filter(F.col("__ivf_cell").isin(probe)).drop("__ivf_cell")
    return knn_bruteforce(cands, vec_col, id_col, query_vec, k, metric)


def ivf_probe_cells(
    query_vec: list[float], centroids: list[list[float]], nprobe: int
) -> list[int]:
    """The ``nprobe`` cell ids whose centroids are cosine-closest to
    the query (deterministic index tie-break)."""

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(y * y for y in b) ** 0.5
        return num / (na * nb) if na and nb else 0.0

    ranked = sorted(
        range(len(centroids)),
        key=lambda i: (-cos(query_vec, centroids[i]), i),
    )
    return ranked[: min(nprobe, len(centroids))]


def ivf_write_partitioned(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    path: str,
    metric: str = "cosine",
) -> None:
    """Materialize the IVF index AT REST: rows written under one
    parquet partition directory per cell (``__ivf_cell=<i>/``).  This
    is the 100TB shape of the index — a probe reads only the nprobe
    matching directories (source-level partition pruning), so query
    cost scales with nprobe/C of the corpus instead of a full scan.

    The index parameters (vec_col, metric, nlist, dim, centroids) are
    persisted alongside the data under ``<path>/_meta`` — the
    reference persists per-index config the same way
    (vector/index.rs:136) — so readers VALIDATE instead of trusting
    caller convention; a mis-parameterized probe raises rather than
    silently returning wrong candidates."""
    ivf_assign(df, vec_col, centroids).write.mode("overwrite").partitionBy(
        "__ivf_cell"
    ).parquet(path)
    meta = {
        "kind": "ivf",
        "vec_col": vec_col,
        "metric": metric,
        "nlist": len(centroids),
        "dim": len(centroids[0]) if centroids else 0,
        "centroids": [[float(x) for x in c] for c in centroids],
    }
    _write_index_meta(df.sparkSession, path, meta)


def _write_index_meta(spark: SparkSession, path: str, meta: dict) -> None:
    import json

    spark.createDataFrame([(json.dumps(meta),)], "meta string").coalesce(
        1
    ).write.mode("overwrite").json(path + "/_meta")


def read_index_meta(spark: SparkSession, path: str) -> dict | None:
    """The persisted parameter record of an at-rest index (IVF /
    MinHash); None when the layout predates metadata."""
    import json

    try:
        rows = spark.read.json(path + "/_meta").collect()
    except Exception:
        return None
    return json.loads(rows[0]["meta"]) if rows else None


def knn_ivf_partitioned(
    spark: SparkSession,
    path: str,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    centroids: list[list[float]] | None,
    k: int = 10,
    metric: str = "cosine",
    nprobe: int = 4,
) -> DataFrame:
    """IVF top-k over a cell-partitioned table written by
    ivf_write_partitioned: the cell filter prunes partitions at the
    file source (assert via PartitionFilters in the physical plan),
    then the survivors re-rank exactly.  Same results as knn_ivf on
    the un-partitioned frame.

    ``centroids=None`` loads them from the index's ``_meta`` record;
    explicitly passed parameters are validated against ``_meta`` and a
    mismatch raises (wrong centroids or metric would silently probe
    the wrong cells otherwise)."""
    meta = read_index_meta(spark, path)
    if centroids is None:
        if meta is None:
            raise ValueError(f"no _meta under {path} and no centroids given")
        centroids = meta["centroids"]
    if meta is not None:
        want = [[float(x) for x in c] for c in centroids]
        if (
            meta.get("vec_col") != vec_col
            or meta.get("metric") != metric
            or meta.get("nlist") != len(want)
            or meta.get("centroids") != want
        ):
            raise ValueError(
                f"IVF index at {path} was built with "
                f"(vec_col={meta.get('vec_col')}, metric={meta.get('metric')}, "
                f"nlist={meta.get('nlist')}); caller requested "
                f"(vec_col={vec_col}, metric={metric}, nlist={len(want)}) "
                f"or different centroids"
            )
    probe = ivf_probe_cells(query_vec, centroids, nprobe)
    cands = (
        spark.read.parquet(path)
        .filter(F.col("__ivf_cell").isin(probe))
        .drop("__ivf_cell")
    )
    return knn_bruteforce(cands, vec_col, id_col, query_vec, k, metric)


# --------------------------------------------------- product quantization


def pq_codebook(
    vectors: list[list[float]], m: int, ksub: int
) -> list[list[list[float]]]:
    """Deterministic PQ codebook from a fixed training sample:
    ``codebook[j][c]`` = subvector j of training vector c.  Offline
    k-means would refine these; a fixed sample keeps the whole pipeline
    (and its SQL oracle) exactly replayable, the knn_ivf precedent."""
    if len(vectors) < ksub:
        raise ValueError(f"need >= {ksub} training vectors")
    d = len(vectors[0])
    if d % m:
        raise ValueError("dim must divide into m subspaces")
    sub = d // m
    return [
        [vectors[c][j * sub : (j + 1) * sub] for c in range(ksub)]
        for j in range(m)
    ]


def pq_encode(
    df: DataFrame,
    vec_col: str,
    codebook: list[list[list[float]]],
    out_col: str = "pq_code",
) -> DataFrame:
    """Append the PQ code array: ``out_col[j]`` = index of the
    L2-nearest sub-centroid of subspace j (tie -> lowest index).

    Pure JVM expressions (slice + zip_with/aggregate HOFs + array_min
    over (dist, idx) structs) — no Python in the row path.  At 100 TB
    with large codebooks (k=256, m=64+) the same kernel moves to a
    vectorized Pandas UDF doing one numpy argmin per batch; the
    HOF form is exact and engine-portable, which is what the oracle
    gate needs.
    """
    m = len(codebook)
    ksub = len(codebook[0])
    sub = len(codebook[0][0])
    v = F.col(vec_col)

    def d2(subvec, cent):
        return F.aggregate(
            F.zip_with(
                subvec,
                F.array(*[F.lit(float(x)) for x in cent]),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    codes = []
    for j in range(m):
        subvec = F.slice(v, j * sub + 1, sub)
        cands = F.array(
            *[
                F.struct(
                    d2(subvec, codebook[j][c]).alias("d"),
                    F.lit(c).alias("c"),
                )
                for c in range(ksub)
            ]
        )
        codes.append(F.array_min(cands)["c"])
    return df.withColumn(out_col, F.array(*codes))


def knn_pq_adc(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    codebook: list[list[list[float]]],
    k: int = 10,
) -> DataFrame:
    """PQ approximate top-k by Asymmetric Distance Computation:
    ``(id, score)`` with score = sum_j LUT[j][code_j], LUT[j][c] =
    L2^2(query subvector j, sub-centroid c) — ascending (smaller is
    closer), ties by id.

    The LUT is m x ksub driver-side floats folded into ONE literal
    array; scoring a row is m ``element_at`` lookups + a sum (whole-
    stage codegen), so the 100 TB scan reads only the byte codes —
    the FAISS IVFADC read path, minus the coarse quantizer (compose
    with ivf_* for that).
    """
    m = len(codebook)
    ksub = len(codebook[0])
    sub = len(codebook[0][0])
    lut: list[float] = []
    for j in range(m):
        q_sub = query_vec[j * sub : (j + 1) * sub]
        for c in range(ksub):
            lut.append(
                float(
                    sum((a - b) * (a - b) for a, b in zip(q_sub, codebook[j][c]))
                )
            )
    lut_col = F.array(*[F.lit(x) for x in lut])
    coded = pq_encode(df, vec_col, codebook)
    score = F.aggregate(
        F.zip_with(
            F.col("pq_code"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, j: F.element_at(lut_col, j * ksub + c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        coded.select(F.col(id_col).alias("id"), score.alias("score"))
        .orderBy(F.asc("score"), F.asc("id"))
        .limit(k)
    )


def knn_ivfadc(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    centroids: list[list[float]],
    codebook: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """IVFADC (the FAISS billion-scale composition): coarse-quantize to
    restrict the scan to ``nprobe`` cells, then score candidates by
    PQ asymmetric distance — the scan reads cell partitions + byte
    codes only, never full vectors.  Deterministic given the centroid
    list and codebook."""
    probe = ivf_probe_cells(query_vec, centroids, nprobe)
    assigned = ivf_assign(df, vec_col, centroids)
    cands = assigned.filter(F.col("__ivf_cell").isin(probe)).drop(
        "__ivf_cell"
    )
    return knn_pq_adc(cands, vec_col, id_col, query_vec, codebook, k)
