"""Principal Component Analysis over an embedding column.

Reference parity: crates/samyama-graph-algorithms/src/pca.rs (config
:39-66 center/scale/n_components, result :69-87 components/
explained_variance/ratio/mean/std_dev, transform :90-141).

Spark-first split of the work:

- **Fit** is one distributed pass: each partition reduces its rows to
  a (count, column-sum, Gram-matrix) triple with numpy inside
  ``mapInPandas`` (the d*d outer-product accumulation is exactly the
  shape built-in SQL aggregates can't express without d^2 columns),
  then the driver sums the tiny per-partition summaries and runs a
  d*d ``eigh`` — for d=64 that is microseconds, and the shuffle-free
  single scan is the same plan at 100 TB: O(partitions * d^2) bytes
  to the driver, independent of row count.
- **Transform** stays JVM-side: each component projection is a
  ``zip_with``/``aggregate`` dot product against a literal
  (pre-centered, pre-scaled) component vector — whole-stage codegen,
  no Python in the per-row path.

Sign convention: each component is flipped so its largest-magnitude
coordinate is positive (sklearn's ``svd_flip``), making results
deterministic across partitionings and solvers — the reference's
power-iteration/randomized solvers are sign-unstable too, so parity
tests compare under the same convention.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUMMARY_SCHEMA = "n long, s array<double>, g array<double>"


@dataclass
class PcaModel:
    """Fitted PCA state (mirrors pca.rs PcaResult :69-87)."""

    components: list[list[float]]  # k x d, rows orthonormal
    explained_variance: list[float]  # eigenvalues, descending
    explained_variance_ratio: list[float]
    mean: list[float]  # zeros when center=False
    std_dev: list[float]  # ones when scale=False
    n_samples: int
    n_features: int


def _partition_summaries(vec_col: str):
    """mapInPandas body: reduce a partition to one (n, sum, Gram) row."""

    def summarize(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        n = 0
        s = None
        g = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            gg = x.T @ x
            g = gg if g is None else g + gg
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    return summarize


def pca_fit(
    df: DataFrame,
    vec_col: str,
    n_components: int = 2,
    center: bool = True,
    scale: bool = False,
) -> PcaModel:
    """Fit PCA on ``df[vec_col]`` (array<numeric>, fixed dimension)."""
    import numpy as np

    from samyama_graph_spark.session import ensure_shipped

    ensure_shipped(df.sparkSession)
    rows = (
        df.select(F.col(vec_col).cast("array<double>").alias(vec_col))
        .filter(F.col(vec_col).isNotNull())
        .mapInPandas(_partition_summaries(vec_col), schema=_SUMMARY_SCHEMA)
        .collect()
    )
    if not rows:
        raise ValueError("PCA requires at least one data point")
    # deterministic driver-side reduction order
    rows.sort(key=lambda r: (r["n"], r["s"][0] if r["s"] else 0.0))
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["s"])
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in rows:
        s += np.array(r["s"])
        g += np.array(r["g"]).reshape(d, d)

    mean = s / n if center else np.zeros(d)
    # Gram of the centered matrix: Xc^T Xc = G - n mu mu^T (exact when
    # mu is the true mean; identical to materializing centered rows)
    gc = g - n * np.outer(mean, mean) if center else g
    denom = float(max(n, 2) - 1)
    std = np.sqrt(np.clip(np.diag(gc), 0.0, None) / denom) if scale else np.ones(d)
    safe = np.where(std > 0.0, std, 1.0)
    cov = gc / (float(n - 1) if n > 1 else 1.0)
    if scale:
        cov = cov / np.outer(safe, safe)

    k = min(n_components, d, n)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # k x d
    evals = np.clip(evals[order], 0.0, None)
    # svd_flip sign convention (see module docstring)
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    total = float(np.trace(cov))
    ratio = [float(ev) / total if total > 0 else 0.0 for ev in evals]
    return PcaModel(
        components=[c.tolist() for c in comps],
        explained_variance=[float(ev) for ev in evals],
        explained_variance_ratio=ratio,
        mean=mean.tolist(),
        std_dev=std.tolist(),
        n_samples=int(n),
        n_features=d,
    )


def pca_transform(
    df: DataFrame, vec_col: str, model: PcaModel, out_col: str = "pc"
) -> DataFrame:
    """Add ``out_col``: array<double> of the k projected coordinates.

    Projection of row x onto component w with centering/scaling is
    sum_j (x_j - mu_j)/sigma_j * w_j  =  dot(x, w') - b  with
    w'_j = w_j / sigma_j and b = dot(mu, w') — so each coordinate is
    ONE codegen'd dot against a literal vector plus a literal offset
    (reference transform: pca.rs:90-121).
    """
    from samyama_graph_spark.datapipe.similarity import dot

    v = F.col(vec_col).cast("array<double>")
    coords = []
    for comp in model.components:
        w = [
            wj / (sj if sj > 0.0 else 1.0)
            for wj, sj in zip(comp, model.std_dev)
        ]
        b = sum(mj * wj for mj, wj in zip(model.mean, w))
        coords.append(dot(v, F.lit(w).cast("array<double>")) - F.lit(float(b)))
    return df.withColumn(out_col, F.array(*coords))
