"""Dimensionality reduction for embedding columns: sample-trained PCA with
a map-only distributed transform — the standard pre-step before ANN
indexing at corpus scale (project 768-d encoder outputs to 64-128-d, then
IVF/PQ the projected vectors; index memory and distance math shrink by the
same factor while recall stays near-flat).

Training follows the ivf_train contract (`operators/ivf.py:78`): the
principal axes are a distribution sketch, not the data set, so the driver
fits them on the ``n_train`` lowest-id vectors — one bounded TakeOrdered
collect, O(n_train · dim) driver memory — and everything downstream is a
broadcast of the (k × dim) component matrix into a vectorized Arrow
transform. No shuffle anywhere: the output partitioning is the input's.

Determinism: the sample is id-ordered (not a random split), the SVD runs
in float64 on the driver, and each component's sign is canonicalized
(largest-|loading| coordinate forced positive), so the projection matrix —
and therefore every projected vector — is reproducible run-to-run and
matches the numpy reference in tests bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PCAModel:
    """Fitted projection: ``mean`` (dim,), ``components`` (k, dim) rows =
    principal axes (descending explained variance), ``explained_var`` (k,)
    the corresponding singular-value variances."""

    mean: np.ndarray
    components: np.ndarray
    explained_var: np.ndarray


def pca_train(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_train: int = 4096,
) -> PCAModel:
    """Fit ``k`` principal axes on the ``n_train`` lowest-id vectors."""
    rows = (
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy("_id")
        .limit(n_train)
        .collect()
    )
    X = np.stack([np.array(r._v, dtype=np.float64) for r in rows])
    mean = X.mean(axis=0)
    Xc = X - mean
    # full_matrices=False: Vt is (min(n, dim), dim); rows are the axes
    _, s, Vt = np.linalg.svd(Xc, full_matrices=False)
    comp = Vt[:k]
    # sign canonicalization: numpy's SVD sign is arbitrary per component —
    # force the largest-|loading| coordinate positive so retrains on the
    # same sample reproduce the identical matrix
    for i in range(comp.shape[0]):
        j = int(np.argmax(np.abs(comp[i])))
        if comp[i, j] < 0:
            comp[i] = -comp[i]
    var = (s[:k] ** 2) / max(len(X) - 1, 1)
    return PCAModel(mean=mean, components=comp, explained_var=var)


def pca_project(
    df: DataFrame,
    model: PCAModel,
    *,
    vec_col: str = "embedding",
    out_col: str = "projected",
) -> DataFrame:
    """Append ``out_col`` = components · (vec − mean) — one vectorized
    numpy matmul per Arrow batch, no shuffle, output partitioning = input
    partitioning. The model rides the closure as a (k × dim) broadcast-by-
    construction constant (same class as the PQ codebooks, SCALE.md
    "bounded by contract")."""
    mean = model.mean.copy()
    comp_t = model.components.T.copy()  # (dim, k)

    @F.pandas_udf("array<double>")
    def fn(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.float64)
        P = (M - mean) @ comp_t
        return pd.Series(list(P))

    return df.withColumn(out_col, fn(F.col(vec_col)))


def pca_reference(
    X: np.ndarray, model: PCAModel
) -> np.ndarray:
    """Driver-side numpy twin of :func:`pca_project` (same float64 ops in
    the same order) for the differential tests."""
    return (X.astype(np.float64) - model.mean) @ model.components.T


def save_pca_model(spark, model: PCAModel, path: str) -> None:
    """Persist the fitted projection as a parquet model table — the
    durable form that outlives the session (the ``save_ivf_index`` /
    ``save_bpe_merges`` model lifecycle: train on a corpus snapshot,
    persist, and every downstream projection job — batch or streaming —
    loads the identical matrix). Doubles round-trip parquet exactly, so a
    loaded model projects bit-identically to the in-session one (pinned).

    Rows: ``kind`` = 'mean' (idx 0) or 'comp' (idx = component rank);
    ``vals`` the (dim,) vector; ``var`` the component's explained
    variance (0.0 on the mean row).
    """
    rows = [("mean", 0, [float(x) for x in model.mean], 0.0)] + [
        (
            "comp",
            i,
            [float(x) for x in model.components[i]],
            float(model.explained_var[i]),
        )
        for i in range(len(model.components))
    ]
    spark.createDataFrame(
        rows, "kind string, idx int, vals array<double>, var double"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_pca_model(spark, path: str) -> PCAModel:
    """Load a :func:`save_pca_model` table."""
    rows = spark.read.parquet(path).collect()
    mean = next(
        np.array(r.vals, dtype=np.float64) for r in rows if r.kind == "mean"
    )
    comps = sorted((r for r in rows if r.kind == "comp"), key=lambda r: r.idx)
    return PCAModel(
        mean=mean,
        components=np.stack(
            [np.array(r.vals, dtype=np.float64) for r in comps]
        ),
        explained_var=np.array([r.var for r in comps], dtype=np.float64),
    )
