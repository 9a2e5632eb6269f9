"""IVF (inverted-file) approximate nearest-neighbor search.

The second scale path for similarity search next to multi-table LSH
(operators/similarity.py): a k-means coarse quantizer partitions the vector
space into ``n_centroids`` cells; each base vector is indexed under its
nearest centroid, and a query scores only the ``n_probe`` nearest cells —
scan-per-query becomes cell-local scoring, the classic IVF-Flat layout.

Spark-first shape:
- centroids are tiny (k × dim floats) — they live on the driver and ride
  into tasks as numpy literals inside a vectorized pandas UDF (one matmul
  per Arrow batch; an expression-level distance fold would be interpreted
  and ~10× slower — see memory: HOFs).
- Lloyd iterations are DataFrame jobs: assign (map) → per-dimension mean
  via posexplode + groupBy (shuffle of k×dim partials, not vectors) →
  collect k×dim to the driver. The only driver-side data is the centroid
  table itself, which is model metadata, not data rows.
- At 100 TB the assignment pass is map-only over the base table and the
  index write is one shuffle on cell id (or a bucketed write,
  sources/bucketing.py, making later probes shuffle-free).

Deterministic: seeds are the lowest-id vectors, iteration count is fixed,
and every step is a deterministic computation — same inputs, same index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stupidb_spark.operators.similarity import cosine, spread_small_scan


def _normalize(M: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return M / norms


def _assign_udf(centroids: np.ndarray):
    """cluster id of each vector = argmax cosine vs centroid matrix."""
    C = _normalize(centroids.astype(np.float64))

    def fn(v: pd.Series) -> pd.Series:
        M = _normalize(np.stack(v.to_numpy()).astype(np.float64))
        return pd.Series(np.argmax(M @ C.T, axis=1).astype(np.int32))

    return F.pandas_udf(fn, "int")


def _probe_udf(centroids: np.ndarray, n_probe: int):
    """ids of the n_probe nearest centroids per vector."""
    C = _normalize(centroids.astype(np.float64))

    def fn(v: pd.Series) -> pd.Series:
        M = _normalize(np.stack(v.to_numpy()).astype(np.float64))
        sims = M @ C.T
        top = np.argsort(-sims, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(top))

    return F.pandas_udf(fn, "array<int>")


def kmeans_centroids(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 3,
) -> np.ndarray:
    """Deterministic Lloyd's k-means: seeds = the k lowest-id vectors.

    Each iteration is one assignment pass plus one per-dimension mean
    aggregation; only k×dim floats ever reach the driver.
    """
    base = spread_small_scan(
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    )
    seed_rows = base.orderBy("_id").limit(k).collect()
    centroids = np.stack([np.array(r._v, dtype=np.float64) for r in seed_rows])
    for _ in range(iters):
        assigned = base.withColumn("_c", _assign_udf(centroids)("_v"))
        means = (
            assigned.select("_c", F.posexplode("_v").alias("_pos", "_x"))
            .groupBy("_c", "_pos")
            .agg(F.avg("_x").alias("_m"))
            .collect()
        )
        new = centroids.copy()
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(r._c, {})[r._pos] = r._m
        for c, dims in by_cluster.items():
            for pos, m in dims.items():
                new[c, pos] = m
        centroids = new
    return centroids


def ivf_topk(
    base: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 6,
    iters: int = 3,
) -> DataFrame:
    """IVF-Flat top-k: train the coarse quantizer, index base vectors by
    cell, probe the ``n_probe`` nearest cells per query.

    Returns: query_id, neighbor_id, cosine_sim, rk (≤ k rows per query).
    """
    centroids = kmeans_centroids(
        base, id_col=id_col, vec_col=vec_col, k=n_centroids, iters=iters
    )
    b = spread_small_scan(
        base.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("b_vec"))
    ).withColumn("cell", _assign_udf(centroids)("b_vec"))
    q = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
        .withColumn("cell", F.explode(_probe_udf(centroids, n_probe)("q_vec")))
    )
    scored = (
        b.join(F.broadcast(q), on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", cosine(F.col("q_vec"), F.col("b_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rk")
    )
