"""Similarity search over embedding columns (array<float>).

Beyond-reference surface (SURVEY.md §7). Two paths:

- :func:`brute_force_topk` — exact cosine top-k. The query set is broadcast,
  so the base table is scanned once with no shuffle of the big side; top-k
  is a per-query window. This is the correctness baseline and is already the
  right plan when |queries| is small (the common batch-retrieval shape).
- :func:`lsh_topk` — random-hyperplane LSH bucketing: each vector lands in
  one of 2^n_planes sign-buckets; queries probe only their own bucket. At
  100 TB this turns a full scan per query into a bucket-local scan; recall
  is tunable via n_planes / multi-probe. Hyperplanes are deterministic
  (seeded), data-independent literals — no fitting step, no driver collect.

All dot products are computed in float64 with a left-to-right Catalyst fold
(zip_with + aggregate), which makes values bit-identical to the DuckDB
oracle's double accumulation — float equality is safe in the hash compare.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stupidb_spark.operators.dedup import spread_small_scan


def _fsum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (double accumulation)."""
    return _fsum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def norm(a: Column) -> Column:
    return F.sqrt(_fsum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    base: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Returns: query_id, neighbor_id, cosine_sim — k rows per query, ranked by
    (sim desc, neighbor_id) for a deterministic total order.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    # spread: a small base file arrives as one partition and would put the
    # whole scoring loop on one core (at scale the scan is already wide)
    b = spread_small_scan(
        base.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("b_vec"))
    )
    scored = (
        b.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
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


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (data-independent)."""
    rng = random.Random(seed)
    return [[rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bucket id of a vector under the given hyperplanes (0..2^n-1)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(v) for v in plane])
        bit = F.when(dot(vec, p) >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket.bitwiseOR(bit)
    return bucket


def lsh_topk(
    base: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    dim: int = 64,
    n_planes: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: both sides bucketed by random-hyperplane
    sign hash; each query is scored only against its own bucket.

    The bucket equi-join replaces the cross product — the scan of the base
    side shuffles once on bucket id (or not at all if pre-bucketed/bucketed
    storage is used), instead of every query touching every row.
    """
    planes = hyperplanes(dim, n_planes, seed)
    b = spread_small_scan(base).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("b_vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        b.join(F.broadcast(qs), on="bucket")
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


def embedding_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    threshold: float = 0.9,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    Pairs are generated inside blocks (an existing category column, or an
    LSH bucket when ``block_col`` is None) so the global cross product never
    materializes.

    Returns: id_a, id_b, cosine_sim.
    """
    df = spread_small_scan(df)
    if block_col is not None:
        work = df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            F.col(block_col).alias("block"),
        )
    else:
        planes = hyperplanes(64, 4)
        work = df.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
        ).withColumn("block", lsh_bucket(F.col("vec"), planes))
    a = work.alias("a")
    b = work.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block")) & (F.col("a.id") < F.col("b.id")),
        )
        .withColumn("cosine_sim", cosine(F.col("a.vec"), F.col("b.vec")))
        .filter(F.col("cosine_sim") >= threshold)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            "cosine_sim",
        )
    )
