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


def _table_buckets(
    vec: Column, dim: int, n_planes: int, n_tables: int, seed: int
) -> Column:
    """Array of per-table bucket ids: table t's bucket tagged with t in the
    high bits so one equi-join key covers all tables.

    Computed as ONE vectorized numpy matmul per Arrow batch
    ((batch, dim) @ (dim, n_tables·n_planes) → sign bits → bucket ids): the
    expression-level fold evaluates interpreted per plane per element —
    measured ~10× slower at 16 tables. A dense matrix product is exactly the
    case where a pandas UDF beats Catalyst expressions."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    planes_rows = []
    for t in range(n_tables):
        planes_rows.extend(hyperplanes(dim, n_planes, seed + 1000 * t))
    P = np.array(planes_rows, dtype=np.float64)  # (n_tables*n_planes, dim)
    bit_weights = np.tile(1 << np.arange(n_planes, dtype=np.int64), n_tables)

    def _buckets(v):
        M = np.stack(v.to_numpy()).astype(np.float64)  # (batch, dim)
        signs = (M @ P.T) >= 0.0  # (batch, n_tables*n_planes)
        weighted = signs * bit_weights  # per-plane bucket bits
        per_table = weighted.reshape(len(M), n_tables, n_planes).sum(axis=2)
        tagged = per_table + (np.arange(n_tables, dtype=np.int64) << 32)
        return pd.Series(list(tagged))

    # explicit returnType form: `from __future__ import annotations` makes
    # pep-563 string hints, which pandas_udf's hint inspection rejects
    return pandas_udf(_buckets, "array<long>")(vec)


def lsh_topk(
    base: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: standard multi-table random-hyperplane LSH.

    Each of ``n_tables`` hash tables buckets every vector by the signs of
    ``n_planes`` projections; a query is scored only against vectors sharing
    a bucket in ≥1 table. Recall for a neighbor at angle θ is
    1 − (1 − (1 − θ/π)^n_planes)^n_tables — at cosine 0.5 with 4×8 ≈ 0.83,
    versus 0.2 for a single table (measured 0.12 on the fixture).

    Scale shape: candidates are generated as (table|bucket) equi-joins of
    ids only — the wide vector arrays never ride the candidate shuffle; the
    scoring join fetches vectors for surviving candidate pairs.
    """
    bcol = _table_buckets(F.col(vec_col), dim, n_planes, n_tables, seed)
    b_ids = spread_small_scan(base).select(
        F.col(id_col).alias("neighbor_id"), F.explode(bcol).alias("tb")
    )
    q_ids = queries.select(F.col(id_col).alias("query_id"), F.explode(bcol).alias("tb"))
    candidates = (
        b_ids.join(F.broadcast(q_ids), on="tb")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    b_vec = base.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("b_vec"))
    q_vec = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    scored = (
        candidates.join(b_vec, "neighbor_id")
        .join(F.broadcast(q_vec), "query_id")
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
