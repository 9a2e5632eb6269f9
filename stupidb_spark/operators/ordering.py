"""Deterministic global shuffle order — seeded, reproducible, sort-free.

Training runs need the corpus in a pseudorandom order that is (a) the same
on every engine, rerun, and retry, and (b) obtainable WITHOUT a global
single-partition sort. The order key is ``md5(seed || ':' || id)`` — a
keyed hash, so changing the seed is a fresh permutation and the assignment
is stable under any partitioning (same discipline as
stupidb_spark/queryset/sampling.py: no ``rand()`` anywhere).

Global positions are computed two-level:

1. bucket = first two hex chars of the key (256 buckets). Because the
   bucket is a *prefix* of the order key, ordering by (bucket, key) equals
   ordering by key — the buckets tile the global order.
2. a 256-row count aggregate gives each bucket its cumulative row offset
   (metadata-scale; the only driver-side-ish step, and it is still a Spark
   agg, not a collect);
3. ``row_number`` within each bucket + the bucket's offset = the exact
   global position.

At 100 TB the expensive step is a window over 1/256th of the data per
bucket — embarrassingly parallel — where the naive ``row_number() OVER
(ORDER BY key)`` plan funnels every row through ONE partition. Widen the
prefix (3-4 hex chars → 4096/65536 buckets) as the corpus grows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def seeded_positions(df: DataFrame, *, id_col: str, seed: str) -> DataFrame:
    """Assign each row its exact position in the seeded global shuffle order.

    Returns columns: ``{id_col}, pos`` (1-based, dense, equal to
    ``row_number() OVER (ORDER BY md5(seed || ':' || id), id)``).

    >>> from stupidb_spark.session import get_session
    >>> spark = get_session()
    >>> df = spark.range(1, 1001).withColumnRenamed("id", "doc")
    >>> out = seeded_positions(df, id_col="doc", seed="s1")
    >>> sorted(r.pos for r in out.collect()) == list(range(1, 1001))
    True
    """
    key = F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    keyed = df.select(F.col(id_col), key.alias("__key")).withColumn(
        "__bucket", F.conv(F.substring("__key", 1, 2), 16, 10).cast("int")
    )
    counts = keyed.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__n"))
    # 256-row running offset; the single-partition window is metadata-scale
    off_w = W.orderBy("__bucket").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "__bucket",
        F.coalesce(F.sum("__n").over(off_w), F.lit(0)).alias("__offset"),
    )
    rn_w = W.partitionBy("__bucket").orderBy("__key", id_col)
    return (
        keyed.join(F.broadcast(offsets), "__bucket")
        .select(
            F.col(id_col),
            (F.col("__offset") + F.row_number().over(rn_w)).alias("pos"),
        )
    )
