"""Skew mitigation: salted aggregation and salted broadcast-free joins.

At 100 TB a handful of hot keys (one customer with 10% of all orders, one
document template duplicated a billion times) concentrate a shuffle
partition on one executor. AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin``) handles the join case at runtime; these
operators are the *declarative* counterpart for when the skew is known or
measured, and the aggregation case (which AQE does not salt).

Both are pure DataFrame compositions — no custom partitioner, no RDD:

- :func:`salted_aggregate`: two-level aggregation. Phase 1 groups by
  (key, salt) — hot keys split across ``n_salts`` reducers; phase 2 merges
  the per-salt partials. Only works for algebraic aggregates (the caller
  supplies partial and merge expressions; sums/counts/min/max compose
  losslessly, exactly like Spark's own partial aggregation one level up).
- :func:`replicate_join`: skewed-side rows keep their salt; the other side
  is replicated to every salt value (explode over a literal range). The
  join key becomes (key, salt) — each hot key's matches spread over
  ``n_salts`` tasks. Use when the small side is too big to broadcast but
  the key histogram is lopsided.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame,
    n_salts: int,
    col_name: str = "__salt",
    *,
    method: str = "content",
) -> DataFrame:
    """Uniform salt in [0, n_salts). Salting never changes results, only
    placement, so the method is a placement policy:

    - ``content`` (default): hash of all columns — reruns place rows
      identically (reproducible stage timings). CAVEAT: byte-identical
      duplicate rows (this module's motivating case — one template
      duplicated a billion times) all hash to ONE salt and still pile onto
      a single reducer.
    - ``rowid``: position-derived (``monotonically_increasing_id`` mod
      n_salts) — spreads even identical duplicates; placement is stable for
      a fixed partitioning but not across re-partitioned reruns.

    >>> s = with_salt(ticks, 4)
    >>> s.select((F.min("__salt") >= 0).alias("lo"),
    ...          (F.max("__salt") <= 3).alias("hi")).collect()
    [Row(lo=True, hi=True)]
    """
    if method == "content":
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    elif method == "rowid":
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    else:
        raise ValueError(f"unknown salt method {method!r}")
    return df.withColumn(col_name, salt)


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    *,
    n_salts: int = 16,
    salt_method: str = "content",
) -> DataFrame:
    """Two-level (salted) aggregation for skewed group keys.

    ``partial_aggs`` aggregate within (keys + salt); ``merge_aggs`` combine
    the partial columns per key. Example::

        salted_aggregate(
            orders, ["o_custkey"],
            partial_aggs={"n": F.count(F.lit(1)), "s": X.usum("o_totalprice", 2)},
            merge_aggs={"n": F.sum("n"), "s": F.sum("s")},
        )

    Use ``salt_method="rowid"`` when the hot key's rows are byte-identical
    duplicates (content hashing would give them all one salt).
    """
    salted = with_salt(df, n_salts, method=salt_method)
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(name) for name, c in partial_aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[c.alias(name) for name, c in merge_aggs.items()]
    )


def replicate_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    *,
    n_salts: int = 8,
    how: str = "inner",
    salt_method: str = "content",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys and ``other`` is too large to
    broadcast: salt the skewed side, replicate the other side ×``n_salts``,
    join on (keys + salt). Each hot key's rows land on ``n_salts`` tasks
    instead of one.

    Cost model: ``other`` is shuffled ``n_salts`` times — worth it when the
    hot key's partition would otherwise dominate the stage (straggler wall
    time > n_salts × other-side shuffle time).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        # right/full would surface the replicated side's unmatched rows once
        # per salt — n_salts phantom rows per miss
        raise ValueError(f"replicate_join supports inner/left joins, got {how!r}")
    salted = with_salt(skewed, n_salts, method=salt_method)
    replicated = other.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>")),
    )
    out = salted.join(replicated, on + ["__salt"], how=how)
    return out.drop("__salt")
