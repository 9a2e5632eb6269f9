"""As-of (time-travel) join and range join.

Neither exists in the reference (its only strategy is a nested-loop theta
join, `stupidb/core.py:328-340`, which *could* express an as-of predicate but
at O(n·m) with a per-left-row max). Spark also lacks a native as-of join, so
this is a composition of existing DataFrame ops (SURVEY.md §7 custom-operator
policy (a)).

Implementation: the union-merge technique. Tag both inputs, union them,
window-sort each key group by (time, tag) once, and carry the most recent
right-side payload forward with ``last(..., ignorenulls=True)`` over a
running frame. Cost = one shuffle + one sort — the same complexity class as
a sort-merge join, with none of the range-join pair explosion that the naive
``left.join(right, time_left >= time_right)`` + per-row max suffers (that
plan is O(n·m) pairs at 100 TB; this one is O(n+m) rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    how: str = "left",
    suffix: str = "",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row within the same key
    group: ``direction='backward'`` (default) takes the greatest
    ``right_time <= left_time`` (ASOF ... ON left_time >= right_time),
    ``'forward'`` the smallest ``right_time >= left_time`` — both inclusive.

    ``how='left'`` keeps unmatched left rows null-padded; ``'inner'`` drops
    them. Right-side time ties are broken by keeping the lexicographically
    greatest payload struct (deterministic); pre-deduplicate the right side
    if a different rule is wanted.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join supports how='left'|'inner', got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"asof_join supports direction='backward'|'forward', got {direction!r}"
        )

    right_cols = [c for c in right.columns]
    payload = F.struct(*[F.col(c) for c in right_cols]).alias("__asof_payload")

    # Deterministic tie-break: one payload per (key, time) — max struct.
    right_side = (
        right.select(
            F.col(right_on).alias("__asof_key"),
            F.col(right_time).alias("__asof_time"),
            payload,
        )
        .groupBy("__asof_key", "__asof_time")
        .agg(F.max("__asof_payload").alias("__asof_payload"))
        .withColumn("__asof_tag", F.lit(0))
    )

    left_side = left.select(
        F.col(left_on).alias("__asof_key"),
        F.col(left_time).alias("__asof_time"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__asof_left"),
    ).withColumn("__asof_tag", F.lit(1))

    combined = left_side.unionByName(
        right_side.withColumn("__asof_left", F.lit(None).cast(left_side.schema["__asof_left"].dataType)),
        allowMissingColumns=True,
    )

    # tag 0 (right) sorts before tag 1 (left) at equal times → inclusive
    # match in both directions; forward simply scans time in reverse, so the
    # carried "most recent" right row is the nearest FUTURE one.
    time_order = (
        F.col("__asof_time").desc()
        if direction == "forward"
        else F.col("__asof_time").asc()
    )
    w = (
        Window.partitionBy("__asof_key")
        .orderBy(time_order, F.col("__asof_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = combined.withColumn(
        "__asof_match", F.last("__asof_payload", ignorenulls=True).over(w)
    ).filter(F.col("__asof_tag") == 1)

    if how == "inner":
        carried = carried.filter(F.col("__asof_match").isNotNull())

    out_cols = [F.col("__asof_left")[c].alias(c) for c in left.columns] + [
        F.col("__asof_match")[c].alias(c + suffix) for c in right_cols
    ]
    return carried.select(*out_cols)


def range_join(
    left: DataFrame,
    ranges: DataFrame,
    *,
    value: Column,
    lo: Column,
    hi: Column,
    how: str = "inner",
) -> DataFrame:
    """Join rows to the interval(s) containing them: ``lo <= value < hi``.

    The ranges side is broadcast (interval tables are dimension-sized); Spark
    plans a broadcast nested-loop join, which is the right physical strategy
    for banding — every executor filters its rows against the in-memory
    interval list with zero shuffle of the fact side.
    """
    return left.join(F.broadcast(ranges), on=(value >= lo) & (value < hi), how=how)


def bucketize(
    df: DataFrame,
    buckets: list[tuple[str, float, float]],
    *,
    value: Column,
    out: str = "bucket_name",
) -> DataFrame:
    """Band rows into STATIC, NON-OVERLAPPING ``[lo, hi)`` buckets via a
    chained CASE expression — the degenerate range join.

    When the interval list is a compile-time constant and intervals don't
    overlap, a join (even a broadcast one) is pure overhead: the BNLJ
    evaluates every row against every interval and materializes a joined
    row per match, where a CASE column is one codegen'd expression inside
    the scan stage — one pass, zero extra operators, and the downstream
    groupBy is the query's only shuffle. Rows outside every bucket get NULL
    (drop them for inner-join semantics). Use :func:`range_join` when the
    intervals are data (a real dimension table) or may overlap (a row can
    land in several).
    """
    expr = F.lit(None).cast("string")
    # build right-to-left so the first matching bucket wins, as in a CASE
    for name, b_lo, b_hi in reversed(buckets):
        expr = (
            F.when((value >= F.lit(b_lo)) & (value < F.lit(b_hi)), F.lit(name))
            .otherwise(expr)
        )
    return df.withColumn(out, expr)
