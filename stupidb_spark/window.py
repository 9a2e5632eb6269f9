"""Window frame builders mirroring the reference's ``Window.rows/range``.

Reference: `stupidb/aggregation.py:336-379` builds a FrameClause with
order_by / partition_by / preceding / following / nulls; frame resolution in
`stupidb/aggregation.py:135-198`. Defaults there: no ``preceding`` ⇒
partition start; no ``following`` ⇒ current row when ordered, whole
partition when unordered — identical to SQL's defaults except tie handling
(quirk Q2, we follow SQL).

Spark's WindowExec already implements bounded/unbounded frames natively, so
nothing like the reference's segment tree (`stupidb/associative/
segmenttree.py`) is needed — that structure exists only to make pure-Python
window aggregation O(n log n), which Spark does in the JVM.

Temporal RANGE frames: the reference allows ``timedelta`` bounds on a date
order key (`stupidb/aggregation.py:307-333`, exercised in
`stupidb/tests/test_stupidb.py:529-588`). Spark's ``rangeBetween`` needs a
numeric order key, so :func:`range_window` transparently orders by
``unix_timestamp`` seconds when given timedelta bounds.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column, WindowSpec
from pyspark.sql import functions as F
from pyspark.sql.window import Window as SparkWindow

from stupidb_spark.verbs import ColumnLike, Nulls, _col

UNBOUNDED = None  # sentinel mirroring the reference's "no bound given"
CURRENT_ROW = 0


def _ordered(keys: tuple[ColumnLike, ...], nulls: Nulls, desc: bool) -> list[Column]:
    """String keys get nulls/desc treatment; Column keys (possibly already
    carrying a sort order, e.g. ``F.col(x).desc()``) pass through as-is."""
    out = []
    for k in keys:
        if not isinstance(k, str):
            out.append(k)
            continue
        c = F.col(k)
        if desc:
            out.append(c.desc_nulls_first() if nulls is Nulls.FIRST else c.desc_nulls_last())
        else:
            out.append(c.asc_nulls_first() if nulls is Nulls.FIRST else c.asc_nulls_last())
    return out


def rows_window(
    *,
    partition_by: tuple[ColumnLike, ...] = (),
    order_by: tuple[ColumnLike, ...] = (),
    preceding: int | None = UNBOUNDED,
    following: int | None = None,
    nulls: Nulls = Nulls.FIRST,
    desc: bool = False,
) -> WindowSpec:
    """ROWS-mode frame (reference ``Window.rows``, `stupidb/aggregation.py:348-360`).

    ``preceding=None`` ⇒ UNBOUNDED PRECEDING; ``following=None`` ⇒ CURRENT ROW
    when ordered / UNBOUNDED FOLLOWING when unordered (reference defaults,
    `stupidb/aggregation.py:173-194`).

    >>> w = rows_window(partition_by=("grp",), order_by=("t",),
    ...                 preceding=1, following=0)
    >>> [r.s for r in ticks.select(F.sum("x").over(w).alias("s"))
    ...                    .orderBy("grp", "t").collect()]
    [10.0, 30.0, 50.0, 5.0, 12.0]
    """
    w = SparkWindow.partitionBy(*[_col(p) for p in partition_by])
    if order_by:
        w = w.orderBy(*_ordered(tuple(order_by), nulls, desc))
    lo = SparkWindow.unboundedPreceding if preceding is None else -preceding
    if following is None:
        hi = SparkWindow.currentRow if order_by else SparkWindow.unboundedFollowing
    else:
        hi = following
    return w.rowsBetween(lo, hi)


def range_window(
    *,
    partition_by: tuple[ColumnLike, ...] = (),
    order_by: ColumnLike,
    preceding: int | float | datetime.timedelta | None = UNBOUNDED,
    following: int | float | datetime.timedelta | None = CURRENT_ROW,
    nulls: Nulls = Nulls.FIRST,
    desc: bool = False,
) -> WindowSpec:
    """RANGE-mode frame — exactly one order key, as the reference enforces
    (`stupidb/aggregation.py:272-278`).

    ``timedelta`` bounds (reference `stupidb/aggregation.py:307-333`) are
    translated to microseconds with the order key recast to epoch
    microseconds (full timestamp precision — epoch *seconds* would truncate
    sub-second order keys and silently shift frame edges), since Spark's
    rangeBetween requires a numeric key.

    >>> w = range_window(partition_by=("grp",), order_by="t",
    ...                  preceding=1, following=0)
    >>> [r.n for r in ticks.select(F.count(F.lit(1)).over(w).alias("n"))
    ...                    .orderBy("grp", "t").collect()]
    [1, 2, 2, 1, 2]
    """
    key = _col(order_by)
    lo_delta = preceding
    hi_delta = following
    temporal = isinstance(lo_delta, datetime.timedelta) or isinstance(
        hi_delta, datetime.timedelta
    )
    if temporal:
        key = F.unix_micros(key.cast("timestamp"))
        if isinstance(lo_delta, datetime.timedelta):
            lo_delta = round(lo_delta.total_seconds() * 1_000_000)
        if isinstance(hi_delta, datetime.timedelta):
            hi_delta = round(hi_delta.total_seconds() * 1_000_000)

    w = SparkWindow.partitionBy(*[_col(p) for p in partition_by])
    ordered = _ordered((key,), nulls, desc)
    w = w.orderBy(*ordered)
    lo = SparkWindow.unboundedPreceding if lo_delta is None else -lo_delta
    hi = SparkWindow.currentRow if hi_delta == CURRENT_ROW else (
        SparkWindow.unboundedFollowing if hi_delta is None else hi_delta
    )
    return w.rangeBetween(lo, hi)


def dynamic_rows_sum(
    value: ColumnLike,
    *,
    partition_by: tuple[ColumnLike, ...],
    order_by: tuple[ColumnLike, ...],
    preceding: Column,
    following: Column,
    scale: int = 2,
    max_partition_rows: int | None = 1 << 20,
) -> Column:
    """Exact SUM over a ROWS frame whose bounds are *per-row expressions* —
    the reference's callable ``preceding``/``following``
    (`stupidb/typehints.py:25-26`, frame resolution
    `stupidb/aggregation.py:135-198`), which SQL window frames cannot
    express (bounds must be constants).

    Formulation: one window pass collects the partition's values as an array
    (``collect_list`` over UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING) plus the
    row's position; a codegen'd projection then slices
    ``[pos - preceding, pos + following]`` and folds the slice. The fold runs
    on *unscaled integers* (exact.py discipline) so the result is identical
    under any partitioning. An empty frame yields NULL, matching SQL SUM.

    Scale: one shuffle (the window), then pure projection. Each partition's
    value array is materialized per row, so this is for bounded partitions
    (user sessions, per-key series) — the same constraint the reference has,
    where a partition is a Python list (`stupidb/aggregation.py:207-230`).
    Nulls in ``value`` contribute 0 to the fold (≡ SQL SUM's null-skip) and
    keep array positions aligned.

    >>> dyn = dynamic_rows_sum(
    ...     "x", partition_by=("grp",), order_by=("t",),
    ...     preceding=(F.col("t") % 2).cast("int"), following=F.lit(0))
    >>> [r.s for r in ticks.select(dyn.alias("s")).orderBy("grp", "t").collect()]
    [10.0, 20.0, 50.0, 5.0, 7.0]
    """
    p10 = float(10**scale)
    unscaled = F.coalesce(
        F.floor(_col(value) * F.lit(p10) + F.lit(0.5)), F.lit(0)
    )
    w_full = (
        SparkWindow.partitionBy(*[_col(p) for p in partition_by])
        .orderBy(*_ordered(tuple(order_by), Nulls.FIRST, False))
        .rowsBetween(SparkWindow.unboundedPreceding, SparkWindow.unboundedFollowing)
    )
    w_ord = SparkWindow.partitionBy(*[_col(p) for p in partition_by]).orderBy(
        *_ordered(tuple(order_by), Nulls.FIRST, False)
    )
    arr = F.collect_list(unscaled).over(w_full)
    pos = F.row_number().over(w_ord)
    start = F.greatest(F.lit(1), pos - preceding)
    # slice() clamps past the partition end, so only the lower edge needs
    # explicit clamping; length <= 0 means an empty frame => NULL.
    length = pos + following - start + 1
    total = F.aggregate(
        F.slice(arr, start, F.greatest(F.lit(0), length)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    from stupidb_spark.functions.navigation import _partition_guard

    result = F.when(
        length > 0, total.cast("double") / F.lit(p10)
    ).otherwise(F.lit(None).cast("double"))
    # Same bounded-partition contract as the dynamic navigation paths: the
    # per-row array materialization fails loudly past the cap instead of
    # OOMing an executor on a skewed partition key. None waives the guard.
    return _partition_guard(arr, result, max_partition_rows, "dynamic_rows_sum")


def partition_window(
    *partition_by: ColumnLike,
    order_by: tuple[ColumnLike, ...] = (),
    nulls: Nulls = Nulls.FIRST,
    desc: bool = False,
) -> WindowSpec:
    """Plain partition/order window (no explicit frame) for ranking and
    lead/lag, which ignore frames in the reference too
    (`stupidb/functions/navigation/__init__.py:40-46`).

    >>> w = partition_window("grp", order_by=("t",))
    >>> [r.rn for r in ticks.select(F.row_number().over(w).alias("rn"))
    ...                     .orderBy("grp", "t").collect()]
    [1, 2, 3, 1, 2]
    """
    w = SparkWindow.partitionBy(*[_col(p) for p in partition_by])
    if order_by:
        w = w.orderBy(*_ordered(tuple(order_by), nulls, desc))
    return w
