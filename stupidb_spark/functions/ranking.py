"""Ranking window functions.

The reference's ranks are 0-based (`stupidb/tests/test_ranking.py:37,68`;
quirk Q3). SQL (and the DuckDB oracle) are 1-based, so 1-based is our
default, with ``zero_based=True`` for reference parity.

Spark's WindowExec handles these natively (partition shuffle + sort); the
reference needs a bespoke RankingAggregator (`stupidb/functions/ranking/
core.py:12-73`) because it has no window executor.
"""

from __future__ import annotations

from pyspark.sql import Column, WindowSpec
from pyspark.sql import functions as F


def _maybe_shift(c: Column, zero_based: bool) -> Column:
    return (c - F.lit(1)) if zero_based else c


def row_number(w: WindowSpec | None = None, *, zero_based: bool = False) -> Column:
    """`stupidb/functions/ranking/__init__.py:13-28` (0-based there).

    >>> [r.rn for r in scores.select(row_number(w_score).alias("rn")).collect()]
    [1, 2, 3, 4]
    >>> [r.rn for r in scores.select(
    ...     row_number(w_score, zero_based=True).alias("rn")).collect()]
    [0, 1, 2, 3]
    """
    c = F.row_number()
    c = c.over(w) if w is not None else c
    return _maybe_shift(c, zero_based)


def rank(w: WindowSpec | None = None, *, zero_based: bool = False) -> Column:
    """Rank with gaps (`stupidb/functions/ranking/__init__.py:31-101`).

    >>> [r.r for r in scores.select(rank(w_ties).alias("r")).collect()]
    [1, 2, 2, 4]
    """
    c = F.rank()
    c = c.over(w) if w is not None else c
    return _maybe_shift(c, zero_based)


def dense_rank(w: WindowSpec | None = None, *, zero_based: bool = False) -> Column:
    """Rank without gaps (`stupidb/functions/ranking/__init__.py:104-118`).

    >>> [r.r for r in scores.select(dense_rank(w_ties).alias("r")).collect()]
    [1, 2, 2, 3]
    """
    c = F.dense_rank()
    c = c.over(w) if w is not None else c
    return _maybe_shift(c, zero_based)


def percent_rank(w: WindowSpec | None = None) -> Column:
    """Additive beyond the reference surface: (rank - 1) / (n - 1).

    >>> [r.p for r in scores.select(percent_rank(w_ties).alias("p")).collect()]
    [0.0, 0.3333333333333333, 0.3333333333333333, 1.0]
    """
    c = F.percent_rank()
    return c.over(w) if w is not None else c


def ntile(n: int, w: WindowSpec | None = None) -> Column:
    """Additive beyond the reference surface: n equal-ish ordered buckets.

    >>> [r.q for r in scores.select(ntile(2, w_score).alias("q")).collect()]
    [1, 1, 2, 2]
    """
    c = F.ntile(n)
    return c.over(w) if w is not None else c


def cume_dist(w: WindowSpec | None = None) -> Column:
    """Cumulative distribution: fraction of partition rows ≤ current order
    key — integer counts divided once, so cross-engine deterministic.

    >>> [r.c for r in scores.select(cume_dist(w_ties).alias("c")).collect()]
    [0.25, 0.75, 0.75, 1.0]
    """
    c = F.cume_dist()
    return c.over(w) if w is not None else c
