"""The reference's 12 aggregate functions as native Column expressions.

Reference implementations are tiny step/combine/finalize classes in
`stupidb/functions/associative/__init__.py`; we map each to the Spark
built-in (SURVEY.md §2.4 table), which runs as partial+final hash
aggregation with spill — map-side combine is what keeps these cheap at
100 TB (the shuffle carries one state row per group per partition, not raw
rows).

NULL semantics match SQL and the reference: aggregates skip nulls
(`stupidb/functions/associative/__init__.py:82-84,114-117`); ``sum`` of an
empty/all-null group is NULL while ``total`` is 0.0 (SQLite TOTAL,
`stupidb/functions/associative/__init__.py:127-133`).

Note the reference's Covariance.step has a math bug (`:235` — adds count
instead of dividing); per SURVEY.md quirk Q5 we use Spark's correct
``covar_*`` and match the DuckDB oracle, not the reference's wrong values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from stupidb_spark.verbs import ColumnLike, _col


def count(c: ColumnLike) -> Column:
    """Count of non-null (`stupidb/functions/associative/__init__.py:74-96`)."""
    return F.count(_col(c))


def sum(c: ColumnLike) -> Column:  # noqa: A001 - mirrors reference name
    """Sum; empty/all-null ⇒ NULL (`:98-124`)."""
    return F.sum(_col(c))


def total(c: ColumnLike) -> Column:
    """Sum; empty ⇒ 0.0 — SQLite's TOTAL (`:127-133`)."""
    return F.coalesce(F.sum(_col(c)), F.lit(0.0))


def mean(c: ColumnLike) -> Column:
    """Arithmetic mean; empty ⇒ NULL (`:136-150`)."""
    return F.avg(_col(c))


def min(c: ColumnLike) -> Column:  # noqa: A001
    return F.min(_col(c))


def max(c: ColumnLike) -> Column:  # noqa: A001
    return F.max(_col(c))


def cov_samp(x: ColumnLike, y: ColumnLike) -> Column:
    """Sample covariance (`:210-265`; reference math bug Q5 not replicated)."""
    return F.covar_samp(_col(x), _col(y))


def cov_pop(x: ColumnLike, y: ColumnLike) -> Column:
    return F.covar_pop(_col(x), _col(y))


def var_samp(c: ColumnLike) -> Column:
    return F.var_samp(_col(c))


def var_pop(c: ColumnLike) -> Column:
    return F.var_pop(_col(c))


def stdev_samp(c: ColumnLike) -> Column:
    return F.stddev_samp(_col(c))


def stdev_pop(c: ColumnLike) -> Column:
    return F.stddev_pop(_col(c))


def first(c: ColumnLike) -> Column:
    """First non-null value — the reference's ``first`` ALWAYS skips nulls
    (`stupidb/functions/navigation/__init__.py:94-98`; quirk Q1)."""
    return F.first(_col(c), ignorenulls=True)


def last(c: ColumnLike) -> Column:
    """Last non-null value (`stupidb/functions/navigation/__init__.py:106-110`)."""
    return F.last(_col(c), ignorenulls=True)
