"""Custom user-defined aggregates — the reference's ``step/combine/finalize``
surface, re-expressed Spark-first.

The reference lets users define aggregates as tiny classes with
``step(value)`` / ``combine(other)`` / ``finalize()``
(`stupidb/functions/associative/core.py:13-81`, `docs/usage.rst:289-297`).
PySpark cannot register JVM Aggregators, so the Spark-native mapping is an
Arrow-batched GROUPED_AGG pandas UDF: the executor hands the whole group's
values to Python in one Arrow transfer.

Two execution paths, mirroring the brief's UDF guidance:

- ``vectorized(*series)`` classmethod (preferred): one numpy/pandas
  expression over the Arrow batch — within ~2-5× of a JVM built-in.
- ``step`` loop fallback: row-at-a-time Python over the group — correct but
  10-100× slower; fine for rare aggregates, never for the hot path.

Scale note: GROUPED_AGG materializes each group in memory (no partial
aggregation / map-side combine!) — a skewed key concentrates its whole group
on one executor. For associative aggregates at 100 TB, pre-reduce with a
two-level groupBy (salt → partial via the same UDAF → final combine) or use
a built-in; this module's job is API parity, not replacing built-ins.
"""

from __future__ import annotations

from typing import Any

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F


class Aggregate:
    """Reference-style custom aggregate: subclass and implement ``step`` /
    ``finalize`` (and optionally ``combine``); add a ``vectorized``
    classmethod for the Arrow fast path."""

    def step(self, *args: Any) -> None:  # pragma: no cover - interface
        raise NotImplementedError

    def combine(self, other: "Aggregate") -> None:  # pragma: no cover
        raise NotImplementedError

    def finalize(self) -> Any:  # pragma: no cover - interface
        raise NotImplementedError


def grouped_agg(cls: type[Aggregate], return_type: str = "double"):
    """Adapt an ``Aggregate`` subclass into a GROUPED_AGG pandas UDF.

    Null handling matches the reference: rows where any input is null are
    skipped (`stupidb/functions/associative/core.py:36-44`), and an
    empty/all-null group finalizes from the fresh accumulator (NULL for
    sum-like aggregates).
    """

    def fn(*series: pd.Series):
        if hasattr(cls, "vectorized"):
            mask = ~pd.concat([s.isna() for s in series], axis=1).any(axis=1)
            clean = [s[mask] for s in series]
            return cls.vectorized(*clean)
        agg = cls()
        for vals in zip(*series):
            if any(pd.isna(v) for v in vals):
                continue
            agg.step(*vals)
        return agg.finalize()

    fn.__name__ = cls.__name__.lower()
    return F.pandas_udf(fn, return_type, F.PandasUDFType.GROUPED_AGG)


def udaf_column(cls: type[Aggregate], *cols, return_type: str = "double") -> Column:
    """One-shot helper: ``udaf_column(GeometricMean, "x")`` → aggregating
    Column usable inside ``aggregate(...)`` / ``df.agg(...)``."""
    return grouped_agg(cls, return_type)(*[F.col(c) if isinstance(c, str) else c for c in cols])


# ---------------------------------------------------------------------------
# shipped examples
# ---------------------------------------------------------------------------


class SumOfSquares(Aggregate):
    """Σx² — associative; exact for integer-valued doubles (the fixture's
    quantities), so it is DuckDB-oracle-comparable bit-for-bit."""

    def __init__(self) -> None:
        self.total = 0.0
        self.seen = False

    def step(self, x: float) -> None:
        self.total += x * x
        self.seen = True

    def combine(self, other: "SumOfSquares") -> None:
        self.total += other.total
        self.seen = self.seen or other.seen

    def finalize(self) -> float | None:
        return self.total if self.seen else None

    @classmethod
    def vectorized(cls, s: pd.Series):
        if len(s) == 0:
            return None
        # integer-valued input ⇒ exact under any summation order
        return float((s * s).sum())


class GeometricMean(Aggregate):
    """exp(mean(ln x)) over positive x — the reference-docs custom-aggregate
    example shape; floating accumulation, so verified by property tests, not
    bit-equality against an oracle."""

    def __init__(self) -> None:
        self.log_sum = 0.0
        self.n = 0

    def step(self, x: float) -> None:
        if x > 0:
            import math

            self.log_sum += math.log(x)
            self.n += 1

    def combine(self, other: "GeometricMean") -> None:
        self.log_sum += other.log_sum
        self.n += other.n

    def finalize(self) -> float | None:
        import math

        return math.exp(self.log_sum / self.n) if self.n else None

    @classmethod
    def vectorized(cls, s: pd.Series):
        import numpy as np

        pos = s[s > 0]
        if len(pos) == 0:
            return None
        return float(np.exp(np.log(pos.to_numpy()).mean()))
