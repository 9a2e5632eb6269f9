"""Leakage-safe train/val/test splitting — group-cohesive dataset splits.

Splitting a training corpus row-by-row leaks: near-identical documents
from one site (or one conversation, one repo, one user) land on both
sides of the train/eval fence and the eval set stops measuring
generalization. The standard fix is to split by GROUP — every document
whose group key (domain, repo, user id) hashes into the holdout bucket
goes there together, so no group straddles a split.

Scale shape: the split decision is one deterministic hash of the group
column — a scan-fused, shuffle-free Column expression. At 100 TB this is
a zero-cost tag: no sampling job, no join against a membership table, no
RNG (a resumed/replayed job assigns identically, which ``rand()``-based
splitting does not guarantee under task retry — the same discipline as
``queryset/sampling.py``).

No reference parity: the reference has no sampling/split surface; this is
beyond-reference (SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# hash resolution: per-myriad (1/10_000) bucket granularity
_RES = 10_000


def split_column(
    group: Column | str,
    fractions: dict[str, float],
    *,
    salt: int = 0,
) -> Column:
    """The split tag as a Column: ``xxhash64(group, salt)`` bucketed into
    cumulative ``fractions`` ranges (values must sum to 1.0 within 1e-9).

    Same group value ⇒ same bucket ⇒ same split, by construction. ``salt``
    re-deals the assignment (a new holdout for a new run) without touching
    the cohesion law. Fractions resolve at 1/10_000 granularity.
    """
    if not fractions:
        raise ValueError("at least one split required")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1.0, got {total}")
    bucket = F.pmod(
        F.xxhash64(F.col(group) if isinstance(group, str) else group, F.lit(salt)),
        F.lit(_RES),
    )
    # cumulative upper bounds; the last split absorbs rounding residue so
    # every bucket maps to exactly one split
    names = list(fractions)
    bounds, acc = [], 0
    for n in names[:-1]:
        acc += round(fractions[n] * _RES)
        bounds.append(acc)
    expr = F.lit(names[-1])
    for n, b in zip(reversed(names[:-1]), reversed(bounds)):
        expr = F.when(bucket < b, F.lit(n)).otherwise(expr)
    return expr


def leakproof_split(
    df: DataFrame,
    group_col: str,
    fractions: dict[str, float],
    *,
    salt: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Tag every row with its group-cohesive split assignment.

    >>> d = spark.createDataFrame(
    ...     [(i, f"dom{i % 7}") for i in range(100)], "id long, domain string"
    ... )
    >>> out = leakproof_split(d, "domain", {"train": 0.8, "val": 0.1, "test": 0.1})
    >>> out.groupBy("domain", "split").count().groupBy("domain").count() \\
    ...    .filter("count > 1").count()  # no domain straddles splits
    0
    """
    return df.withColumn(out_col, split_column(group_col, fractions, salt=salt))
