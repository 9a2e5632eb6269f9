"""Core relational verbs — the dplyr-flavored user API.

This is the Spark-native re-expression of the reference's operator surface
(`stupidb/api.py`): the same verb names and `>>` pipe composition, but every
verb compiles to native ``pyspark.sql.DataFrame`` / ``Column`` operations so
Catalyst sees the whole plan (predicate pushdown, column pruning, join
selection — all absent in the reference, SURVEY.md §4.1 — come for free).

Design deltas from the reference, deliberate (SURVEY.md §2.9 quirk register):

- Columns are ``pyspark.sql.Column`` expressions, never opaque Python lambdas
  (`stupidb/api.py:84-87` uses ``Callable[[Row], Any]`` — lambdas would
  defeat Catalyst entirely).
- Joins take Column predicates; Catalyst picks broadcast-hash / sort-merge /
  BNLJ, instead of the reference's always-nested-loop over an eagerly
  materialized Cartesian product (`stupidb/core.py:328-340`).
- ``full_join`` is implemented (the reference declares it and raises
  ``NotImplementedError``, `stupidb/api.py:261-265`).
- ``intersect_all`` / ``difference_all`` follow SQL bag semantics
  (`intersectAll` / `exceptAll`), deviating from the reference's non-SQL
  behavior (`stupidb/core.py:437-450,479-490`; quirk Q4).
- Sorting supports descending order (reference is ascending-only,
  `docs/usage.rst:174-175`) and both null orderings (default NULLS FIRST to
  match the reference, `stupidb/aggregation.py:43-48`).

Pipe style::

    result = (
        lineitem
        >> sift(F.col("l_shipdate") <= "1998-09-02")
        >> group_by("l_returnflag", "l_linestatus")
        >> aggregate(sum_qty=F.sum("l_quantity"))
        >> order_by("l_returnflag")
    )
"""

from __future__ import annotations

from collections.abc import Callable
from enum import Enum
from typing import Any, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnLike = Union[Column, str]


def _col(c: ColumnLike) -> Column:
    return F.col(c) if isinstance(c, str) else c


class Nulls(Enum):
    """Null ordering for sorts; reference default is FIRST
    (`stupidb/aggregation.py:43-48,421-448`)."""

    FIRST = "first"
    LAST = "last"


class Verb:
    """A pipeable relational operator: ``df >> verb`` or ``verb(df)``.

    The reference builds this with a curried-constructor ``__rrshift__``
    (`stupidb/api.py:91-99`); here a verb is just a deferred function from
    DataFrame to DataFrame — the "plan" it builds is Spark's logical plan.
    """

    __slots__ = ("_fn", "_name")

    def __init__(self, fn: Callable[[Any], Any], name: str = "verb") -> None:
        self._fn = fn
        self._name = name

    def __rrshift__(self, df):
        return self._fn(df)

    def __call__(self, df):
        return self._fn(df)

    def __rshift__(self, other: "Verb") -> "Verb":
        # verb composition: (v1 >> v2)(df) == v2(v1(df))
        return Verb(lambda df: other(self._fn(df)), f"{self._name}>>{other._name}")

    def __repr__(self) -> str:  # pragma: no cover
        return f"<Verb {self._name}>"


class GroupedFrame:
    """Marker produced by ``group_by``; consumed by ``aggregate``.

    Mirrors the reference's two-step ``GroupBy`` → ``Aggregation``
    (`stupidb/core.py:249-268,184-224`): ``GroupBy`` only records the
    partitioners; ``aggregate`` performs the hash aggregation. Spark runs it
    as partial (map-side) + final hash agg with spill — the reference is
    single-phase in-memory only.
    """

    __slots__ = ("df", "keys")

    def __init__(self, df: DataFrame, keys: list[Column]) -> None:
        self.df = df
        self.keys = keys


# ---------------------------------------------------------------------------
# projection / filter  (reference: stupidb/api.py:307-428, core.py:94-246)
# ---------------------------------------------------------------------------


def select(*cols: ColumnLike, **named: Column) -> Verb:
    """Replacement projection; window expressions allowed as columns
    (reference evaluates window specs inline in select, `stupidb/core.py:94-164`;
    Spark does the same with ``expr.over(window)`` columns).

    >>> (people >> select("name", bal2=F.col("balance") * 2)
    ...         >> order_by("name")).show()
    +-----+----+
    | name|bal2|
    +-----+----+
    |alice|   4|
    |  bob|  -2|
    |  eve|   8|
    +-----+----+
    <BLANKLINE>
    """
    exprs = [_col(c) for c in cols] + [c.alias(n) for n, c in named.items()]
    return Verb(lambda df: df.select(*exprs), "select")


def mutate(**named: Column) -> Verb:
    """Appending projection (reference ``mutate``, `stupidb/api.py:353-397`).

    >>> (people >> mutate(positive=F.col("balance") > 0)
    ...         >> order_by("name")).columns
    ['name', 'balance', 'positive']
    """
    return Verb(lambda df: df.withColumns(dict(named)), "mutate")


def sift(predicate: Column) -> Verb:
    """Row filter (reference ``sift``, `stupidb/api.py:400-428`). The Column
    predicate reaches the parquet scan via Catalyst pushdown.

    >>> (people >> sift(F.col("balance") > 0) >> order_by("name")).count()
    2
    """
    return Verb(lambda df: df.filter(predicate), "sift")


def distinct() -> Verb:
    return Verb(lambda df: df.distinct(), "distinct")


def rename(**mapping: str) -> Verb:
    """new_name=old_name pairs."""
    return Verb(
        lambda df: df.withColumnsRenamed({old: new for new, old in mapping.items()}),
        "rename",
    )


def const(x: Any) -> Column:
    """Constant column (reference ``const``, `stupidb/api.py:78-81`)."""
    return F.lit(x)


def get(name: str) -> Column:
    """Named-column getter (reference ``get``, `stupidb/api.py:84-87`)."""
    return F.col(name)


# ---------------------------------------------------------------------------
# joins  (reference: stupidb/api.py:134-265, core.py:328-395 — all nested-loop;
# here Catalyst picks the physical strategy)
# ---------------------------------------------------------------------------


def _join(
    right: DataFrame,
    on: Column | list[str] | str | None,
    how: str,
    *,
    broadcast_right: bool = False,
) -> Verb:
    r = F.broadcast(right) if broadcast_right else right

    def fn(left: DataFrame) -> DataFrame:
        if on is None:
            return left.crossJoin(r)
        return left.join(r, on=on, how=how)

    return Verb(fn, f"join[{how}]")


def cross_join(right: DataFrame) -> Verb:
    """Cartesian product (`stupidb/api.py:134-178`)."""
    return _join(right, None, "cross")


def inner_join(right: DataFrame, on, *, broadcast: bool = False) -> Verb:
    """Theta/equi inner join (`stupidb/api.py:181-220`). Pass ``broadcast=True``
    for a small right side to force a broadcast-hash join."""
    return _join(right, on, "inner", broadcast_right=broadcast)


def left_join(right: DataFrame, on, *, broadcast: bool = False) -> Verb:
    """Left outer join; unmatched left rows null-padded — matches the
    reference's dict.fromkeys padding (`stupidb/core.py:363-382`)."""
    return _join(right, on, "left", broadcast_right=broadcast)


def right_join(right: DataFrame, on) -> Verb:
    """Right outer join (`stupidb/api.py:242-258`)."""
    return _join(right, on, "right")


def full_join(right: DataFrame, on) -> Verb:
    """Full outer join — declared-but-unimplemented in the reference
    (`stupidb/api.py:261-265`); first-class here."""
    return _join(right, on, "full")


def semi_join(right: DataFrame, on, *, broadcast: bool = False) -> Verb:
    """First-class EXISTS: the reference expresses this as a correlated
    per-row ``exists()`` re-execution (`stupidb/api.py:431-438`, O(n·m));
    Spark plans a hash left-semi join."""
    return _join(right, on, "left_semi", broadcast_right=broadcast)


def anti_join(right: DataFrame, on, *, broadcast: bool = False) -> Verb:
    """NOT EXISTS dual of ``semi_join``."""
    return _join(right, on, "left_anti", broadcast_right=broadcast)


# ---------------------------------------------------------------------------
# aggregation  (reference: stupidb/api.py:441-603, core.py:184-268)
# ---------------------------------------------------------------------------


def group_by(*cols: ColumnLike, **named: Column) -> Verb:
    """Attach grouping keys (reference ``group_by`` just records partitioners,
    `stupidb/core.py:249-268`). Computed keys supported via kwargs:
    ``group_by(positive=F.col("balance") > 0)``."""
    keys = [_col(c) for c in cols] + [c.alias(n) for n, c in named.items()]
    return Verb(lambda df: GroupedFrame(df, keys), "group_by")


def aggregate(**aggs: Column) -> Verb:
    """Hash aggregation over the attached keys; a bare DataFrame aggregates
    as one global group — same contract as the reference
    (`stupidb/core.py:200-224`, empty partitioners ⇒ single group).

    >>> (people >> group_by(positive=F.col("balance") > 0)
    ...         >> aggregate(n=F.count(F.lit(1)), total=F.sum("balance"))
    ...         >> order_by("positive")).show()
    +--------+---+-----+
    |positive|  n|total|
    +--------+---+-----+
    |   false|  1|   -1|
    |    true|  2|    6|
    +--------+---+-----+
    <BLANKLINE>

    >>> (people >> aggregate(n=F.count(F.lit(1)))).collect()[0].n
    3
    """

    def fn(obj) -> DataFrame:
        exprs = [c.alias(n) for n, c in aggs.items()]
        if isinstance(obj, GroupedFrame):
            return obj.df.groupBy(*obj.keys).agg(*exprs)
        return obj.agg(*exprs)

    return Verb(fn, "aggregate")


def count_rows(alias: str = "count") -> Verb:
    """Convenience: COUNT(*) per group or globally."""
    return aggregate(**{alias: F.count(F.lit(1))})


# ---------------------------------------------------------------------------
# sort / limit  (reference: stupidb/api.py:268-304,718-737)
# ---------------------------------------------------------------------------


def order_by(*keys: ColumnLike, nulls: Nulls = Nulls.FIRST, desc: bool = False) -> Verb:
    """Total sort. Reference is ascending-only with Nulls.FIRST default
    (`stupidb/api.py:268-304`); we add ``desc`` (additive). Spark's SortExec
    is range-partitioned and spillable — the reference sorts fully in memory
    (`stupidb/core.py:294-306`).

    String keys get the ``nulls``/``desc`` treatment; Column keys pass
    through untouched so callers can mix directions:
    ``order_by(F.col("price").desc(), "orderkey")``.
    """

    def sort_key(c: ColumnLike) -> Column:
        if not isinstance(c, str):
            return c
        col = F.col(c)
        if desc:
            return col.desc_nulls_first() if nulls is Nulls.FIRST else col.desc_nulls_last()
        return col.asc_nulls_first() if nulls is Nulls.FIRST else col.asc_nulls_last()

    return Verb(lambda df: df.orderBy(*[sort_key(k) for k in keys]), "order_by")


def limit(n: int, *, offset: int = 0) -> Verb:
    """LIMIT/OFFSET (`stupidb/api.py:718-737` — islice semantics). With a
    preceding order_by, Catalyst fuses to TakeOrderedAndProject.

    >>> [r.name for r in (people >> order_by("name") >> limit(2, offset=1)).collect()]
    ['bob', 'eve']
    """
    if n is not None and n < 0:
        raise ValueError(f"limit must be non-negative, got {n}")
    if offset < 0:
        raise ValueError(f"offset must be non-negative, got {offset}")

    def fn(df: DataFrame) -> DataFrame:
        out = df.offset(offset) if offset else df
        return out.limit(n) if n is not None else out

    return Verb(fn, "limit")


def top_k(k: int, *keys: ColumnLike, desc: bool = True) -> Verb:
    """order_by >> limit, fused by Catalyst into TakeOrderedAndProject —
    the reference composes the same two verbs (SURVEY.md §2.6)."""
    return order_by(*keys, desc=desc) >> limit(k)


# ---------------------------------------------------------------------------
# set operations  (reference: stupidb/api.py:606-699, core.py:408-490)
# ---------------------------------------------------------------------------


def union(right: DataFrame) -> Verb:
    """Distinct union (`stupidb/core.py:416-425`)."""
    return Verb(lambda df: df.unionByName(right).distinct(), "union")


def union_all(right: DataFrame) -> Verb:
    """Bag union / concatenation (`stupidb/core.py:428-434`)."""
    return Verb(lambda df: df.unionByName(right), "union_all")


def intersect(right: DataFrame) -> Verb:
    """Distinct intersection (`stupidb/core.py:453-462`)."""
    return Verb(lambda df: df.intersect(right), "intersect")


def intersect_all(right: DataFrame) -> Verb:
    """SQL INTERSECT ALL (min-multiplicity bag semantics). Deliberate
    deviation from the reference's dedup-both-sides-emit-twice behavior
    (`stupidb/core.py:437-450`; quirk Q4 — DuckDB is the oracle)."""
    return Verb(lambda df: df.intersectAll(right), "intersect_all")


def difference(right: DataFrame) -> Verb:
    """SQL EXCEPT (distinct) (`stupidb/core.py:465-476`)."""
    return Verb(lambda df: df.subtract(right), "difference")


def difference_all(right: DataFrame) -> Verb:
    """SQL EXCEPT ALL (multiset subtraction). Deviates from the reference's
    keep-every-copy behavior (`stupidb/core.py:479-490`; quirk Q4)."""
    return Verb(lambda df: df.exceptAll(right), "difference_all")



def exists(relation: DataFrame) -> bool:
    """Whether the relation is non-empty — the reference's ``exists``
    (`stupidb/api.py:431-438`), which it uses per-row for correlated EXISTS.

    Here it is a driver-side boolean over any DataFrame (one `take(1)`);
    set-based EXISTS/NOT EXISTS belongs in :func:`semi_join` /
    :func:`anti_join`, which is what the reference's O(n·m) per-row pattern
    compiles to on Spark.
    """
    return bool(relation.take(1))


def pretty(df: DataFrame, *, n: int = 10) -> str:
    """Materialize ≤ n rows into a table string — the reference's ``pretty``
    (`stupidb/api.py:1016-1076`). Uses Spark's own renderer."""
    return df._show_string(n)


__all__ = [
    "Nulls",
    "Verb",
    "GroupedFrame",
    "select",
    "mutate",
    "sift",
    "distinct",
    "rename",
    "const",
    "get",
    "cross_join",
    "inner_join",
    "left_join",
    "right_join",
    "full_join",
    "semi_join",
    "anti_join",
    "group_by",
    "aggregate",
    "count_rows",
    "order_by",
    "limit",
    "top_k",
    "union",
    "union_all",
    "intersect",
    "intersect_all",
    "difference",
    "difference_all",
    "exists",
    "pretty",
]
