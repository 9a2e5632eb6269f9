"""Deterministic cross-engine aggregates: exact unscaled-integer moments.

Problem: floating-point SUM/AVG/VAR/COV results depend on accumulation order
and algorithm (Spark merges per-partition states; DuckDB uses its own
segment-tree / sequential paths), so two engines produce doubles differing in
the last ULPs — and *any* decimal rounding of near-boundary values can then
flip, breaking hash comparison (BASELINE.md's float-drift warning, and the
reason reference tests compare via CPython on both sides,
`stupidb/tests/test_stupidb.py:677-709`).

A first attempt summed DECIMAL(30,s) — exact, but the final decimal→double
cast itself diverges between engines once the unscaled value exceeds 2^53
(Spark's BigDecimal.doubleValue is correctly rounded; DuckDB's int128/10^s
path double-rounds), observed as 1-ULP drift on Σx² sums.

Solution — every step is an identical, individually-deterministic operation
on both engines:

1. per-row unscale: ``round(x * 10^s)`` — the input doubles are identical
   (same parquet), ``*`` is one IEEE op, and ``round`` is half-away-from-zero
   on both engines ⇒ identical integers per row;
2. ``CAST(... AS BIGINT)`` — the double is an exact integer, cast is exact;
3. ``sum(BIGINT)`` — exact and order-independent under any partitioning,
   shuffle plan, or frame-evaluation strategy;
4. one ``BIGINT → DOUBLE`` cast — a single correctly-rounded hardware
   conversion on both engines;
5. ``/ 10^s`` — 10^s is exactly representable for s ≤ 22, division is one
   correctly-rounded IEEE op;
6. derived statistics (mean/var/cov/std) combine these moments with the same
   double expression on both sides ⇒ bit-identical results.

This also holds at 100 TB: exactness is independent of partition count, AQE
re-planning, or merge order — which is what makes results reproducible
run-to-run on a real cluster. Long sums also stay in Spark's fastest
whole-stage-codegen hash-agg path (no decimal slow path). Overflow envelope:
int64 carries Σ of FIRST-moment unscaled values up to 9.2e18 (≈ 10^11 rows
of 6-digit prices at scale 2 per group). SECOND moments (Σx², Σxy) square
the magnitude and overflowed int64 at the sf1 (10×) scaling rehearsal, so
they sum via ``_split_sum``: per-row q/r decomposition by 2^24 into TWO
long sums, recombined in double by an exact power-of-two multiply — still
order-independent, still bit-identical cross-engine (and bit-identical to
the unsplit sum wherever it fit), with both partial sums carrying ~5e11
rows per group. A DECIMAL(38,0) sum would also be exact but its final
decimal→double cast diverges between engines beyond 2^53 (observed, see
above) and falls off the codegen long-sum fast path.

Each helper has a Spark (Column) and a SQL (string) form so query and oracle
are generated from the same definition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from stupidb_spark.verbs import ColumnLike, _col


def _p10(scale: int) -> float:
    # exactly representable for scale <= 22
    return float(10**scale)


def _sql_p10(scale: int) -> str:
    return f"{_p10(scale):.1f}"


# --------------------------------------------------------------------------
# Spark side
# --------------------------------------------------------------------------


def _unscaled(c: ColumnLike, scale: int) -> Column:
    """Per-row exact fixed-point integer: floor(x * 10^s + 0.5) as long.

    floor-plus-half instead of round(): Spark's round() routes every value
    through java BigDecimal (~40% overhead on a sum); floor is a bare fp
    instruction returning LONG. The two differ only exactly at halfway
    points, which fixed-point inputs never produce (x·10^s lands within
    ~1e-6 of an integer), and the SQL side uses the identical expression.
    """
    return F.floor(_col(c) * F.lit(_p10(scale)) + F.lit(0.5))


def usum(c: ColumnLike, scale: int) -> Column:
    """Exact order-independent integer sum of unscaled values."""
    return F.sum(_unscaled(c, scale))


def dsum(c: ColumnLike, scale: int = 2) -> Column:
    """Exact sum of a fixed-point double column, returned as double."""
    return usum(c, scale).cast("double") / F.lit(_p10(scale))


def dsum_over(c: ColumnLike, w, scale: int = 2) -> Column:
    """Windowed exact sum (same construction over a window frame)."""
    return F.sum(_unscaled(c, scale)).over(w).cast("double") / F.lit(_p10(scale))


def dtotal(c: ColumnLike, scale: int = 2) -> Column:
    """Exact TOTAL (empty ⇒ 0.0) — stupidb's SQLite-style total,
    stupidb/functions/associative/__init__.py:127-133."""
    return F.coalesce(dsum(c, scale), F.lit(0.0))


def davg(c: ColumnLike, scale: int = 2) -> Column:
    """Exact-moment mean: exact sum / non-null count, divided in double."""
    return dsum(c, scale) / F.count(_col(c))


#: Split modulus for second-moment sums. A power of TWO, so recombining the
#: two partial sums in double is an exact exponent shift (no rounding) —
#: the recombined value is bit-identical to the single-long-sum result
#: whenever that sum fits int64, and stays cross-engine deterministic far
#: beyond it. 2^24 balances the two partial envelopes: with per-row
#: unscaled squares up to ~1e14, both sum(q) and sum(r) carry ~5e11 rows
#: per group before overflowing int64 (vs ~1e5 rows for the naive Σx² sum
#: at sf-scale prices — the sf1 rehearsal overflowed exactly there).
_SPLIT_M = 1 << 24


def _split_sum(u: Column, scale: int) -> Column:
    """Exact sum of per-row longs ``u`` that may aggregate beyond int64.

    Per row: q = floor(u / 2^24), r = u − q·2^24 ∈ [0, 2^24). Each per-row
    step is exact (|u| ≤ ~1e14 < 2^53, division by a power of two is an
    exponent shift, floor on an exact double is exact) and textually
    identical on the SQL side. Both long sums are then cast to double and
    recombined: sum(q)·2^24 is EXACT while sum(q) < 2^53 (power-of-two
    multiply), the final add is one correctly-rounded IEEE op on both
    engines ⇒ bit-identical CROSS-ENGINE (Spark and DuckDB evaluate the
    identical split construction). Vs the UNSPLIT long sum the result is
    bit-identical while BOTH partial sums stay below 2^53; past that the
    cast+add double-rounds and can differ 1 ULP from a single long→double
    cast of the total — irrelevant to the parity gate, which compares the
    split form against itself on both engines.
    """
    q = F.floor(u.cast("double") / F.lit(float(_SPLIT_M)))
    r = u - q * F.lit(_SPLIT_M)
    total = F.sum(q).cast("double") * F.lit(float(_SPLIT_M)) + F.sum(r).cast(
        "double"
    )
    return total / F.lit(_p10(scale))


def _s2(c: ColumnLike, scale: int) -> Column:
    x = _col(c)
    return _split_sum(_unscaled(x * x, scale * 2), scale * 2)


def dvar_samp(c: ColumnLike, scale: int = 2) -> Column:
    """Sample variance from exact moments: (Σx² − (Σx)²/n) / (n−1)."""
    n = F.count(_col(c)).cast("double")
    s1 = dsum(c, scale)
    return (_s2(c, scale) - s1 * s1 / n) / (n - 1)


def dvar_pop(c: ColumnLike, scale: int = 2) -> Column:
    n = F.count(_col(c)).cast("double")
    s1 = dsum(c, scale)
    return (_s2(c, scale) - s1 * s1 / n) / n


def dstddev_samp(c: ColumnLike, scale: int = 2) -> Column:
    return F.sqrt(dvar_samp(c, scale))


def dstddev_pop(c: ColumnLike, scale: int = 2) -> Column:
    return F.sqrt(dvar_pop(c, scale))


def _cov_parts(x: ColumnLike, y: ColumnLike, scale: int):
    cx, cy = _col(x), _col(y)
    n = F.count(F.when(cx.isNotNull() & cy.isNotNull(), 1)).cast("double")
    sx = (
        F.sum(_unscaled(F.when(cy.isNotNull(), cx), scale)).cast("double")
        / F.lit(_p10(scale))
    )
    sy = (
        F.sum(_unscaled(F.when(cx.isNotNull(), cy), scale)).cast("double")
        / F.lit(_p10(scale))
    )
    sxy = _split_sum(_unscaled(cx * cy, scale * 2), scale * 2)
    return n, sx, sy, sxy


def dcovar_samp(x: ColumnLike, y: ColumnLike, scale: int = 2) -> Column:
    """Sample covariance from exact moments: (Σxy − ΣxΣy/n) / (n−1)."""
    n, sx, sy, sxy = _cov_parts(x, y, scale)
    return (sxy - sx * sy / n) / (n - 1)


def dcovar_pop(x: ColumnLike, y: ColumnLike, scale: int = 2) -> Column:
    n, sx, sy, sxy = _cov_parts(x, y, scale)
    return (sxy - sx * sy / n) / n


def dround(c: ColumnLike, scale: int = 6) -> Column:
    """Deterministic decimal rounding of a non-negative double: one multiply,
    one floor (long), one exact long→double cast, one divide — identical IEEE
    ops on both engines, unlike round() whose BigDecimal path can flip a
    halfway-boundary last digit differently per engine."""
    return F.floor(_col(c) * F.lit(_p10(scale)) + F.lit(0.5)).cast(
        "double"
    ) / F.lit(_p10(scale))


# --------------------------------------------------------------------------
# SQL (DuckDB oracle) side — the same construction, textually
# --------------------------------------------------------------------------


def _sql_unscaled(expr: str, scale: int) -> str:
    return f"CAST(floor(({expr}) * {_sql_p10(scale)} + 0.5) AS BIGINT)"


def sql_usum(expr: str, scale: int) -> str:
    # DuckDB sum(BIGINT) returns HUGEINT; narrow back to BIGINT (exact in our
    # envelope) so the int→double cast is the same single hardware conversion
    # Spark performs.
    return f"CAST(sum({_sql_unscaled(expr, scale)}) AS BIGINT)"


def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"(CAST({sql_usum(expr, scale)} AS DOUBLE) / {_sql_p10(scale)})"


def sql_dsum_over(expr: str, over: str, scale: int = 2) -> str:
    return (
        f"(CAST(sum({_sql_unscaled(expr, scale)}) OVER {over} AS DOUBLE)"
        f" / {_sql_p10(scale)})"
    )


def sql_dtotal(expr: str, scale: int = 2) -> str:
    return f"coalesce({sql_dsum(expr, scale)}, 0.0)"


def sql_davg(expr: str, scale: int = 2) -> str:
    return f"({sql_dsum(expr, scale)} / count({expr}))"


def _sql_split_sum(expr: str, scale: int) -> str:
    """SQL twin of ``_split_sum``: the same per-row q/r decomposition and
    the same double recombination, textually (see the Spark form for the
    exactness argument). DuckDB's HUGEINT sums are narrowed to BIGINT before
    the cast, like ``sql_usum``."""
    u = _sql_unscaled(expr, scale)
    m_f = f"{float(_SPLIT_M):.1f}"
    q = f"CAST(floor(CAST({u} AS DOUBLE) / {m_f}) AS BIGINT)"
    r = f"({u} - {q} * {_SPLIT_M})"
    total = (
        f"(CAST(CAST(sum({q}) AS BIGINT) AS DOUBLE) * {m_f}"
        f" + CAST(CAST(sum({r}) AS BIGINT) AS DOUBLE))"
    )
    return f"({total} / {_sql_p10(scale)})"


def _sql_s2(expr: str, scale: int) -> str:
    return _sql_split_sum(f"({expr}) * ({expr})", scale * 2)


def sql_dvar_samp(expr: str, scale: int = 2) -> str:
    s1, s2 = sql_dsum(expr, scale), _sql_s2(expr, scale)
    n = f"CAST(count({expr}) AS DOUBLE)"
    return f"(({s2} - {s1} * {s1} / {n}) / ({n} - 1))"


def sql_dvar_pop(expr: str, scale: int = 2) -> str:
    s1, s2 = sql_dsum(expr, scale), _sql_s2(expr, scale)
    n = f"CAST(count({expr}) AS DOUBLE)"
    return f"(({s2} - {s1} * {s1} / {n}) / {n})"


def sql_dstddev_samp(expr: str, scale: int = 2) -> str:
    return f"sqrt({sql_dvar_samp(expr, scale)})"


def sql_dstddev_pop(expr: str, scale: int = 2) -> str:
    return f"sqrt({sql_dvar_pop(expr, scale)})"


def sql_dround(expr: str, scale: int = 6) -> str:
    return (
        f"(CAST(CAST(floor(({expr}) * {_sql_p10(scale)} + 0.5) AS BIGINT)"
        f" AS DOUBLE) / {_sql_p10(scale)})"
    )


def sql_dcovar(x: str, y: str, scale: int = 2, *, samp: bool = True) -> str:
    n = (
        f"CAST(count(CASE WHEN ({x}) IS NOT NULL AND ({y}) IS NOT NULL "
        f"THEN 1 END) AS DOUBLE)"
    )
    sx = sql_dsum(f"CASE WHEN ({y}) IS NOT NULL THEN ({x}) END", scale)
    sy = sql_dsum(f"CASE WHEN ({x}) IS NOT NULL THEN ({y}) END", scale)
    sxy = _sql_split_sum(f"({x}) * ({y})", scale * 2)
    denom = f"({n} - 1)" if samp else n
    return f"(({sxy} - {sx} * {sy} / {n}) / {denom})"
