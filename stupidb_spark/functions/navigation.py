"""Navigation window functions: lead / lag / nth / first / last.

Reference: `stupidb/functions/navigation/__init__.py`. Two reference quirks
matter (SURVEY.md §2.9):

- Q1: ``first``/``last`` always skip nulls → we use ``ignorenulls=True``
  (exposed from ``stupidb_spark.functions.aggregates``).
- Q7: the reference allows *per-row callable* offsets/defaults for
  lead/lag/nth (`stupidb/api.py:841-888,805-820`). Spark's native lead/lag
  require literal offsets — the fast path. Dynamic (Column) offsets take the
  documented slow path: ``element_at(collect_list(x) over partition, idx)``.

Scale note: the dynamic path materializes the whole partition per row in the
worst case — it is deliberately segregated so the constant-offset path stays
a native, codegen'd WindowExec. Partitions must be bounded (they are for any
sane partition_by) for the dynamic path to be safe at 100 TB — and that
contract is now *enforced*: every dynamic path guards the collected array
with ``assert_true(size <= DYNAMIC_PARTITION_ROW_CAP)``, so a skewed
partition key fails the job loudly with the offending cardinality in the
message instead of silently OOMing an executor. Callers with genuinely
large-but-bounded partitions can raise ``max_partition_rows`` explicitly
(or pass ``None`` to waive the guard and own the memory math).
"""

from __future__ import annotations

from pyspark.sql import Column, WindowSpec
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stupidb_spark.verbs import ColumnLike, _col

#: Default per-partition row cap for the dynamic (collect_list-backed)
#: paths. 2^20 rows ≈ 8 MB of longs per materialized array — loud-fail
#: territory, well before executor-OOM territory.
DYNAMIC_PARTITION_ROW_CAP = 1 << 20

#: Schema-metadata key carrying a :func:`with_frame_values` array's frame
#: scope. The METADATA is the authoritative tag — it lives on the column in
#: the DataFrame schema, so it survives name reuse across queries in a
#: long-lived driver. Read it back with :func:`frame_values`.
FRAME_SCOPE_META_KEY = "stupidb_spark.frame_scope"

#: Explicit-argument sentinel: ``max_partition_rows`` defaults to this so a
#: caller passing the numerically equal literal (or None) alongside
#: ``values=`` is still detected as "explicitly passed" — an identity check
#: on an int would false-positive on interning (ADVICE r7).
_UNSET = object()

#: Fallback frame-scope registry for consumers that reference a
#: :func:`with_frame_values` column with a bare ``F.col(name)`` instead of
#: :func:`frame_values` (which carries the authoritative schema-metadata
#: tag). Keyed by column name, valued by the SET of scopes ever registered
#: under that name: a name reused with a different scope becomes ambiguous
#: and downgrades verification to a warning instead of silently letting the
#: last registration win (a stale "frame" entry would false-error a correct
#: "whole" array, and vice versa silently pass a wrong one). Bounded:
#: oldest entries are evicted past ``_FRAME_SCOPES_MAX``.
_FRAME_SCOPES: dict[str, set[str]] = {}
_FRAME_SCOPES_MAX = 4096


def _column_name(col: Column) -> str | None:
    """Best-effort simple attribute name of ``col`` (None for expressions)."""
    import re

    m = re.fullmatch(r"Column<'([A-Za-z0-9_]+)'>", str(col))
    return m.group(1) if m else None


def _values_scope(values: Column) -> str | None:
    """Resolve a shared array's frame scope: the Python-side tag attached by
    :func:`frame_values` is authoritative; a bare ``F.col(name)`` falls back
    to the process-wide name registry, which returns a scope only when the
    name was ever registered with exactly ONE scope (ambiguous names —
    reused across queries with different scopes — return ``"ambiguous"``)."""
    # NOT getattr: Column.__getattr__ turns unknown attributes into struct
    # field accesses (a new Column), so a plain getattr on an untagged
    # column would "find" a tag. Instance-dict lookup sidesteps that.
    tagged = values.__dict__.get("_stupidb_frame_scope")
    if tagged is not None:
        return tagged
    name = _column_name(values)
    scopes = _FRAME_SCOPES.get(name) if name else None
    if not scopes:
        return None
    return next(iter(scopes)) if len(scopes) == 1 else "ambiguous"


def _check_shared_values(
    values: Column, max_partition_rows, *, need_whole: bool, what: str
) -> None:
    """Validate a shared ``values`` array passed to nth/lead/lag.

    - An explicitly passed ``max_partition_rows`` alongside ``values`` is a
      contract error: the cap lives with the array (set it in
      :func:`with_frame_values`), and silently ignoring the argument here
      would leave the caller believing an unguarded array is capped.
    - Dynamic lead/lag index positionally (row_number against the array), so
      the array MUST span the whole partition; a running-frame array would
      produce silently wrong shifts. Arrays fetched with :func:`frame_values`
      carry the authoritative schema-metadata tag; bare ``F.col(name)``
      references fall back to the name registry, and names reused with
      different scopes (long-lived driver) degrade to a warning rather than
      trusting a possibly-stale registration.
    """
    import warnings

    if max_partition_rows is not _UNSET:
        raise ValueError(
            f"{what}: max_partition_rows is ignored when values= is "
            "supplied — the guard belongs to the shared array; pass the cap "
            "to with_frame_values instead"
        )
    if not need_whole:
        return
    scope = _values_scope(values)
    if scope == "frame":
        raise ValueError(
            f"{what}: shared values array '{_column_name(values)}' was "
            "materialized over a bounded frame (scope='frame'), but dynamic "
            "lead/lag index positionally against the WHOLE partition — "
            "rebuild it with with_frame_values(..., scope='whole')"
        )
    if scope == "ambiguous":
        warnings.warn(
            f"{what}: column name '{_column_name(values)}' was registered "
            "by with_frame_values with MORE THAN ONE scope in this process, "
            "so the name alone can't verify whole-partition coverage — "
            "fetch the array with frame_values(df, name), which carries the "
            "authoritative schema-metadata tag",
            stacklevel=3,
        )
    elif scope is None:
        warnings.warn(
            f"{what}: cannot verify that the shared values array covers the "
            "whole partition (not produced by with_frame_values); wrong-"
            "frame arrays produce silently wrong shifts",
            stacklevel=3,
        )


def _partition_guard(
    values: Column, result: Column, cap: int | None, what: str
) -> Column:
    """Fail loudly when a dynamic-path partition exceeds ``cap`` rows.

    ``assert_true`` returns NULL when the predicate holds (so the guard is
    a no-op wrapper around ``result``) and raises a SparkRuntimeException
    naming the operator and observed cardinality when it doesn't. The
    assertion evaluates per row but against the already-materialized array,
    so it adds no extra pass.
    """
    if cap is None:
        return result
    ok = F.assert_true(
        F.size(values) <= F.lit(cap),
        F.concat(
            F.lit(f"{what}: dynamic-offset window partition holds "),
            F.size(values).cast("string"),
            F.lit(
                f" rows, over the max_partition_rows cap of {cap}; "
                "repartition on a finer key or raise the cap explicitly"
            ),
        ),
    )
    return F.when(ok.isNull(), result)


def with_frame_values(
    df,
    name: str,
    c: ColumnLike,
    w: WindowSpec,
    *,
    scope: str = "frame",
    max_partition_rows: int | None = DYNAMIC_PARTITION_ROW_CAP,
    what: str = "frame_values",
):
    """Materialize ONE guarded ``collect_list`` array column for the frame of
    ``w`` — the sharing primitive for multi-output dynamic navigation.

    Catalyst does NOT common-subexpression-eliminate window expressions:
    every *reference* to ``collect_list(...).over(w)`` inside a projection
    plans its own collect_list, and WindowExec maintains (and per-row
    copies) an independent array buffer for each. A select with three
    dynamic ``nth`` columns plus a dynamic ``lag`` plans ~12 of them. This
    helper materializes the raw array under a real attribute first (so the
    Window node computes exactly one collect_list per frame), then wraps the
    *attribute* in the bounded-partition guard — attribute references are
    free, so N downstream consumers share one array and one guard::

        df = with_frame_values(df, "__arr", "x", running, what="nth")
        out = df.select(
            nth("x", -1, w=running, values=F.col("__arr")).alias("last"),
            nth("x", -2, w=running, values=F.col("__arr")).alias("prev"),
        )

    The guard wraps the array itself (NULL-or-raise), so every consumer of
    the column inherits the bounded-partition contract without re-asserting.
    Values are struct-wrapped (``.v``) so NULL data values keep their
    positions, exactly as the per-call dynamic paths do.

    ``scope`` declares — and for ``"whole"``, *constructs* — the frame the
    array covers, and tags the column so consumers can verify it:

    - ``"whole"``: collect over the entire partition of ``w`` (the frame is
      rebuilt internally as unbounded-to-unbounded, so the tag is true by
      construction). Required for dynamic :func:`lead`/:func:`lag`, whose
      index math is positional against ``row_number``.
    - ``"frame"`` (default): collect over ``w`` exactly as given. Only valid
      as :func:`nth` input over that same frame; dynamic lead/lag reject it.

    Returns ``df`` with the guarded array column ``name`` added.
    """
    if scope not in ("whole", "frame"):
        raise ValueError(f"scope must be 'whole' or 'frame', got {scope!r}")
    if scope == "whole":
        w = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    raw = f"__{name}_raw"
    out = df.withColumn(
        raw, F.collect_list(F.struct(_col(c).alias("v"))).over(w)
    )
    # name-registry fallback (bare F.col(name) consumers): record the SET of
    # scopes ever seen under this name, bounded
    _FRAME_SCOPES.setdefault(name, set()).add(scope)
    while len(_FRAME_SCOPES) > _FRAME_SCOPES_MAX:
        _FRAME_SCOPES.pop(next(iter(_FRAME_SCOPES)))
    guarded = _partition_guard(
        F.col(raw), F.col(raw), max_partition_rows, what
    )
    # authoritative tag: schema metadata on the materialized column, read
    # back by frame_values() — survives name reuse in a long-lived driver
    return out.withColumn(
        name, guarded.alias(name, metadata={FRAME_SCOPE_META_KEY: scope})
    ).drop(raw)


def frame_values(df, name: str) -> Column:
    """Fetch a :func:`with_frame_values` array column with its authoritative
    frame-scope tag (schema metadata) attached, so dynamic :func:`lead`/
    :func:`lag`/:func:`nth` can verify the whole-partition contract without
    relying on the process-wide name registry (which a long-lived driver can
    make ambiguous through name reuse). Prefer this over ``F.col(name)``."""
    try:
        field = df.schema[name]
    except KeyError:
        raise ValueError(
            f"frame_values: no column '{name}' in the DataFrame — "
            "materialize it first with with_frame_values"
        ) from None
    scope = field.metadata.get(FRAME_SCOPE_META_KEY)
    if scope is None:
        raise ValueError(
            f"frame_values: column '{name}' carries no frame-scope metadata "
            "(not produced by with_frame_values)"
        )
    col = F.col(name)
    col._stupidb_frame_scope = scope
    return col


def lead(
    c: ColumnLike,
    n: int | Column = 1,
    default: Column | None = None,
    w: WindowSpec | None = None,
    *,
    max_partition_rows=_UNSET,
    values: Column | None = None,
) -> Column:
    """Shift forward within the partition (frame ignored, as in the reference
    `stupidb/functions/navigation/__init__.py:40-46`).

    Constant ``n`` → native ``F.lead`` (fast path). Column ``n`` → dynamic
    per-row offset (reference quirk Q7) via collect_list indexing. Pass a
    :func:`with_frame_values` column as ``values`` (collected over the WHOLE
    partition of ``w``) to share one array + guard across several dynamic
    outputs.

    >>> [r.nxt for r in series.select(
    ...     lead("x", 1, default=F.lit(-1.0), w=w_series).alias("nxt")).collect()]
    [20.0, 30.0, -1.0]
    >>> [r.nxt for r in series.select(  # per-row offset: t % 2
    ...     lead("x", (F.col("t") % 2).cast("int"), w=w_series).alias("nxt")
    ... ).collect()]
    [20.0, 20.0, None]
    """
    if isinstance(n, int):
        col = F.lead(_col(c), n, None)
        col = col.over(w) if w is not None else col
        return F.coalesce(col, default) if default is not None else col
    if values is not None:
        _check_shared_values(
            values, max_partition_rows, need_whole=True, what="lead"
        )
    cap = (
        DYNAMIC_PARTITION_ROW_CAP if max_partition_rows is _UNSET
        else max_partition_rows
    )
    return _dynamic_shift(
        c, n, default, w, forward=True, cap=cap, values=values
    )


def lag(
    c: ColumnLike,
    n: int | Column = 1,
    default: Column | None = None,
    w: WindowSpec | None = None,
    *,
    max_partition_rows=_UNSET,
    values: Column | None = None,
) -> Column:
    """Shift backward within the partition; see :func:`lead`.

    >>> [r.prev for r in series.select(
    ...     lag("x", 1, w=w_series).alias("prev")).collect()]
    [None, 10.0, 20.0]
    """
    if isinstance(n, int):
        col = F.lag(_col(c), n, None)
        col = col.over(w) if w is not None else col
        return F.coalesce(col, default) if default is not None else col
    if values is not None:
        _check_shared_values(
            values, max_partition_rows, need_whole=True, what="lag"
        )
    cap = (
        DYNAMIC_PARTITION_ROW_CAP if max_partition_rows is _UNSET
        else max_partition_rows
    )
    return _dynamic_shift(
        c, n, default, w, forward=False, cap=cap, values=values
    )


def _dynamic_shift(
    c: ColumnLike,
    n: Column,
    default: Column | None,
    w: WindowSpec,
    *,
    forward: bool,
    cap: int | None = DYNAMIC_PARTITION_ROW_CAP,
    values: Column | None = None,
) -> Column:
    """Per-row offset lead/lag (quirk Q7): index into the whole partition.

    ``collect_list`` over an unbounded frame + 1-based ``element_at`` with a
    guard for out-of-partition → default (reference returns the default
    there, `stupidb/functions/navigation/__init__.py:56-70`). A shared
    ``values`` array (from :func:`with_frame_values` over the whole
    partition) carries its own guard, so none is re-applied here.
    """
    if w is None:
        raise ValueError("dynamic lead/lag requires a window spec")
    shared = values is not None
    if not shared:
        whole = w.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        values = F.collect_list(F.struct(_col(c).alias("v"))).over(whole)
    # row position among *all* partition rows (collect_list keeps nulls inside
    # the struct wrapper, so positions align with row_number)
    pos = F.row_number().over(w)
    idx = (pos + n) if forward else (pos - n)
    in_bounds = (idx >= 1) & (idx <= F.size(values))
    out = F.when(in_bounds, F.element_at(values, idx.cast("int"))["v"])
    if default is not None:
        out = out.otherwise(default)
    return out if shared else _partition_guard(values, out, cap, "lead/lag")


def nth(
    c: ColumnLike,
    i: int | Column,
    w: WindowSpec | None = None,
    *,
    zero_based: bool = True,
    max_partition_rows=_UNSET,
    values: Column | None = None,
) -> Column:
    """i-th value of the frame; reference semantics (`stupidb/functions/
    navigation/__init__.py:113-159`): 0-based, negative Python-style indices
    allowed, out-of-bounds ⇒ NULL, and ``i`` may be per-row (quirk Q7).

    Constant non-negative ``i`` → native ``F.nth_value`` (fast path);
    negative or Column ``i`` → collect_list indexing over the frame. Pass a
    :func:`with_frame_values` column (collected over the SAME frame as
    ``w``) as ``values`` to share one array + guard across several dynamic
    outputs.

    >>> running = w_series.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    >>> [r.second for r in series.select(
    ...     nth("x", 1, w=running).alias("second")).collect()]  # 0-based
    [None, 20.0, 20.0]
    >>> [r.last for r in series.select(
    ...     nth("x", -1, w=running).alias("last")).collect()]  # python-style
    [10.0, 20.0, 30.0]
    """
    if isinstance(i, int) and i >= 0:
        one_based = i + 1 if zero_based else i
        col = F.nth_value(_col(c), one_based)
        return col.over(w) if w is not None else col
    if w is None and values is None:
        raise ValueError("dynamic/negative nth requires a window spec")
    shared = values is not None
    if shared:
        # nth indexes within the frame, so the shared array must follow the
        # SAME frame as ``w`` — whole-partition arrays are only correct when
        # w itself is whole-partition. That equivalence can't be inspected
        # on a WindowSpec, so only the cap-conflict contract is enforced
        # here; the frame contract stays with with_frame_values' scope tag.
        _check_shared_values(
            values, max_partition_rows, need_whole=False, what="nth"
        )
    if not shared:
        values = F.collect_list(F.struct(_col(c).alias("v"))).over(w)
    i_col = F.lit(i) if isinstance(i, int) else i
    if zero_based:
        # python indexing: 0 → first, -1 → last; element_at is 1-based and
        # supports negative-from-end natively
        idx = F.when(i_col >= 0, i_col + 1).otherwise(i_col)
    else:
        idx = i_col
    in_bounds = (F.abs(idx) >= 1) & (F.abs(idx) <= F.size(values))
    out = F.when(in_bounds, F.element_at(values, idx.cast("int"))["v"])
    if shared:
        # the with_frame_values column carries its own guard
        return out
    cap = (
        DYNAMIC_PARTITION_ROW_CAP
        if max_partition_rows is _UNSET
        else max_partition_rows
    )
    return _partition_guard(values, out, cap, "nth")
