"""Bounded-partition contract for the dynamic (collect_list-backed) window
paths — reference quirk Q7's per-row offsets/frames.

These paths materialize a partition's value array per row, so a skewed
partition key must fail LOUDLY (SparkRuntimeException naming the operator,
the observed cardinality, and the cap) instead of OOMing an executor at
scale. The guard is ``assert_true(size(arr) <= cap)`` fused into the same
projection — no extra pass, no plan change.
"""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from stupidb_spark.functions.navigation import lag, lead, nth
from stupidb_spark.window import dynamic_rows_sum


def _skewed(spark, n=500):
    # one mega-key ("hot", n rows) next to a sane key ("cold", 3 rows)
    return spark.range(n + 3).select(
        F.when(F.col("id") < n, F.lit("hot")).otherwise("cold").alias("g"),
        F.col("id").alias("t"),
        (F.col("id") % 7).cast("double").alias("x"),
    )


def test_dynamic_lead_fails_loudly_on_mega_partition(spark):
    df = _skewed(spark)
    w = Window.partitionBy("g").orderBy("t")
    col = lead("x", F.lit(1).cast("int"), w=w, max_partition_rows=100)
    with pytest.raises(Exception, match="max_partition_rows cap of 100"):
        df.select(col.alias("nxt")).collect()


def test_dynamic_lag_and_nth_guarded(spark):
    df = _skewed(spark)
    w = Window.partitionBy("g").orderBy("t")
    with pytest.raises(Exception, match="lead/lag"):
        df.select(
            lag("x", F.lit(1).cast("int"), w=w, max_partition_rows=10)
        ).collect()
    with pytest.raises(Exception, match="nth"):
        df.select(
            nth("x", F.lit(-1).cast("int"), w=w, max_partition_rows=10)
        ).collect()


def test_dynamic_rows_sum_guarded_and_waivable(spark):
    df = _skewed(spark)
    dyn = lambda cap: dynamic_rows_sum(  # noqa: E731
        "x",
        partition_by=("g",),
        order_by=("t",),
        preceding=F.lit(1).cast("int"),
        following=F.lit(0).cast("int"),
        max_partition_rows=cap,
    )
    with pytest.raises(Exception, match="dynamic_rows_sum"):
        df.select(dyn(100).alias("s")).collect()
    # None waives the guard: caller owns the memory math
    assert df.select(dyn(None).alias("s")).count() == df.count()


def test_shared_frame_values_guarded_and_equal(spark):
    """with_frame_values: one materialized array serves several dynamic
    outputs, inherits the guard, and matches the per-call dynamic paths."""
    from stupidb_spark.functions.navigation import with_frame_values

    df = _skewed(spark, n=50)
    w = Window.partitionBy("g").orderBy("t")
    whole = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    n_dyn = (F.col("t") % 3).cast("int")

    shared = with_frame_values(df, "__arr", "x", whole, scope="whole")
    shared = with_frame_values(shared, "__run", "x", running)
    got = shared.select(
        "g",
        "t",
        lag("x", n_dyn, w=w, values=F.col("__arr")).alias("dyn"),
        nth("x", -2, w=running, values=F.col("__run")).alias("n2"),
    )
    want = df.select(
        "g",
        "t",
        lag("x", n_dyn, w=w).alias("dyn"),
        nth("x", -2, w=running).alias("n2"),
    )
    # exactly ONE collect_list per materialized frame array in the plan
    # (inspect before executing: post-AQE toString repeats the initial plan)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert plan.count("collect_list") == 2
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )

    # the shared array carries the guard: a mega-partition still fails loudly
    big = _skewed(spark, n=500)
    guarded = with_frame_values(
        big, "__arr", "x", whole, scope="whole", max_partition_rows=100
    )
    col = lag("x", n_dyn, w=w, values=F.col("__arr"))
    with pytest.raises(Exception, match="max_partition_rows cap of 100"):
        guarded.select(col.alias("dyn")).collect()


def test_guard_is_transparent_within_cap(spark):
    # guarded and unguarded plans must agree value-for-value under the cap
    df = _skewed(spark, n=50)
    w = Window.partitionBy("g").orderBy("t")
    n_dyn = F.lit(1).cast("int")
    guarded = df.select(
        "g", "t", lead("x", n_dyn, w=w, max_partition_rows=1000).alias("v")
    )
    unguarded = df.select(
        "g", "t", lead("x", n_dyn, w=w, max_partition_rows=None).alias("v")
    )
    assert sorted(map(tuple, guarded.collect())) == sorted(
        map(tuple, unguarded.collect())
    )
    # and the native constant-offset fast path agrees too
    native = df.select(
        "g", "t", F.lead("x", 1).over(w).alias("v")
    )
    assert sorted(map(tuple, guarded.collect())) == sorted(
        map(tuple, native.collect())
    )


def test_shared_values_contract_checks(spark):
    """Advisor items: (a) an explicit max_partition_rows alongside values=
    is a loud contract error, not silently ignored; (b) a running-frame
    array fed to dynamic lead/lag raises instead of silently mis-shifting;
    (c) an array of unverifiable provenance warns."""
    import warnings

    from stupidb_spark.functions.navigation import nth, with_frame_values

    df = _skewed(spark, n=20)
    w = Window.partitionBy("g").orderBy("t")
    whole = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    n_dyn = (F.col("t") % 3).cast("int")

    shared = with_frame_values(df, "__whole_a", "x", whole, scope="whole")
    shared = with_frame_values(shared, "__run_a", "x", running)

    # (a) cap belongs to the array, not the consumer call
    with pytest.raises(ValueError, match="max_partition_rows is ignored"):
        lag("x", n_dyn, w=w, values=F.col("__whole_a"), max_partition_rows=5)
    with pytest.raises(ValueError, match="max_partition_rows is ignored"):
        nth("x", -1, w=running, values=F.col("__run_a"), max_partition_rows=5)

    # (b) running-frame array into dynamic lag = silently wrong shifts
    with pytest.raises(ValueError, match="scope='whole'"):
        lag("x", n_dyn, w=w, values=F.col("__run_a"))

    # whole-scope array is accepted and still correct
    got = shared.select(
        "g", "t", lag("x", n_dyn, w=w, values=F.col("__whole_a")).alias("d")
    )
    want = df.select("g", "t", lag("x", n_dyn, w=w).alias("d"))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )

    # (c) unknown provenance: warn, don't block (caller owns the frame math)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        lag("x", n_dyn, w=w, values=F.col("some_external_array"))
    assert any("cannot verify" in str(c.message) for c in caught)


def test_frame_scope_survives_name_reuse(spark):
    """ADVICE r7 (medium): the name-keyed registry must not let a reused
    temp name silently win. frame_values() carries the authoritative
    schema-metadata tag; a bare F.col(name) on an ambiguous name degrades
    to a warning instead of a false error / silent pass."""
    import warnings

    from stupidb_spark.functions.navigation import (
        frame_values,
        lag,
        with_frame_values,
    )

    df = _skewed(spark, n=20)
    w = Window.partitionBy("g").orderBy("t")
    whole = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    n_dyn = (F.col("t") % 3).cast("int")

    # two queries reuse the SAME temp name with different scopes — the
    # long-lived-driver hazard
    q1 = with_frame_values(df, "__reused", "x", whole, scope="whole")
    q2 = with_frame_values(df, "__reused", "x", running, scope="frame")

    # metadata tag is per-DataFrame truth: q1's array is verified 'whole'
    # (no error, no warning) even though the registry is now ambiguous
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        col = lag("x", n_dyn, w=w, values=frame_values(q1, "__reused"))
    got = q1.select("g", "t", col.alias("d"))
    want = df.select("g", "t", lag("x", n_dyn, w=w).alias("d"))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # ...and q2's frame-scoped array still raises through frame_values
    with pytest.raises(ValueError, match="scope='whole'"):
        lag("x", n_dyn, w=w, values=frame_values(q2, "__reused"))
    # a bare F.col on the now-ambiguous name warns (can't verify) instead of
    # trusting the last registration
    with pytest.warns(UserWarning, match="MORE THAN ONE scope"):
        lag("x", n_dyn, w=w, values=F.col("__reused"))


def test_frame_values_rejects_untagged_columns(spark):
    from stupidb_spark.functions.navigation import frame_values

    df = _skewed(spark, n=5)
    with pytest.raises(ValueError, match="no column"):
        frame_values(df, "__missing")
    with pytest.raises(ValueError, match="no frame-scope metadata"):
        frame_values(df, "x")


def test_explicit_cap_with_values_is_value_independent(spark):
    """ADVICE r7 (low): 'explicitly passed' is detected via a sentinel, so
    even passing the numeric default (or None) alongside values= errors."""
    from stupidb_spark.functions.navigation import (
        DYNAMIC_PARTITION_ROW_CAP,
        frame_values,
        lag,
        with_frame_values,
    )

    df = _skewed(spark, n=10)
    w = Window.partitionBy("g").orderBy("t")
    whole = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    shared = with_frame_values(df, "__cap_arr", "x", whole, scope="whole")
    arr = frame_values(shared, "__cap_arr")
    n_dyn = (F.col("t") % 3).cast("int")
    for explicit in (DYNAMIC_PARTITION_ROW_CAP, 1 << 20, None, 5):
        with pytest.raises(ValueError, match="max_partition_rows is ignored"):
            lag("x", n_dyn, w=w, values=arr, max_partition_rows=explicit)
