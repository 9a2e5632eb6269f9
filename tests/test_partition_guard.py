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
