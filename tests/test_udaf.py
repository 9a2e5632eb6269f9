"""Custom-aggregate (UDAF) tests: the step-loop and vectorized paths must
agree with each other and with first-principles Python, and the shipped
SumOfSquares must hash-match the SQL oracle expression (integer-valued input
⇒ exact)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from stupidb_spark.functions.udaf import (
    Aggregate,
    GeometricMean,
    SumOfSquares,
    udaf_column,
)
from stupidb_spark.sources import load_table
from tests.conftest import SF_DIR, assert_matches_oracle


def test_sum_of_squares_matches_oracle(spark, duck):
    sdf = (
        load_table(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(udaf_column(SumOfSquares, "l_quantity").alias("sum_sq"))
    )
    assert_matches_oracle(
        sdf,
        duck,
        "SELECT l_returnflag, sum(l_quantity * l_quantity) AS sum_sq "
        "FROM lineitem GROUP BY 1",
        name="udaf_sum_sq",
    )


def test_step_loop_path_equals_vectorized(spark):
    class StepOnlySumSq(Aggregate):  # no `vectorized` → step loop
        def __init__(self):
            self.total, self.seen = 0.0, False

        def step(self, x):
            self.total += x * x
            self.seen = True

        def finalize(self):
            return self.total if self.seen else None

    li = load_table(spark, SF_DIR, "lineitem").limit(5000)
    a = li.groupBy("l_returnflag").agg(
        udaf_column(StepOnlySumSq, "l_quantity").alias("v")
    )
    b = li.groupBy("l_returnflag").agg(
        udaf_column(SumOfSquares, "l_quantity").alias("v")
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_geometric_mean_property(spark):
    rows = [(1, 2.0), (1, 8.0), (2, 3.0), (2, 0.0), (3, None)]
    df = spark.createDataFrame(rows, "k int, x double")
    out = dict(
        df.groupBy("k").agg(udaf_column(GeometricMean, "x").alias("g")).collect()
    )
    assert math.isclose(out[1], 4.0)  # sqrt(2*8)
    assert math.isclose(out[2], 3.0)  # zero is excluded
    assert out[3] is None  # all-null group → NULL


def test_empty_group_yields_null(spark):
    df = spark.createDataFrame([(1, None)], "k int, x double")
    out = df.groupBy("k").agg(udaf_column(SumOfSquares, "x").alias("v")).collect()
    assert out[0].v is None


def test_approx_sketch_error_bounds(spark):
    """HLL++ estimate within its configured rsd (with slack) of the exact
    distinct count; the quantile sketch's median lands between the exact
    45th and 55th percentiles per group."""
    from stupidb_spark.queryset import QUERIES

    approx = {
        r.l_returnflag: r
        for r in QUERIES["agg_approx_sketch"](spark, SF_DIR).collect()
    }
    exact = {
        r.l_returnflag: r
        for r in (
            load_table(spark, SF_DIR, "lineitem")
            .groupBy("l_returnflag")
            .agg(
                F.countDistinct("l_partkey").alias("n_parts"),
                F.expr("percentile(l_extendedprice, 0.45)").alias("p45"),
                F.expr("percentile(l_extendedprice, 0.55)").alias("p55"),
            )
            .collect()
        )
    }
    assert approx.keys() == exact.keys()
    for flag, a in approx.items():
        e = exact[flag]
        assert abs(a.approx_parts - e.n_parts) <= max(0.05 * e.n_parts, 2.0)
        assert e.p45 <= a.approx_median_price <= e.p55


def test_sketch_table_laws(spark):
    """The three laws that make the sketch-table pattern trustworthy:
    (1) estimate determinism — a sketch's registers are a max-merge over
    item hashes, so every ESTIMATE is identical under any partitioning /
    insertion order (the serialized blob itself may differ while sparse:
    DataSketches keeps an order-dependent coupon list until dense
    promotion, so blobs are NOT the comparable unit — estimates are);
    (2) merge exactness — the union of per-bucket sketches estimates
    exactly what the sketch of the unioned data estimates, so a persisted
    rollup never drifts from a rescan; (3) the estimate error vs exact
    distinct stays inside the standard HLL bound for lg_k=12."""
    import pyspark.sql.functions as F

    from stupidb_spark.operators.sketches import sketch_rollup, sketch_table
    from stupidb_spark.sources import load_table
    from tests.conftest import SF_DIR

    events = load_table(spark, SF_DIR, "events")
    buckets = ["event_type", F.to_date("ts").alias("day")]

    # (1) estimate determinism under different partitionings
    def ests(df):
        return sorted(
            (r.event_type, str(r.day), int(r.est), int(r.n_rows))
            for r in sketch_table(df, buckets, "user_id")
            .withColumn("est", F.hll_sketch_estimate("sk"))
            .collect()
        )

    assert ests(events) == ests(events.repartition(7, "user_id"))

    # (2) union-of-buckets == sketch-of-union, exactly
    sketches = sketch_table(events, buckets, "user_id")
    merged = sketch_rollup(sketches, []).first()
    direct = events.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(12))
        ).alias("est")
    ).first()
    assert merged.distinct_est == direct.est

    # (3) estimate within the HLL error envelope of the exact count
    exact = events.select("user_id").distinct().count()
    assert abs(merged.distinct_est - exact) / exact < 0.05
    assert merged.n_rows == events.count()

    # per-type rollup covers every type and sums to the full row count
    per_type = sketch_rollup(sketches, ["event_type"])
    assert per_type.count() == events.select("event_type").distinct().count()
    assert (
        per_type.agg(F.sum("n_rows")).first()[0] == events.count()
    )


def test_sketch_table_persists_and_rolls_up_from_parquet(spark, tmp_path):
    """The pattern's whole point: the sketch table is PERSISTED once
    (parquet with a binary column) and later rollups read blobs, not
    events. Round-trip through parquet must preserve every estimate and
    the global merge."""
    import pyspark.sql.functions as F

    from stupidb_spark.operators.sketches import sketch_rollup, sketch_table
    from stupidb_spark.sources import load_table
    from tests.conftest import SF_DIR

    events = load_table(spark, SF_DIR, "events")
    sketches = sketch_table(
        events, ["event_type", F.to_date("ts").alias("day")], "user_id"
    )
    path = str(tmp_path / "sketches")
    sketches.write.parquet(path)
    back = spark.read.parquet(path)

    want = sorted(
        map(tuple, sketch_rollup(sketches, ["event_type"]).collect())
    )
    got = sorted(map(tuple, sketch_rollup(back, ["event_type"]).collect()))
    assert got == want
    assert (
        sketch_rollup(back, []).first().distinct_est
        == sketch_rollup(sketches, []).first().distinct_est
    )


def test_sketch_events_daily_reads_prune_partitions(spark, tmp_path):
    """The continuous-aggregate layout's point at 100 TB: a persisted
    day-partitioned sketch table answers "distinct users on day X" by
    scanning ONE day's kilobyte rows — the day predicate must land in
    PartitionFilters (pruned at plan time), not a post-scan Filter."""
    import pyspark.sql.functions as F

    from stupidb_spark.operators.sketches import sketch_rollup, sketch_table
    from stupidb_spark.sources import load_table
    from tests.conftest import SF_DIR

    events = load_table(spark, SF_DIR, "events")
    sketches = sketch_table(
        events, [F.to_date("ts").alias("day"), "event_type"], "user_id"
    )
    path = str(tmp_path / "sk_daily")
    sketches.write.partitionBy("day").parquet(path)
    back = spark.read.parquet(path)

    one_day = events.select(F.to_date("ts").alias("day")).first().day
    pruned = back.filter(F.col("day") == F.lit(one_day))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "day" in pf[0], plan
    # and the pruned read still answers correctly (exact lane)
    got = sketch_rollup(pruned, ["day"]).first()
    want = events.filter(F.to_date("ts") == F.lit(one_day)).count()
    assert got.n_rows == want


def test_sketch_ingest_stream_equals_batch(spark, tmp_path):
    """Streaming sketch-table maintenance: micro-batches land append-only
    per-epoch sketch partitions; rolling up the read-back must give the
    SAME estimates (and exact counts) as one batch sketch of all the
    events — the HLL union law makes stream == batch an equality, not an
    approximation."""
    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    from stupidb_spark.operators.sketches import (
        sketch_ingest_stream,
        sketch_rollup,
        sketch_table,
    )
    from stupidb_spark.sources import load_table
    from stupidb_spark.streaming import stream_events
    from tests.conftest import SF_DIR

    # stage events as THREE files -> three micro-batches / epochs
    src = tmp_path / "ingest"
    src.mkdir()
    t = pq.read_table(f"{SF_DIR}/events.parquet")
    n = t.num_rows
    for i in range(3):
        pq.write_table(
            t.slice(i * n // 3, (i + 1) * n // 3 - i * n // 3),
            src / f"part-{i:03d}.parquet",
        )

    table_path = str(tmp_path / "sk_stream")
    buckets = [F.to_date("ts").alias("day"), "event_type"]
    sketch_ingest_stream(
        stream_events(spark, str(src), max_files_per_trigger=1),
        buckets,
        "user_id",
        table_path,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    back = spark.read.parquet(table_path)
    assert back.select("batch_id").distinct().count() == 3

    events = load_table(spark, SF_DIR, "events")
    batch = sketch_table(events, buckets, "user_id")
    for keep in (["event_type"], ["day"], []):
        got = sorted(map(tuple, sketch_rollup(back, keep).collect()))
        want = sorted(map(tuple, sketch_rollup(batch, keep).collect()))
        assert got == want, keep
