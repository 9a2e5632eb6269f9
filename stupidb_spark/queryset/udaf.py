"""Custom-aggregate queries — the reference's user-defined-aggregate surface
(`docs/usage.rst:289-297`) exercised through the engine's GROUPED_AGG
adapter (stupidb_spark/functions/udaf.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stupidb_spark.functions.udaf import GeometricMean, SumOfSquares, udaf_column
from stupidb_spark.operators.skew import salted_aggregate
from stupidb_spark.queryset import q
from stupidb_spark.sources import load_table
from stupidb_spark.verbs import aggregate, group_by


@q(
    "agg_udaf_sum_sq",
    """
    SELECT l_returnflag, sum(l_quantity * l_quantity) AS sum_sq
    FROM lineitem GROUP BY 1
    """,
)
def agg_udaf_sum_sq(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Custom step/combine/finalize aggregate via Arrow GROUPED_AGG; quantities
    # are integer-valued so Σx² is exact and oracle-comparable bit-for-bit.
    return (
        load_table(spark, sf_dir, "lineitem")
        >> group_by("l_returnflag")
        >> aggregate(sum_sq=udaf_column(SumOfSquares, "l_quantity"))
    )


@q(
    "agg_udaf_salted",
    """
    SELECT l_returnflag, sum(l_quantity * l_quantity) AS sum_sq
    FROM lineitem GROUP BY 1
    """,
)
def agg_udaf_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level salted UDAF — the documented mitigation for GROUPED_AGG's
    no-partial-aggregation skew hazard (functions/udaf.py module docs),
    proven against the plain-SQL answer.

    Phase 1 runs the custom aggregate per (key, salt) — a hot key's group is
    split across 16 reducers instead of materializing on one executor;
    phase 2 merges the associative partials with a built-in sum. The partial
    Σx² values are integer-valued doubles, so the merge is exact under any
    addition order and the result is bit-identical to the unsalted form.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity"
    )
    return salted_aggregate(
        li,
        ["l_returnflag"],
        partial_aggs={"sum_sq": udaf_column(SumOfSquares, "l_quantity")},
        merge_aggs={"sum_sq": F.sum("sum_sq")},
        n_salts=16,
    )


@q("agg_udaf_geomean")
def agg_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Floating custom aggregate — exp(mean(ln x)) accumulates in float, so no
    # bit-exact oracle (rows-only check); value behavior pinned in
    # tests/test_udaf.py.
    return (
        load_table(spark, sf_dir, "part")
        >> group_by("p_brand")
        >> aggregate(geo_price=udaf_column(GeometricMean, "p_retailprice"))
    )


@q("agg_approx_sketch")  # approximate sketches — no SQL oracle (HLL++ /
# KLL internals differ per engine); error bounds pinned in tests/test_udaf.py
def agg_approx_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates per return flag: HyperLogLog++ distinct-part
    estimate and approximate median price.

    The 100 TB rationale: exact count-distinct shuffles every distinct key
    (`agg_count_distinct`'s Expand doubles the stream), while an HLL sketch
    is a few KB of mergeable state per group — partial aggregation sends
    sketches, not keys. Same story for `percentile_approx` (a mergeable
    quantile sketch) vs the exact window-rank median (`agg_median_disc`,
    which needs a full per-group sort). The exact twins in this inventory
    are the correctness baseline the error-bound tests compare against.
    """
    from stupidb_spark.sources import load_table

    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias(
                "approx_median_price"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


@q(
    "sketch_events_daily",
    """
    SELECT CAST(ts AS DATE) AS day,
           count(*) AS n_rows
    FROM events GROUP BY 1
    """,
)
def sketch_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch table's EXACT lane, proven through its own storage: the
    per-(day, event_type) HLL sketch relation is PERSISTED as parquet
    partitioned by day (the continuous-aggregate layout — readers
    partition-prune to the days they ask about, pinned in
    tests/test_udaf.py), read back, and rolled up to per-day totals. The
    ``n_rows`` column is exact by construction — sums of per-bucket
    counts — so the day-grain rollup of the persisted table must
    hash-match DuckDB counting the raw events; estimates stay rows-only
    (``agg_sketch_rollup``) because DuckDB's HLL internals differ."""
    import os
    import shutil

    from stupidb_spark.operators.sketches import sketch_rollup, sketch_table

    events = load_table(spark, sf_dir, "events")
    sketches = sketch_table(
        events, [F.to_date("ts").alias("day"), "event_type"], "user_id"
    )
    # Single-writer per fixture, wiped at invocation start (the streamgate
    # scratch contract); left on disk so the returned plan reads lazily.
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".scratch",
        "sketch_gate",
        f"events-daily-{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(root, ignore_errors=True)
    sketches.write.partitionBy("day").parquet(root)
    back = spark.read.parquet(root)
    return sketch_rollup(back, ["day"]).select("day", "n_rows")


def _sketch_rollup_frames(spark: SparkSession, sf_dir: str):
    """Shared construction for the two rollup lanes: events → per-(type,
    day) HLL sketch blobs → per-event_type rollup + global row."""
    from stupidb_spark.operators.sketches import sketch_rollup, sketch_table
    from stupidb_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")
    sketches = sketch_table(
        events,
        ["event_type", F.to_date("ts").alias("day")],
        "user_id",
    )
    per_type = sketch_rollup(sketches, ["event_type"]).select(
        F.col("event_type").alias("scope"), "n_rows", "distinct_est"
    )
    overall = sketch_rollup(sketches, []).select(
        F.lit("ALL").alias("scope"), "n_rows", "distinct_est"
    )
    return per_type.unionByName(overall)


@q(
    "agg_sketch_rollup",
    """
    SELECT event_type AS scope, count(*) AS n_rows FROM events GROUP BY 1
    UNION ALL
    SELECT 'ALL' AS scope, count(*) AS n_rows FROM events
    """,
)
def agg_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-aggregated sketch-TABLE pattern (operators/sketches.py):
    events roll up once into per-(event_type, day) HLL sketch blobs — the
    kilobyte-rows relation a pipeline persists — and every distinct-user
    question thereafter is a merge over blobs, never a rescan: here the
    per-event_type rollup across all days plus the global row, in one
    output. At 100 TB the raw scan happens once; "distinct users in any
    bucket combination" becomes a metadata-scale aggregate, the
    hypertable / continuous-aggregate rollup expressed as ordinary
    DataFrames.

    This gate row is the rollup's EXACT lane: ``n_rows`` is a sum of
    per-bucket counts carried through the sketch relation, so rolling the
    sketch table up to (per-type, ALL) scopes must hash-match DuckDB
    counting the raw events — hard cross-engine signal that the rollup
    never drops or double-counts a bucket. The HLL ESTIMATE columns are
    not DuckDB-expressible by construction and live in the rows-only
    sibling ``agg_sketch_estimates``; the laws that make the estimates
    trustworthy (state determinism under any partitioning,
    union-of-buckets == sketch-of-union exactly, error bound vs exact)
    are pinned in tests/test_udaf.py."""
    return _sketch_rollup_frames(spark, sf_dir).select("scope", "n_rows")


@q("agg_sketch_estimates")  # estimate lane — no SQL oracle (DuckDB's HLL
# internals differ by construction); exactness of the same rollup's count
# lane is gated by agg_sketch_rollup, and the estimate laws are pinned in
# tests/test_udaf.py
def agg_sketch_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same sketch-table rollup with its HLL ``distinct_est`` column —
    the approximate answer the pattern exists to serve; rows-only at the
    driver gate (see :func:`agg_sketch_rollup` for the oracled exact
    lane)."""
    return _sketch_rollup_frames(spark, sf_dir)
