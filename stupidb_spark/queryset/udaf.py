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
