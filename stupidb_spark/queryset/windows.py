"""Window-function queries — SURVEY.md §2.5.

The reference implements windows with a hash-partition → per-partition sort →
segment-tree frame queries pipeline (`stupidb/aggregation.py:505-587`);
Spark's WindowExec does partition shuffle + sort + specialized frame
processors natively, so every query here is a plain ``expr.over(window)``.

Determinism discipline: every ordered window carries a unique tiebreak key
(orderkey / event_id) unless tie behavior itself is under test (rank /
dense_rank, where ties are well-defined). Float outputs follow the exact.py
rules: windowed sums go through DECIMAL (exact under any frame-evaluation
strategy — Spark's sliding frames vs DuckDB's segment tree would otherwise
drift), navigation values are passthroughs, ratios are identical double
expressions.

Quirk decisions exercised here (SURVEY.md §2.9):
- Q1  first/last skip nulls → IGNORE NULLS on both sides.
- Q3  ranks 1-based by default, ``zero_based=True`` for reference parity.
- Q7  dynamic per-row lead/lag offsets and negative nth — the documented
      collect_list slow path, oracle'd by DuckDB's native dynamic lag and
      windowed list().
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from stupidb_spark.functions import exact as X
from stupidb_spark.functions import navigation as nav
from stupidb_spark.functions import ranking as rk
from stupidb_spark.queryset import q
from stupidb_spark.sources import load_table
from stupidb_spark.verbs import select
from stupidb_spark.window import (
    dynamic_rows_sum,
    partition_window,
    range_window,
    rows_window,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _wsum(c: str, w, scale: int = 2) -> Column:
    """Exact windowed sum: unscaled-long accumulation, double result
    (see stupidb_spark/functions/exact.py for why not DECIMAL)."""
    return X.dsum_over(c, w, scale)


def _sql_wsum(expr: str, over: str, scale: int = 2) -> str:
    return X.sql_dsum_over(expr, over, scale)


@q(
    "win_running_sum",
    f"""
    SELECT o_orderkey,
           {_sql_wsum('o_totalprice', 'w')} AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = rows_window(
        partition_by=("o_custkey",),
        order_by=("o_orderdate", "o_orderkey"),
        preceding=None,  # unbounded
        following=0,
    )
    return _t(spark, sf_dir, "orders") >> select(
        "o_orderkey",
        running_spend=_wsum("o_totalprice", w),
    )


@q(
    "win_rows_bounded",
    f"""
    SELECT o_orderkey,
           {_sql_wsum('o_totalprice', 'trailing3')} / count(*) OVER trailing3
               AS mov_avg,
           max(o_totalprice) OVER centered AS mov_max
    FROM orders
    WINDOW trailing3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
           centered  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
    """,
)
def win_rows_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    trailing = rows_window(
        partition_by=("o_custkey",),
        order_by=("o_orderdate", "o_orderkey"),
        preceding=2,
        following=0,
    )
    centered = rows_window(
        partition_by=("o_custkey",),
        order_by=("o_orderdate", "o_orderkey"),
        preceding=1,
        following=1,
    )
    return _t(spark, sf_dir, "orders") >> select(
        "o_orderkey",
        mov_avg=_wsum("o_totalprice", trailing) / F.count(F.lit(1)).over(trailing),
        mov_max=F.max("o_totalprice").over(centered),
    )


@q(
    "win_range_numeric",
    """
    SELECT c_custkey,
           count(*) OVER (
               PARTITION BY c_nationkey ORDER BY c_acctbal
               RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS peers_within_100
    FROM customer
    """,
)
def win_range_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RANGE frame over a numeric key (reference RangeMode bisects sorted
    # keys, stupidb/aggregation.py:297-333; Spark rangeBetween is native).
    w = range_window(
        partition_by=("c_nationkey",),
        order_by="c_acctbal",
        preceding=100,
        following=0,
    )
    return _t(spark, sf_dir, "customer") >> select(
        "c_custkey",
        peers_within_100=F.count(F.lit(1)).over(w),
    )


@q(
    "win_range_temporal",
    f"""
    SELECT event_id,
           {_sql_wsum('value', 'w')} AS weekly_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
    """,
)
def win_range_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Temporal RANGE frame (timedelta bounds on a time key — the reference's
    # date ± timedelta case, stupidb/aggregation.py:307-333, test
    # stupidb/tests/test_stupidb.py:529-588). Spark rangeBetween needs a
    # numeric key; we order by epoch MICROseconds (exact integer — epoch
    # seconds would truncate sub-second timestamps and shift frame edges).
    events = _t(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    week_us = int(datetime.timedelta(days=7).total_seconds() * 1_000_000)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-week_us, W.currentRow)
    )
    return events >> select(
        "event_id",
        weekly_value=X.dsum_over("value", w, 2),
    )


@q(
    "win_whole_partition",
    f"""
    SELECT l_orderkey, l_linenumber,
           {_sql_wsum('l_extendedprice', 'w')}                     AS flag_total,
           l_extendedprice / {_sql_wsum('l_extendedprice', 'w')}   AS share_of_flag
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag)
    """,
)
def win_whole_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Unordered window ⇒ whole-partition frame — the reference's default when
    # no order_by is given (stupidb/aggregation.py:185-194).
    w = partition_window("l_returnflag")
    total = _wsum("l_extendedprice", w)
    return _t(spark, sf_dir, "lineitem") >> select(
        "l_orderkey",
        "l_linenumber",
        flag_total=total,
        share_of_flag=F.col("l_extendedprice") / total,
    )


@q(
    "win_rank",
    """
    SELECT c_custkey,
           rank()         OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk,
           dense_rank()   OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk,
           row_number()   OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn,
           ntile(4)       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS quartile,
           percent_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS prnk,
           cume_dist()    OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS cdist,
           rank()         OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) - 1 AS rnk0,
           dense_rank()   OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) - 1 AS drnk0,
           row_number()   OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) - 1 AS rn0
    FROM customer
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # percent_rank = (rank-1)/(n-1): identical integers → identical double.
    # rnk0/drnk0/rn0 pin the reference's 0-based rank parity (quirk Q3,
    # stupidb/tests/test_ranking.py:37,68) via zero_based=True.
    ties = partition_window("c_nationkey", order_by=(F.col("c_acctbal").desc(),))
    uniq = partition_window(
        "c_nationkey", order_by=(F.col("c_acctbal").desc(), "c_custkey")
    )
    return _t(spark, sf_dir, "customer") >> select(
        "c_custkey",
        rnk=rk.rank(ties),
        drnk=rk.dense_rank(ties),
        rn=rk.row_number(uniq),
        quartile=rk.ntile(4, uniq),
        prnk=rk.percent_rank(ties),
        cdist=rk.cume_dist(ties),
        rnk0=rk.rank(ties, zero_based=True),
        drnk0=rk.dense_rank(ties, zero_based=True),
        rn0=rk.row_number(uniq, zero_based=True),
    )


@q(
    "win_navigation",
    """
    WITH e AS (
        SELECT event_id, user_id, ts, value,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END AS maybe_value
        FROM events
    )
    SELECT event_id,
           lag(value)  OVER w                                  AS prev_value,
           lead(value, 2, CAST(-1.0 AS DOUBLE)) OVER w         AS next2_value,
           first_value(maybe_value IGNORE NULLS) OVER running  AS first_ok,
           last_value(maybe_value IGNORE NULLS) OVER running   AS last_ok,
           nth_value(value, 3) OVER running                    AS third_value,
           list_extract(list(value) OVER running, -1)          AS last_in_frame,
           list_extract(list(value) OVER running, -2)          AS second_last,
           lag(value, CAST(event_id % 3 AS INTEGER), CAST(-1.0 AS DOUBLE))
               OVER w                                          AS dyn_prev
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
           running AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def win_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # first/last ALWAYS skip nulls in the reference (quirk Q1,
    # stupidb/functions/navigation/__init__.py:94-98) → IGNORE NULLS here and
    # in the oracle. nth is 0-based in the reference; nav.nth(..., 2) == SQL
    # nth_value(..., 3). last_in_frame/second_last pin the reference's
    # Python-style NEGATIVE nth indices (quirk Q7,
    # stupidb/functions/navigation/__init__.py:113-159). All outputs are
    # passthrough source values. dyn_prev pins the reference's per-row
    # CALLABLE offsets (quirk Q7, stupidb/api.py:841-888): Spark has no
    # dynamic lag, so it takes the documented collect_list slow path
    # (stupidb_spark/functions/navigation.py); DuckDB's native dynamic lag is
    # the oracle. The two negative-nth outputs share ONE materialized
    # running-frame array and dyn_prev gets its own whole-partition array
    # (with_frame_values): Catalyst doesn't CSE window expressions, so the
    # naive form planned ~12 collect_list buffers over the same two frames.
    e = _t(spark, sf_dir, "events").withColumn(
        "maybe_value",
        F.when(F.col("event_type") == "error", F.lit(None).cast("double")).otherwise(
            F.col("value")
        ),
    )
    w = partition_window("user_id", order_by=("ts", "event_id"))
    running = rows_window(
        partition_by=("user_id",),
        order_by=("ts", "event_id"),
        preceding=None,
        following=0,
    )
    whole = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    e = nav.with_frame_values(e, "__run_arr", "value", running, what="nth")
    e = nav.with_frame_values(
        e, "__part_arr", "value", whole, scope="whole", what="lead/lag"
    )
    return e >> select(
        "event_id",
        prev_value=nav.lag("value", 1, w=w),
        next2_value=nav.lead("value", 2, default=F.lit(-1.0), w=w),
        first_ok=F.first("maybe_value", ignorenulls=True).over(running),
        last_ok=F.last("maybe_value", ignorenulls=True).over(running),
        third_value=nav.nth("value", 2, w=running),
        last_in_frame=nav.nth("value", -1, w=running, values=nav.frame_values(e, "__run_arr")),
        second_last=nav.nth("value", -2, w=running, values=nav.frame_values(e, "__run_arr")),
        dyn_prev=nav.lag(
            "value",
            (F.col("event_id") % 3).cast("int"),
            F.lit(-1.0),
            w=w,
            values=nav.frame_values(e, "__part_arr"),
        ),
    )


@q(
    "win_multiple",
    f"""
    SELECT o_orderkey,
           {_sql_wsum('o_totalprice', 'cust')} AS cust_running,
           rank() OVER (ORDER BY o_totalprice DESC) AS global_price_rank,
           {_sql_wsum('o_totalprice', 'prio')} / count(*) OVER prio AS prio_mov_avg
    FROM orders
    WINDOW cust AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           prio AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def win_multiple(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Multiple independent windows in one select — the reference tees its
    # child iterator once per window (stupidb/core.py:125-148, test
    # stupidb/tests/test_stupidb.py:760-780); Spark plans stacked WindowExecs.
    cust = rows_window(
        partition_by=("o_custkey",),
        order_by=("o_orderdate", "o_orderkey"),
        preceding=None,
        following=0,
    )
    glob = partition_window(order_by=(F.col("o_totalprice").desc(),))
    prio = rows_window(
        partition_by=("o_orderpriority",),
        order_by=("o_orderdate", "o_orderkey"),
        preceding=4,
        following=0,
    )
    return _t(spark, sf_dir, "orders") >> select(
        "o_orderkey",
        cust_running=_wsum("o_totalprice", cust),
        global_price_rank=F.rank().over(glob),
        prio_mov_avg=_wsum("o_totalprice", prio) / F.count(F.lit(1)).over(prio),
    )


@q(
    "win_dynamic_frame",
    """
    WITH t AS (
        SELECT event_id, user_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               CAST(event_id % 3 AS BIGINT) AS prec,
               CAST(event_id % 2 AS BIGINT) AS foll
        FROM events
    )
    SELECT a.event_id,
           CAST(CAST(sum(CAST(floor(b.value * 100.0 + 0.5) AS BIGINT))
                     AS BIGINT) AS DOUBLE) / 100.0 AS dyn_sum
    FROM t a JOIN t b
      ON a.user_id = b.user_id
     AND b.rn BETWEEN a.rn - a.prec AND a.rn + a.foll
    GROUP BY a.event_id
    """,
)
def win_dynamic_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The reference's frame bounds are *callables of the current row*
    # (stupidb/typehints.py:25-26, resolution stupidb/aggregation.py:135-198)
    # — a per-row ROWS frame no SQL window clause can express. Spark path:
    # collect_list + per-row slice + exact integer fold
    # (stupidb_spark/window.py:dynamic_rows_sum); the DuckDB oracle is the
    # equivalent rn-band self-join. Bounds here are ≥ 0, so every frame
    # contains its own row and the oracle's inner join drops nothing.
    return _t(spark, sf_dir, "events") >> select(
        "event_id",
        dyn_sum=dynamic_rows_sum(
            "value",
            partition_by=("user_id",),
            order_by=("ts", "event_id"),
            preceding=(F.col("event_id") % 3).cast("int"),
            following=(F.col("event_id") % 2).cast("int"),
        ),
    )


def _sql_ws2(expr: str, over: str, scale: int = 2) -> str:
    return X.sql_dsum_over(f"({expr}) * ({expr})", over, scale * 2)


@q(
    "win_stat_frames",
    f"""
    SELECT o_orderkey,
           CASE WHEN count(*) OVER w > 1 THEN
             ({_sql_ws2('o_totalprice', 'w')}
              - {_sql_wsum('o_totalprice', 'w')} * {_sql_wsum('o_totalprice', 'w')}
                / count(*) OVER w)
             / (count(*) OVER w - 1)
           END                                             AS frame_var,
           sqrt(greatest(({_sql_ws2('o_totalprice', 'w')}
                 - {_sql_wsum('o_totalprice', 'w')} * {_sql_wsum('o_totalprice', 'w')}
                   / count(*) OVER w)
                / count(*) OVER w, 0.0))                   AS frame_sd,
           count(*) OVER w                                 AS frame_n
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
)
def win_stat_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Statistical aggregates over bounded frames — the case the reference
    # built its segment tree for (stupidb/associative/segmenttree.py). Native
    # var_samp/stddev drift between engines (different one-pass algorithms),
    # so frame variance is computed from exact decimal moment sums — the
    # moment route is also what a segment tree would aggregate.
    w = rows_window(
        partition_by=("o_custkey",),
        order_by=("o_orderdate", "o_orderkey"),
        preceding=3,
        following=0,
    )
    price = F.col("o_totalprice")
    n = F.count(F.lit(1)).over(w)
    s1 = _wsum("o_totalprice", w)
    s2 = X.dsum_over(price * price, w, 4)
    var_samp = F.when(n > 1, (s2 - s1 * s1 / n) / (n - 1))
    # exact-moment numerator can be a hair negative when n=1 (s1*s1 double-
    # rounds differently than the exact Σx²); clamp — DuckDB errors on
    # sqrt(<0) where Spark yields NaN, and the clamp is deterministic.
    sd_pop = F.sqrt(F.greatest((s2 - s1 * s1 / n) / n, F.lit(0.0)))
    return _t(spark, sf_dir, "orders") >> select(
        "o_orderkey",
        frame_var=var_samp,
        frame_sd=sd_pop,
        frame_n=n,
    )


@q(
    "win_running_distinct",
    """
    SELECT event_id, user_id,
           count(DISTINCT event_type)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS n_types_seen
    FROM events
    """,
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Distinct aggregate over a running frame — Spark windows don't accept
    # COUNT(DISTINCT), so the idiomatic form is size(collect_set(...)):
    # the set state is bounded by the distinct-value cardinality (5 event
    # types here), NOT the frame length, so the per-row state stays tiny
    # even over an unbounded frame at 100 TB. For high-cardinality columns
    # this becomes approx HLL territory (agg_approx_sketch's trade-off).
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return _t(spark, sf_dir, "events") >> select(
        "event_id",
        "user_id",
        n_types_seen=F.size(F.collect_set("event_type").over(w)).cast("long"),
    )


@q(
    "win_moving_median",
    """
    -- Discrete moving median over a bounded ROWS frame. Spark windows have
    -- no median, so both engines build the frame's value list explicitly
    -- (list agg over the identical frame), sort it, and index the lower
    -- median — element selection, no interpolation, exact on any engine.
    WITH w AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               list(o_totalprice) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey
                                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                   AS frame_vals
        FROM orders
    )
    SELECT o_custkey, o_orderkey,
           list_sort(frame_vals)[CAST(ceil(len(frame_vals) / 2.0) AS BIGINT)]
               AS moving_median,
           CAST(len(frame_vals) AS INT) AS frame_n
    FROM w
    """,
)
def win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The one aggregate Spark's window engine genuinely lacks: median over
    # a frame. collect_list over the BOUNDED frame keeps per-row state at
    # frame-length values (7 here) — the scale knob is the frame, never the
    # partition; array_sort + element_at pick the lower discrete median
    # exactly. (An unbounded-frame median would need the two-heap/segment
    # tree treatment — out of scope; bounded frames are the common case
    # for smoothing.)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, 3)
    )
    frame_vals = F.collect_list("o_totalprice").over(w)
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.element_at(
            F.array_sort(frame_vals),
            F.ceil(F.size(frame_vals) / F.lit(2.0)).cast("int"),
        ).alias("moving_median"),
        F.size(frame_vals).alias("frame_n"),
    )
