"""Event-time queries over the ``events`` table: tumbling / sliding / session
windows (batch), as-of join, range join.

Entirely beyond the reference (streaming and temporal ops are absent,
SURVEY.md §2.8). Batch forms here share semantics with the Structured
Streaming variants in ``stupidb_spark/streaming`` — same ``F.window`` /
``F.session_window`` expressions, so a correctness result on the batch oracle
transfers to the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stupidb_spark.operators.asof import asof_join
from stupidb_spark.functions import exact as X
from stupidb_spark.queryset import q
from stupidb_spark.sources import load_table
from stupidb_spark.verbs import aggregate, group_by, select


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@q(
    "events_tumbling",
    f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*)               AS n_events,
           {X.sql_dsum('value', 4)} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Tumbling 1h event-time windows; F.window aligns to epoch origin, which
    # for whole hours equals date_trunc('hour') — the oracle's bucketing.
    return (
        _events(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            X.dsum("value", 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@q(
    "events_sliding",
    f"""
    -- 1h windows sliding every 30min: each event belongs to exactly two
    -- windows, starts at bucket(ts) and bucket(ts) - 30min.
    SELECT time_bucket(INTERVAL 30 MINUTES, ts) - k.off * INTERVAL 30 MINUTES
               AS window_start,
           count(*)             AS n_events,
           {X.sql_dsum('value', 4)} AS total_value
    FROM events CROSS JOIN (VALUES (0), (1)) k(off)
    GROUP BY 1
    """,
)
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            X.dsum("value", 4).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


@q(
    "events_session",
    f"""
    -- Gaps-and-islands sessionization with a 30-minute inactivity gap:
    -- new session when the previous event is more than 30min older.
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         <= INTERVAL 30 MINUTES
                    THEN 0 ELSE 1 END AS new_session
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM flagged
    )
    SELECT user_id,
           min(ts)                         AS session_start,
           max(ts) + INTERVAL 30 MINUTES   AS session_end,
           count(*)                        AS n_events,
           {X.sql_dsum('value', 4)} AS total_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Native session windows (30min gap). F.session_window merges events
    # whose gap ≤ 30min; end = last_ts + gap — mirrored by the oracle's
    # gaps-and-islands CTE. Same expression works under Structured Streaming
    # with a watermark (stupidb_spark/streaming/events.py).
    return (
        _events(spark, sf_dir)
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            X.dsum("value", 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@q(
    "asof_join_orders",
    """
    -- Most recent order at-or-before each event, per user. Right side is
    -- deduplicated to one row per (custkey, orderdate) — max orderkey — to
    -- make ties deterministic on both engines.
    WITH r AS (
        SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        FROM orders GROUP BY 1, 2
    )
    SELECT e.event_id, e.user_id, e.ts, r.o_orderkey, r.o_orderdate
    FROM events e
    ASOF LEFT JOIN r ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
    """,
)
def asof_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Union-merge as-of join (stupidb_spark/operators/asof.py): one shuffle +
    # one sort, O(n+m) — not a range-join pair explosion.
    events = _events(spark, sf_dir).select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    joined = asof_join(
        events,
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        how="left",
    )
    return joined.select("event_id", "user_id", "ts", "o_orderkey", "o_orderdate")


@q(
    "events_props_json",
    """
    SELECT event_type,
           count(*) AS n_events,
           count(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT)) AS n_keys,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS DOUBLE)
               / count(*) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Semi-structured extraction: the ``props`` column is a JSON payload;
    # ``from_json`` with a *typed* schema parses it JVM-side inside codegen
    # (never a Python UDF), after which the extracted field is an ordinary
    # long column — predicate pushdown and whole-stage codegen both apply.
    # At 100 TB the parse cost is one pass at scan speed; the single exact
    # int division makes avg_k bit-identical across engines.
    k = F.from_json(F.col("props"), "k BIGINT")["k"]
    return (
        _events(spark, sf_dir)
        .withColumn("k", k)
        >> group_by("event_type")
        >> aggregate(
            n_events=F.count(F.lit(1)),
            n_keys=F.count_distinct(F.col("k")),
            sum_k=F.sum("k"),
            avg_k=F.sum("k").cast("double") / F.count(F.lit(1)),
        )
    )


@q(
    "events_attribution",
    """
    SELECT v.event_id AS view_id, c.event_id AS click_id,
           v.user_id, v.ts AS view_ts, c.ts AS click_ts
    FROM events v JOIN events c
      ON c.user_id = v.user_id
     AND v.event_type = 'view' AND c.event_type = 'click'
     AND c.ts >= v.ts AND c.ts < v.ts + INTERVAL 4 HOUR
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Interval self-join: each click attributed to the same user's views in
    # the preceding 4 hours. The equi key (user_id) carries the shuffle —
    # the time range is a post-join filter on co-located rows, never a
    # cartesian pair explosion. Batch twin of
    # ``streaming.attribution_stream`` (same join condition; the streaming
    # form adds watermarks so the buffered state is horizon-bounded).
    ev = _events(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    )
    return (
        views.join(
            clicks,
            (F.col("user_id") == F.col("click_user"))
            & (F.col("click_ts") >= F.col("view_ts"))
            & (F.col("click_ts") < F.col("view_ts") + F.expr("INTERVAL 4 HOURS")),
        )
        .select("view_id", "click_id", "user_id", "view_ts", "click_ts")
    )


@q(
    "range_join_buckets",
    f"""
    SELECT b.bucket_name,
           count(*)             AS n_events,
           {X.sql_dsum('e.value', 4)} AS total_value
    FROM events e
    JOIN (VALUES ('low', 0.0, 25.0), ('mid', 25.0, 50.0),
                 ('high', 50.0, 75.0), ('top', 75.0, 1e9)) b(bucket_name, lo, hi)
      ON e.value >= b.lo AND e.value < b.hi
    GROUP BY 1
    """,
)
def range_join_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Static non-overlapping banding — the degenerate range join. bucketize
    # compiles the interval list to a chained CASE inside the scan stage, so
    # the only shuffle is the groupBy: one scan, one exchange, no join
    # operator at all (a broadcast-NLJ here measured 2.2× slower at sf0.1).
    # The general operator for data-driven / overlapping intervals is
    # operators/asof.py:range_join (exercised in tests/test_plans.py).
    from stupidb_spark.operators.asof import bucketize

    buckets = [
        ("low", 0.0, 25.0),
        ("mid", 25.0, 50.0),
        ("high", 50.0, 75.0),
        ("top", 75.0, 1e9),
    ]
    banded = bucketize(_events(spark, sf_dir), buckets, value=F.col("value"))
    return (
        banded.filter(F.col("bucket_name").isNotNull())
        .groupBy("bucket_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            X.dsum("value", 4).alias("total_value"),
        )
    )


@q(
    "events_props_running",
    """
    SELECT event_id, user_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           count(DISTINCT event_type)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS n_types_seen
    FROM events
    """,
)
def events_props_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gate combo: typed JSON extraction (``from_json`` parses JVM-side in
    # codegen — never a Python UDF) + a running distinct-count window
    # (size(collect_set) — per-row state bounded by the event-type
    # cardinality, not the frame length, so the unbounded frame stays tiny
    # at 100 TB). Consolidates events_props_json + win_running_distinct
    # into one hard-signal row.
    from pyspark.sql.window import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.from_json(F.col("props"), "k BIGINT")["k"].alias("k"),
        F.size(F.collect_set("event_type").over(w)).cast("long").alias("n_types_seen"),
    )


@q(
    "events_sessionize_window",
    """
    WITH marked AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, event_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM marked
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           count(*) AS n_events,
           min(ts)  AS session_start,
           max(ts)  AS session_end
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def events_sessionize_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Window-composed sessionization — the lag/cumsum idiom: mark a row as a
    # session opener when its gap from the previous event exceeds 30min,
    # running-sum the markers into session numbers, then aggregate. Same
    # semantics as F.session_window (events_session proves that path); this
    # form is what users reach for when they need the session MEMBERS, not
    # just the window bounds. One user_id shuffle serves both window passes
    # and the final groupBy — Spark reuses the partitioning, so the whole
    # pipeline is a single exchange.
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap: the oracle's INTERVAL comparison is µs-precise,
    # and ts.cast('long') truncates to whole seconds — a gap in
    # (1800s, 1801s) would split sessions differently between engines
    gap_ok = (
        F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    ) <= 1800 * 1_000_000
    marked = _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(gap_ok, F.lit(0)).otherwise(F.lit(1)).alias("new_session"),
    )
    numbered = marked.withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@q(
    "asof_join_forward",
    """
    -- Next order at-or-after each event, per user (forward as-of). Right
    -- side deduplicated exactly as the backward twin.
    WITH r AS (
        SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        FROM orders GROUP BY 1, 2
    )
    SELECT e.event_id, e.user_id, e.ts, r.o_orderkey, r.o_orderdate
    FROM events e
    ASOF LEFT JOIN r ON e.user_id = r.o_custkey AND e.ts <= r.o_orderdate
    """,
)
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    # direction='forward': the union-merge scans time in reverse, carrying
    # the nearest FUTURE right payload — same O(n+m), one shuffle + one
    # sort, no pair explosion (operators/asof.py).
    events = _events(spark, sf_dir).select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    joined = asof_join(
        events,
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        how="left",
        direction="forward",
    )
    return joined.select("event_id", "user_id", "ts", "o_orderkey", "o_orderdate")
