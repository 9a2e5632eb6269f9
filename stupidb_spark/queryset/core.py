"""Core relational queries: scan/filter/project, joins, group-by aggregation,
sort/limit — SURVEY.md §2.2, §2.3, §2.4, §2.6.

Every query is written with the verb layer so the user API is what's being
verified.

Float discipline (see stupidb_spark/functions/exact.py): **no round() in any
output**. Aggregates over fixed-point columns use exact decimal-moment
arithmetic, per-row derivations are identical IEEE double expressions on both
engines — results are bit-identical by construction, which is the only thing
that survives a hash comparison (round()'s halfway rules differ between
engines, so rounding *adds* risk rather than removing it).

Scale notes are attached per query: the fixture dims (region/nation/supplier,
and customer at low SF) are broadcast; fact-fact joins shuffle on their keys
and rely on AQE for skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stupidb_spark.queryset import q
from stupidb_spark.sources import load_table
from stupidb_spark.functions import aggregates as agg
from stupidb_spark.functions import exact as X
from stupidb_spark.window import partition_window
from stupidb_spark.verbs import (
    Nulls,
    aggregate,
    anti_join,
    cross_join,
    distinct,
    full_join,
    group_by,
    inner_join,
    left_join,
    limit,
    mutate,
    order_by,
    right_join,
    select,
    semi_join,
    sift,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# flagship: TPC-H Q1 shape (scan → filter → hash agg → sort)
# Exercises §2.2 filter, §2.4 group-by agg, §2.6 sort in one query.
# Scale: filter + projection push to the parquet scan; partial agg means the
# shuffle carries 6 state rows per flag/status per partition; decimal sums
# keep the result independent of partitioning (exact.py).
# ---------------------------------------------------------------------------

_DISC_PRICE_SQL = "l_extendedprice * (1 - l_discount)"
_CHARGE_SQL = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"


@q(
    "tpch_q1",
    f"""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)                          AS sum_qty,
           {X.sql_dsum('l_extendedprice', 2)}       AS sum_base_price,
           {X.sql_dsum(_DISC_PRICE_SQL, 4)}         AS sum_disc_price,
           {X.sql_dsum(_CHARGE_SQL, 6)}             AS sum_charge,
           {X.sql_davg('l_quantity', 2)}            AS avg_qty,
           {X.sql_davg('l_extendedprice', 2)}       AS avg_price,
           {X.sql_davg('l_discount', 2)}            AS avg_disc,
           count(*)                                 AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        _t(spark, sf_dir, "lineitem")
        >> sift(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        >> group_by("l_returnflag", "l_linestatus")
        >> aggregate(
            # quantities are integer-valued: a double sum is already exact
            sum_qty=agg.sum("l_quantity"),
            sum_base_price=X.dsum("l_extendedprice", 2),
            sum_disc_price=X.dsum(disc_price, 4),
            sum_charge=X.dsum(charge, 6),
            avg_qty=X.davg("l_quantity", 2),
            avg_price=X.davg("l_extendedprice", 2),
            avg_disc=X.davg("l_discount", 2),
            count_order=F.count(F.lit(1)),
        )
        >> order_by("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# projection / scalar functions (§2.2) — the reference has no scalar library
# (arbitrary lambdas, stupidb/typehints.py:28-31); ours are Column built-ins.
# ---------------------------------------------------------------------------


@q(
    "project_scalar",
    """
    SELECT p_partkey,
           lower(p_name)                                   AS name_lower,
           upper(p_brand)                                  AS brand_upper,
           length(p_name)                                  AS name_len,
           substring(p_type, 1, 5)                         AS type_prefix,
           p_name || ':' || p_brand                        AS name_brand,
           p_size + 10                                     AS size_plus,
           p_retailprice * 1.1                             AS price_bumped,
           abs(p_size - 25)                                AS size_dist,
           CASE WHEN p_size > 25 THEN 'large'
                WHEN p_size > 10 THEN 'medium'
                ELSE 'small' END                           AS size_class
    FROM part
    """,
)
def project_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "part") >> select(
        "p_partkey",
        name_lower=F.lower("p_name"),
        brand_upper=F.upper("p_brand"),
        name_len=F.length("p_name"),
        type_prefix=F.substring("p_type", 1, 5),
        # concat (not concat_ws): || yields NULL on a NULL operand and
        # concat_ws silently skips it — same null semantics as the oracle
        name_brand=F.concat(F.col("p_name"), F.lit(":"), F.col("p_brand")),
        size_plus=F.col("p_size") + 10,
        price_bumped=F.col("p_retailprice") * 1.1,
        size_dist=F.abs(F.col("p_size") - 25),
        size_class=F.when(F.col("p_size") > 25, "large")
        .when(F.col("p_size") > 10, "medium")
        .otherwise("small"),
    )


@q(
    "project_datetime",
    """
    SELECT o_orderkey,
           year(o_orderdate)                                AS order_year,
           month(o_orderdate)                               AS order_month,
           day(o_orderdate)                                 AS order_day,
           dayofweek(o_orderdate)                           AS order_dow,
           o_orderdate + INTERVAL 30 DAY                    AS due_date,
           datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch95
    FROM orders
    """,
)
def project_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dayofweek: DuckDB returns 0=Sunday..6; Spark dayofweek is 1=Sunday..7.
    return _t(spark, sf_dir, "orders") >> select(
        "o_orderkey",
        order_year=F.year("o_orderdate"),
        order_month=F.month("o_orderdate"),
        order_day=F.dayofmonth("o_orderdate"),
        order_dow=F.dayofweek("o_orderdate") - 1,
        due_date=F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
        days_since_epoch95=F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).cast("long"),
    )


@q(
    "mutate_derived",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           l_extendedprice * (1 - l_discount)                      AS net_price,
           floor(l_extendedprice / l_quantity * 10000) / 10000     AS unit_price,
           l_discount > 0.05                                       AS high_discount
    FROM lineitem
    """,
)
def mutate_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mutate (appending projection, stupidb/api.py:353-397) then narrow.
    # Per-row derived floats are identical IEEE expressions on both engines;
    # the division is floor-truncated only to demonstrate deterministic
    # truncation (floor of identical doubles is engine-independent).
    return (
        _t(spark, sf_dir, "lineitem")
        >> mutate(
            net_price=F.col("l_extendedprice") * (1 - F.col("l_discount")),
            unit_price=F.floor(F.col("l_extendedprice") / F.col("l_quantity") * 10000)
            / 10000,
            high_discount=F.col("l_discount") > 0.05,
        )
        >> select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "net_price",
            "unit_price",
            "high_discount",
        )
    )


@q(
    "filter_compound",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_discount > 0.03
      AND l_returnflag IN ('A', 'R')
      AND NOT (l_linestatus = 'F' AND l_tax > 0.07)
    """,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Compound predicate — pushed to the parquet scan by Catalyst.
    return (
        _t(spark, sf_dir, "lineitem")
        >> sift(
            F.col("l_quantity").between(10, 20)
            & (F.col("l_discount") > 0.03)
            & F.col("l_returnflag").isin("A", "R")
            & ~((F.col("l_linestatus") == "F") & (F.col("l_tax") > 0.07))
        )
        >> select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")
    )


@q(
    "distinct_rows",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem") >> select("l_returnflag", "l_linestatus") >> distinct()


# ---------------------------------------------------------------------------
# joins (§2.3) — reference is always nested-loop over an eager Cartesian
# product (stupidb/core.py:328-340); here Catalyst picks broadcast-hash for
# the dim tables and sort-merge for fact-fact.
# ---------------------------------------------------------------------------


@q(
    "join_inner_star",
    f"""
    SELECT r_name AS region_name, n_name AS nation_name,
           count(*) AS n_customers,
           {X.sql_dsum('c_acctbal', 2)} AS total_balance
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1, 2
    """,
)
def join_inner_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    # Dims are broadcast: no shuffle of the customer fact for either join.
    return (
        _t(spark, sf_dir, "customer")
        >> inner_join(nation, F.col("c_nationkey") == F.col("n_nationkey"), broadcast=True)
        >> inner_join(region, F.col("n_regionkey") == F.col("r_regionkey"), broadcast=True)
        >> group_by(region_name=F.col("r_name"), nation_name=F.col("n_name"))
        >> aggregate(
            n_customers=F.count(F.lit(1)),
            total_balance=X.dsum("c_acctbal", 2),
        )
    )


@q(
    "join_left_nullpad",
    f"""
    SELECT c_custkey, c_name,
           count(o_orderkey)                   AS n_orders,
           {X.sql_dtotal('o_totalprice', 2)}   AS total_spend
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus = 'F'
    GROUP BY 1, 2
    """,
)
def join_left_nullpad(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Unmatched customers keep null order columns (reference pads with
    # dict.fromkeys, stupidb/core.py:382); count(o_orderkey) counts non-null;
    # TOTAL semantics give unmatched customers 0.0 spend
    # (stupidb/functions/associative/__init__.py:127-133).
    orders = _t(spark, sf_dir, "orders") >> sift(F.col("o_orderstatus") == "F")
    return (
        _t(spark, sf_dir, "customer")
        >> left_join(orders, F.col("c_custkey") == F.col("o_custkey"))
        >> group_by("c_custkey", "c_name")
        >> aggregate(
            n_orders=agg.count("o_orderkey"),
            total_spend=X.dtotal("o_totalprice", 2),
        )
    )


@q(
    "join_right",
    """
    SELECT o_orderkey, c_custkey, c_name
    FROM orders
    RIGHT JOIN customer ON o_custkey = c_custkey AND o_totalprice > 300000
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    return (
        _t(spark, sf_dir, "orders")
        >> right_join(
            customer,
            (F.col("o_custkey") == F.col("c_custkey")) & (F.col("o_totalprice") > 300000),
        )
        >> select("o_orderkey", "c_custkey", "c_name")
    )


@q(
    "join_full_outer",
    """
    WITH rich AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 4000),
         big  AS (SELECT o_custkey, o_orderkey, o_totalprice FROM orders
                  WHERE o_totalprice > 400000)
    SELECT c_custkey, c_acctbal, o_orderkey, o_totalprice
    FROM rich FULL OUTER JOIN big ON c_custkey = o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # full_join is declared-but-NotImplementedError in the reference
    # (stupidb/api.py:261-265) — first-class here.
    rich = _t(spark, sf_dir, "customer") >> sift(F.col("c_acctbal") > 4000) >> select(
        "c_custkey", "c_acctbal"
    )
    big = _t(spark, sf_dir, "orders") >> sift(F.col("o_totalprice") > 400000) >> select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return (
        rich
        >> full_join(big, F.col("c_custkey") == F.col("o_custkey"))
        >> select("c_custkey", "c_acctbal", "o_orderkey", "o_totalprice")
    )


@q(
    "join_cross",
    "SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cartesian product (stupidb/api.py:134-178) — only ever sane on small
    # relations; at scale prefer broadcast of one side (Spark does: BNLJ).
    return (
        _t(spark, sf_dir, "region")
        >> cross_join(_t(spark, sf_dir, "nation"))
        >> select("r_name", "n_name")
    )


@q(
    "join_theta",
    """
    SELECT s_suppkey, c_custkey
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Theta join: equi part hashes, inequality filters post-match. The
    # reference runs the full O(n·m) product for every join; here only the
    # equi-key buckets are compared.
    supplier = _t(spark, sf_dir, "supplier")
    return (
        _t(spark, sf_dir, "customer")
        >> inner_join(
            supplier,
            (F.col("s_nationkey") == F.col("c_nationkey"))
            & (F.col("s_acctbal") > F.col("c_acctbal")),
            broadcast=True,
        )
        >> select("s_suppkey", "c_custkey")
    )


@q(
    "join_semi_exists",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
)
def join_semi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The reference expresses EXISTS as per-row re-execution of a filtered
    # relation (stupidb/api.py:431-438, O(n·m)); this is a hash left-semi join.
    urgent = _t(spark, sf_dir, "orders") >> sift(F.col("o_orderpriority") == "1-URGENT")
    return (
        _t(spark, sf_dir, "customer")
        >> semi_join(urgent, F.col("c_custkey") == F.col("o_custkey"))
        >> select("c_custkey", "c_name")
    )


@q(
    "join_anti_not_exists",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
)
def join_anti_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    urgent = _t(spark, sf_dir, "orders") >> sift(F.col("o_orderpriority") == "1-URGENT")
    return (
        _t(spark, sf_dir, "customer")
        >> anti_join(urgent, F.col("c_custkey") == F.col("o_custkey"))
        >> select("c_custkey", "c_name")
    )


@q(
    "join_fact_fact",
    f"""
    SELECT o_orderpriority,
           count(DISTINCT o_orderkey)           AS n_orders,
           {X.sql_dsum(_DISC_PRICE_SQL, 4)}     AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY 1
    """,
)
def join_fact_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fact-fact shuffle join on the key both sides are naturally keyed by;
    # at 100 TB this is the canonical sort-merge join + AQE skew handling.
    orders = _t(spark, sf_dir, "orders") >> sift(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    return (
        orders
        >> inner_join(
            _t(spark, sf_dir, "lineitem"), F.col("o_orderkey") == F.col("l_orderkey")
        )
        >> group_by("o_orderpriority")
        >> aggregate(
            n_orders=F.countDistinct("o_orderkey"),
            revenue=X.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4),
        )
    )


# ---------------------------------------------------------------------------
# aggregation (§2.4): all 12 reference aggregates, global & grouped,
# computed keys, count distinct, having — exact decimal moments throughout
# ---------------------------------------------------------------------------


@q(
    "agg_global_all12",
    f"""
    SELECT count(l_quantity)                            AS count_qty,
           sum(l_quantity)                              AS sum_qty,
           coalesce({X.sql_dsum('CASE WHEN l_quantity > 1e9 THEN l_quantity END', 2)}, 0.0)
                                                        AS total_empty,
           {X.sql_davg('l_quantity', 2)}                AS mean_qty,
           min(l_quantity)                              AS min_qty,
           max(l_quantity)                              AS max_qty,
           {X.sql_dcovar('l_quantity', 'l_extendedprice', 2, samp=True)}  AS cov_samp_qp,
           {X.sql_dcovar('l_quantity', 'l_extendedprice', 2, samp=False)} AS cov_pop_qp,
           {X.sql_dvar_samp('l_quantity', 2)}           AS var_samp_qty,
           {X.sql_dvar_pop('l_quantity', 2)}            AS var_pop_qty,
           {X.sql_dstddev_samp('l_quantity', 2)}        AS stdev_samp_qty,
           {X.sql_dstddev_pop('l_quantity', 2)}         AS stdev_pop_qty
    FROM lineitem
    """,
)
def agg_global_all12(spark: SparkSession, sf_dir: str) -> DataFrame:
    # All 12 reference aggregates (stupidb/functions/associative/__init__.py)
    # in one ungrouped pass — empty partitioners ⇒ one global group, matching
    # stupidb/core.py:214-216. `total_empty` exercises TOTAL's empty ⇒ 0.0.
    qty = F.col("l_quantity")
    return _t(spark, sf_dir, "lineitem") >> aggregate(
        count_qty=agg.count(qty),
        sum_qty=agg.sum(qty),
        total_empty=X.dtotal(F.when(qty > 1e9, qty), 2),
        mean_qty=X.davg(qty, 2),
        min_qty=agg.min(qty),
        max_qty=agg.max(qty),
        cov_samp_qp=X.dcovar_samp(qty, "l_extendedprice", 2),
        cov_pop_qp=X.dcovar_pop(qty, "l_extendedprice", 2),
        var_samp_qty=X.dvar_samp(qty, 2),
        var_pop_qty=X.dvar_pop(qty, 2),
        stdev_samp_qty=X.dstddev_samp(qty, 2),
        stdev_pop_qty=X.dstddev_pop(qty, 2),
    )


@q(
    "agg_grouped_stats",
    f"""
    SELECT l_returnflag,
           count(*)                                     AS n_rows,
           {X.sql_dsum('l_extendedprice', 2)}           AS sum_price,
           {X.sql_davg('l_extendedprice', 2)}           AS avg_price,
           min(l_shipdate)                              AS first_ship,
           max(l_shipdate)                              AS last_ship,
           {X.sql_dvar_samp('l_extendedprice', 2)}      AS var_price,
           {X.sql_dstddev_pop('l_discount', 2)}         AS sd_disc,
           {X.sql_dcovar('l_quantity', 'l_discount', 2, samp=True)} AS cov_qd
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_grouped_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        >> group_by("l_returnflag")
        >> aggregate(
            n_rows=F.count(F.lit(1)),
            sum_price=X.dsum("l_extendedprice", 2),
            avg_price=X.davg("l_extendedprice", 2),
            first_ship=agg.min("l_shipdate"),
            last_ship=agg.max("l_shipdate"),
            var_price=X.dvar_samp("l_extendedprice", 2),
            sd_disc=X.dstddev_pop("l_discount", 2),
            cov_qd=X.dcovar_samp("l_quantity", "l_discount", 2),
        )
    )


@q(
    "agg_computed_key",
    f"""
    SELECT c_acctbal > 0 AS positive,
           count(*)       AS n,
           {X.sql_davg('c_acctbal', 2)} AS avg_bal
    FROM customer GROUP BY 1
    """,
)
def agg_computed_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Computed (boolean) group key — the reference's test uses r.balance > 0
    # as a partition key (stupidb/tests/test_stupidb.py:767).
    return (
        _t(spark, sf_dir, "customer")
        >> group_by(positive=F.col("c_acctbal") > 0)
        >> aggregate(n=F.count(F.lit(1)), avg_bal=X.davg("c_acctbal", 2))
    )


@q(
    "agg_count_distinct",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey)  AS n_parts,
           count(DISTINCT l_suppkey)  AS n_supps
    FROM lineitem GROUP BY 1
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Distinct aggregation — absent in the reference (SURVEY.md §2.4), free
    # in Spark (expand + two-phase agg).
    return (
        _t(spark, sf_dir, "lineitem")
        >> group_by("l_returnflag")
        >> aggregate(
            n_parts=F.countDistinct("l_partkey"),
            n_supps=F.countDistinct("l_suppkey"),
        )
    )


@q(
    "agg_having",
    """
    SELECT l_partkey, count(*) AS n, sum(l_quantity) AS qty
    FROM lineitem GROUP BY 1 HAVING count(*) >= 3
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HAVING = sift after aggregate (post-agg filter). Integer-valued
    # quantities sum exactly in double.
    return (
        _t(spark, sf_dir, "lineitem")
        >> group_by("l_partkey")
        >> aggregate(n=F.count(F.lit(1)), qty=F.sum("l_quantity"))
        >> sift(F.col("n") >= 3)
    )


@q(
    "agg_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           count(*) AS n, sum(l_quantity) AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag),
                            (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Grouping-set aggregation — absent in the reference (SURVEY.md §2.4);
    # native DataFrame groupingSets here. The four explicit sets are the
    # superset of ROLLUP (first three) and exactly CUBE, so this one query
    # covers rollup/cube/grouping-sets; `gid` (grouping_id, first column =
    # most significant bit in both engines) disambiguates the sets without
    # relying on the key columns being non-null. One Expand + one hash agg —
    # no re-scan per set at any scale.
    return (
        _t(spark, sf_dir, "lineitem")
        .groupingSets(
            [
                ["l_returnflag", "l_linestatus"],
                ["l_returnflag"],
                ["l_linestatus"],
                [],
            ],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("qty"),
        )
    )


# ---------------------------------------------------------------------------
# sort / limit / top-k (§2.6)
# ---------------------------------------------------------------------------


@q(
    "sort_limit_offset",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 10
    """,
)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic: o_orderkey is a unique tiebreak. islice semantics as the
    # reference (stupidb/api.py:718-737).
    return (
        _t(spark, sf_dir, "orders")
        >> order_by(F.col("o_totalprice").desc(), "o_orderkey")
        >> limit(20, offset=10)
        >> select("o_orderkey", "o_totalprice")
    )


@q(
    "sort_topk",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 15
    """,
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # order_by >> limit fuses to TakeOrderedAndProject — no global sort, each
    # partition keeps k rows and the driver merges (scale-safe top-k).
    return (
        _t(spark, sf_dir, "customer")
        >> order_by(F.col("c_acctbal").desc(), "c_custkey")
        >> limit(15)
        >> select("c_custkey", "c_name", "c_acctbal")
    )


@q(
    "sort_nulls_first",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END AS maybe_price
    FROM orders
    ORDER BY maybe_price ASC NULLS FIRST, o_orderkey
    LIMIT 50
    """,
)
def sort_nulls_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Null ordering — reference defaults to NULLS FIRST
    # (stupidb/aggregation.py:43-48); unique o_orderkey tiebreak keeps the
    # LIMIT deterministic.
    maybe = F.when(F.col("o_orderstatus") == "O", F.lit(None).cast("double")).otherwise(
        F.col("o_totalprice")
    )
    return (
        _t(spark, sf_dir, "orders")
        >> select("o_orderkey", maybe_price=maybe)
        >> order_by("maybe_price", F.col("o_orderkey").asc(), nulls=Nulls.FIRST)
        >> limit(50)
    )


@q(
    "agg_salted_skew",
    f"""
    SELECT o_custkey, count(*) AS n, {X.sql_dsum('o_totalprice', 2)} AS spend
    FROM orders GROUP BY 1
    """,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two-level salted aggregation (stupidb_spark/operators/skew.py) — the
    # declarative answer to hot group keys at 100 TB. Result-identical to the
    # plain groupBy (salting changes placement, never values): the oracle IS
    # the plain SQL.
    from stupidb_spark.operators.skew import salted_aggregate

    out = salted_aggregate(
        _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice"),
        ["o_custkey"],
        partial_aggs={"n": F.count(F.lit(1)), "s": X.usum("o_totalprice", 2)},
        merge_aggs={"n": F.sum("n"), "s": F.sum("s")},
        n_salts=16,
    )
    return out.select(
        "o_custkey",
        "n",
        (F.col("s").cast("double") / F.lit(100.0)).alias("spend"),
    )


# ---------------------------------------------------------------------------
# classic TPC-H shapes beyond Q1 — the canonical join/agg/topk plans a
# warehouse engine must get right; all exact.py float discipline
# ---------------------------------------------------------------------------


@q(
    "tpch_q6",
    f"""
    SELECT {X.sql_dtotal('l_extendedprice * l_discount', 4)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.05
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pure scan-filter-aggregate: every predicate pushes to the parquet scan
    # (row-group pruning on l_shipdate at scale); single global agg.
    return (
        _t(spark, sf_dir, "lineitem")
        >> sift(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.05)
            & (F.col("l_quantity") < 24)
        )
        >> aggregate(revenue=X.dtotal(F.col("l_extendedprice") * F.col("l_discount"), 4))
    )


@q(
    "tpch_q3",
    f"""
    SELECT l_orderkey,
           {X.sql_dsum(_DISC_PRICE_SQL, 4)} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-03-15'
      AND l_shipdate > TIMESTAMP '1997-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Shipping-priority shape: filtered dim broadcast into a fact-fact
    # join, grouped revenue, top-10 fused to TakeOrderedAndProject.
    cust = _t(spark, sf_dir, "customer") >> sift(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders") >> sift(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem") >> sift(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    return (
        orders
        >> inner_join(cust, F.col("c_custkey") == F.col("o_custkey"), broadcast=True)
        >> inner_join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        >> group_by("l_orderkey", "o_orderdate", "o_orderpriority")
        >> aggregate(
            revenue=X.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
        )
        >> order_by(F.col("revenue").desc(), F.col("l_orderkey").asc())
        >> limit(10)
        >> select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@q(
    "tpch_q5",
    f"""
    SELECT n_name, {X.sql_dsum(_DISC_PRICE_SQL, 4)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Local-supplier-volume shape: six-way join — dims broadcast, facts
    # shuffle on their natural keys; the c_nationkey = s_nationkey clause
    # makes the customer join a theta-equi mix.
    region = _t(spark, sf_dir, "region") >> sift(F.col("r_name") == "ASIA")
    orders = _t(spark, sf_dir, "orders") >> sift(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        orders
        >> inner_join(
            _t(spark, sf_dir, "customer"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        >> inner_join(
            _t(spark, sf_dir, "lineitem"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        >> inner_join(
            _t(spark, sf_dir, "supplier"),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
            broadcast=True,
        )
        >> inner_join(
            _t(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
            broadcast=True,
        )
        >> inner_join(
            region, F.col("n_regionkey") == F.col("r_regionkey"), broadcast=True
        )
        >> group_by("n_name")
        >> aggregate(
            revenue=X.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
        )
        >> order_by(F.col("revenue").desc(), F.col("n_name").asc())
    )


@q(
    "tpch_q17",
    f"""
    WITH li AS (
        SELECT l_partkey, l_quantity, l_extendedprice
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#13' AND p_size <= 10
    ), w AS (
        SELECT l_quantity, l_extendedprice,
               {X.sql_dsum_over('l_quantity', '(PARTITION BY l_partkey)', 2)}
                   / count(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
        FROM li
    )
    SELECT {X.sql_dtotal('l_extendedprice', 2)} / 7.0 AS avg_yearly
    FROM w WHERE l_quantity < 0.4 * avg_qty
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Small-quantity-order revenue: the classic correlated scalar subquery
    # (l_quantity < fraction of that part's average), decorrelated
    # Spark-first. Instead of aggregating ALL of lineitem per partkey and
    # joining back (full fact shuffle + self-join), the broadcast part
    # filter runs FIRST — the per-part average over the surviving ~1% of
    # lineitem is identical because the filter is on part attributes — and
    # the average is a window over the single partkey shuffle. One broadcast
    # join + one shuffle total; at 100 TB the naive plan shuffles the fact
    # table twice. (No p_container in this fixture; brand+size stands in.)
    part_f = _t(spark, sf_dir, "part") >> sift(
        (F.col("p_brand") == "Brand#13") & (F.col("p_size") <= 10)
    )
    li = _t(spark, sf_dir, "lineitem") >> inner_join(
        part_f >> select("p_partkey"),
        F.col("p_partkey") == F.col("l_partkey"),
        broadcast=True,
    )
    from pyspark.sql.window import Window as _W

    pw = _W.partitionBy("l_partkey")
    with_avg = li.select(
        "l_quantity",
        "l_extendedprice",
        (X.dsum_over("l_quantity", pw, 2) / F.count("l_quantity").over(pw)).alias(
            "avg_qty"
        ),
    )
    return (
        with_avg
        >> sift(F.col("l_quantity") < 0.4 * F.col("avg_qty"))
        >> aggregate(
            avg_yearly=X.dtotal("l_extendedprice", 2) / F.lit(7.0)
        )
    )


@q(
    "tpch_q18",
    """
    WITH big AS (
        SELECT l_orderkey, sum(l_quantity) AS sum_qty
        FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Large-volume-customer shape: HAVING over a fact aggregate, fact-fact
    # join, top-k. Aggregating lineitem BEFORE the orders join shrinks the
    # join input from 4 rows/order to 1 (and the HAVING filter to ~0.3%);
    # customer broadcasts; the final top-100 fuses to TakeOrderedAndProject
    # (no global sort at scale). Quantities are integer-valued so the plain
    # double sum is exact.
    big = (
        _t(spark, sf_dir, "lineitem")
        >> group_by("l_orderkey")
        >> aggregate(sum_qty=agg.sum("l_quantity"))
        >> sift(F.col("sum_qty") > 300)
    )
    return (
        big
        >> inner_join(
            _t(spark, sf_dir, "orders"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        >> inner_join(
            _t(spark, sf_dir, "customer"),
            F.col("c_custkey") == F.col("o_custkey"),
            broadcast=True,
        )
        >> order_by(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        >> limit(100)
        >> select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
    )


@q(
    "join_skew_replicate",
    f"""
    SELECT s_name, {X.sql_dsum('l_extendedprice', 2)} AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    """,
)
def join_skew_replicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Salted replicate join (operators/skew.py:replicate_join) proven against
    # the plain-SQL join: the skewed fact side keeps a salt, the other side
    # is replicated x8, and the join key becomes (suppkey, salt) — a hot
    # supplier's rows land on 8 tasks instead of 1. For when the other side
    # is too big to broadcast and AQE's runtime skew split is not available
    # (e.g. the join feeds a co-partitioned downstream op). Exact integer
    # sums make the result independent of the salt-induced ordering.
    from stupidb_spark.operators.skew import replicate_join

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_extendedprice"
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_name"
    )
    return (
        replicate_join(li, supp, ["suppkey"], n_salts=8)
        >> group_by("s_name")
        >> aggregate(
            revenue=X.dsum("l_extendedprice", 2),
            n_items=F.count(F.lit(1)),
        )
    )


@q(
    "agg_median_disc",
    """
    WITH ranked AS (
        SELECT l_returnflag, l_extendedprice,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
               count(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem
    )
    SELECT l_returnflag, l_extendedprice AS median_price
    FROM ranked WHERE rn = (n + 1) // 2
    """,
)
def agg_median_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact discrete median via rank-pick — engine-agnostic (a passthrough
    # source value, no interpolation arithmetic to drift). The reference has
    # no percentile support at all; Spark's percentile()/DuckDB's
    # quantile_cont interpolate with different expression shapes, so the
    # rank-pick form is the oracle-safe way to expose medians.
    w = partition_window(
        "l_returnflag",
        order_by=("l_extendedprice", "l_orderkey", "l_linenumber"),
    )
    from pyspark.sql.window import Window as _W

    count_w = _W.partitionBy("l_returnflag")
    ranked = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(count_w).alias("n"),
    )
    return (
        ranked
        >> sift(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        >> select("l_returnflag", median_price=F.col("l_extendedprice"))
    )


# ---------------------------------------------------------------------------
# more TPC-H plan shapes (Q4/Q12/Q14/Q19/Q22, adapted to fixture columns) —
# correlated EXISTS, conditional aggregation, promo ratio, disjunctive join
# predicates, scalar-subquery filter + anti join
# ---------------------------------------------------------------------------


@q(
    "tpch_q4",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > TIMESTAMP '1996-10-01')
    GROUP BY o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Order-priority-checking shape: correlated EXISTS decorrelated to a
    # LEFT SEMI join — the fact side is pre-filtered by the pushed-down date
    # range, the lineitem side by its own shipdate predicate, and the semi
    # join never widens rows (no dedup needed, unlike an inner join +
    # distinct). The fixture has no l_commitdate/l_receiptdate, so "late"
    # is l_shipdate past the window end. (TPC-H Q4 shape.)
    orders = _t(spark, sf_dir, "orders") >> sift(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    late_lines = _t(spark, sf_dir, "lineitem") >> sift(
        F.col("l_shipdate") > F.lit("1996-10-01").cast("timestamp")
    )
    return (
        orders
        >> semi_join(late_lines, F.col("l_orderkey") == F.col("o_orderkey"))
        >> group_by("o_orderpriority")
        >> aggregate(order_count=F.count(F.lit(1)))
    )


@q(
    "tpch_q12",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_prio_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_prio_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Shipping-mode shape (l_returnflag stands in for the fixture's missing
    # l_shipmode): one fact-fact join, then CONDITIONAL aggregation — the
    # two priority classes are CASE sums inside a single hash agg, not two
    # scans or a pivot shuffle. (TPC-H Q12 shape.)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li = _t(spark, sf_dir, "lineitem") >> sift(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        li
        >> inner_join(
            _t(spark, sf_dir, "orders"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        >> group_by("l_returnflag")
        >> aggregate(
            high_prio_count=F.sum(F.when(high, 1).otherwise(0)),
            low_prio_count=F.sum(F.when(~high, 1).otherwise(0)),
        )
    )


@q(
    "tpch_q14",
    f"""
    SELECT 100.00 * {X.sql_dsum(
        "CASE WHEN p_type = 'PROMO' THEN " + _DISC_PRICE_SQL + " ELSE 0 END", 4
    )} / {X.sql_dsum(_DISC_PRICE_SQL, 4)} AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Promotion-effect shape: broadcast dim join + a ratio of two
    # conditional exact sums in ONE aggregate (a naive plan computes the
    # numerator and denominator as separate subqueries and scans twice).
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0))
    li = _t(spark, sf_dir, "lineitem") >> sift(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    return (
        li
        >> inner_join(
            _t(spark, sf_dir, "part") >> select("p_partkey", "p_type"),
            F.col("p_partkey") == F.col("l_partkey"),
            broadcast=True,
        )
        >> aggregate(
            promo_revenue=F.lit(100.0) * X.dsum(promo, 4) / X.dsum(disc_price, 4)
        )
    )


@q(
    "tpch_q19",
    f"""
    SELECT {X.sql_dsum(_DISC_PRICE_SQL, 4)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Discounted-revenue shape: disjunction of brand/size/quantity
    # conjunctions across BOTH join sides. The part-only prefix of the
    # disjunction (brand+size) is applied to the dim before the broadcast
    # join — shrinking the build side — and the full mixed predicate after;
    # Catalyst cannot split an OR across tables itself, so deriving the
    # dim-side filter by hand is the 100 TB move. (TPC-H Q19 shape.)
    part_pred = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15))
    )
    full_pred = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        _t(spark, sf_dir, "lineitem")
        >> inner_join(
            _t(spark, sf_dir, "part")
            >> sift(part_pred)
            >> select("p_partkey", "p_brand", "p_size"),
            F.col("p_partkey") == F.col("l_partkey"),
            broadcast=True,
        )
        >> sift(full_pred)
        >> aggregate(
            revenue=X.dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            )
        )
    )


@q(
    "agg_pivot_priority",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)
               AS n_urgent,
           count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END)
               AS n_high,
           count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END)
               AS n_medium,
           count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END)
               AS n_notspec,
           count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS n_low
    FROM orders
    GROUP BY 1
    """,
)
def agg_pivot_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pivot (long → wide): order counts per year × priority class. The
    # pivot values are PINNED — with an explicit value list Spark compiles
    # the pivot to conditional aggregates in ONE hash agg pass (same
    # physical plan as the oracle's CASE sums); omitting the list adds a
    # full extra scan just to discover the distinct values, which at 100 TB
    # doubles the query.
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    wide = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .pivot("o_orderpriority", prios)
        .agg(F.count(F.lit(1)))
    )
    names = ["n_urgent", "n_high", "n_medium", "n_notspec", "n_low"]
    return wide.select(
        "order_year",
        *[
            F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(n)
            for p, n in zip(prios, names)
        ],
    )


@q(
    "agg_unpivot_measures",
    f"""
    WITH w AS (
        SELECT l_returnflag,
               {X.sql_dsum('l_quantity', 2)}      AS sum_qty,
               {X.sql_dsum('l_extendedprice', 2)} AS sum_price,
               {X.sql_dsum('l_discount', 2)}      AS sum_disc
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM w
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM w
    UNION ALL
    SELECT l_returnflag, 'sum_disc', sum_disc FROM w
    """,
)
def agg_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Unpivot (wide → long), the dual of agg_pivot_priority: per-flag sums
    # melted into (measure, value) rows. ``unpivot`` compiles to a single
    # Expand node over the aggregated (tiny) relation — the fact table is
    # scanned and aggregated ONCE, unlike the oracle's 3-way UNION which
    # DuckDB must CSE itself.
    wide = (
        _t(spark, sf_dir, "lineitem")
        >> group_by("l_returnflag")
        >> aggregate(
            sum_qty=X.dsum("l_quantity", 2),
            sum_price=X.dsum("l_extendedprice", 2),
            sum_disc=X.dsum("l_discount", 2),
        )
    )
    return wide.unpivot(
        ["l_returnflag"],
        ["sum_qty", "sum_price", "sum_disc"],
        "measure",
        "value",
    )


@q(
    "tpch_q22",
    f"""
    WITH cutoff AS (
        SELECT {X.sql_davg('c_acctbal', 2)} AS avg_bal
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           count(*) AS numcust,
           {X.sql_dsum('c_acctbal', 2)} AS totacctbal
    FROM customer, cutoff
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority IN ('1-URGENT', '2-HIGH')
                        AND o_orderdate >= TIMESTAMP '1997-01-01')
    GROUP BY c_nationkey
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Global-market-opportunity shape (c_nationkey stands in for the
    # fixture's missing phone country code): an uncorrelated scalar
    # subquery (global average balance) becomes a 1-row broadcast
    # cross join — every executor compares against the same cutoff, no
    # second scan per row — and NOT EXISTS becomes a LEFT ANTI join
    # against orders. Every fixture customer has ≥1 order, so the anti
    # join is against a filtered subset (no recent high-priority order)
    # to keep the result non-vacuous. The exact davg/dsum forms keep the
    # cutoff comparison bit-identical across engines. (TPC-H Q22 shape.)
    cust = _t(spark, sf_dir, "customer")
    cutoff = (
        cust
        >> sift(F.col("c_acctbal") > 0.0)
        >> aggregate(avg_bal=X.davg("c_acctbal", 2))
    )
    return (
        cust
        >> cross_join(F.broadcast(cutoff))
        >> sift(F.col("c_acctbal") > F.col("avg_bal"))
        >> anti_join(
            _t(spark, sf_dir, "orders")
            >> sift(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
                & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            )
            >> select("o_custkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        >> group_by("c_nationkey")
        >> aggregate(
            numcust=F.count(F.lit(1)),
            totacctbal=X.dsum("c_acctbal", 2),
        )
    )


@q(
    "join_null_safe",
    """
    WITH l AS (SELECT nullif(event_type, 'error') AS type_key FROM events),
    r AS (SELECT type_key, count(*) AS n_type FROM l GROUP BY type_key)
    SELECT l.type_key,
           count(*)      AS n_rows,
           min(r.n_type) AS n_type
    FROM l JOIN r ON l.type_key IS NOT DISTINCT FROM r.type_key
    GROUP BY l.type_key
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Null-safe equality join (<=> / IS NOT DISTINCT FROM): the NULL-keyed
    # rows (here: 'error' events nullified) MATCH each other instead of
    # silently dropping as they would under plain `=`. eqNullSafe is still
    # a hashable equi-key — Spark plans a real hash/sort-merge join, not a
    # nested loop, so the null-safe form costs nothing extra at 100 TB.
    left = _t(spark, sf_dir, "events").select(
        F.nullif(F.col("event_type"), F.lit("error")).alias("type_key")
    )
    right = (
        left.groupBy("type_key")
        .agg(F.count(F.lit(1)).alias("n_type"))
        .withColumnRenamed("type_key", "r_key")
    )
    return (
        left.join(right, F.col("type_key").eqNullSafe(F.col("r_key")))
        .groupBy("type_key")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("n_type").alias("n_type"),
        )
    )


# ---------------------------------------------------------------------------
# gate combos — one oracled query per *group* of components, so every
# component keeps a hard-signal CORRECTNESS row within the driver's 50-row
# gate (the setop_six pattern). Each branch is the same expression as the
# standalone query it consolidates; the standalone stays registered (51+)
# and oracle-tested locally.
# ---------------------------------------------------------------------------


@q(
    "join_outer_trio",
    """
    SELECT 'left' AS side, c_custkey AS k1, o_orderkey AS k2,
           o_totalprice AS metric
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderstatus = 'F'
    UNION ALL
    SELECT 'right', o_orderkey, c_custkey, c_acctbal
    FROM orders RIGHT JOIN customer
      ON o_custkey = c_custkey AND o_totalprice > 300000
    UNION ALL
    SELECT 'full', c_custkey, o_orderkey, coalesce(c_acctbal, o_totalprice)
    FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 4000) rich
    FULL OUTER JOIN (SELECT o_custkey, o_orderkey, o_totalprice FROM orders
                     WHERE o_totalprice > 400000) big
      ON c_custkey = o_custkey
    """,
)
def join_outer_trio(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Left / right / full outer joins tagged into one relation: each branch
    # null-pads its unmatched side (the reference pads with dict.fromkeys,
    # stupidb/core.py:382; full_join is declared-but-NotImplementedError
    # there, stupidb/api.py:261-265). All three are hashable equi-joins with
    # residual filters — same shuffle story as the standalone queries.
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    left_part = (
        customer
        >> left_join(
            orders >> sift(F.col("o_orderstatus") == "F"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
    ).select(
        F.lit("left").alias("side"),
        F.col("c_custkey").alias("k1"),
        F.col("o_orderkey").alias("k2"),
        F.col("o_totalprice").alias("metric"),
    )
    right_part = (
        orders
        >> right_join(
            customer,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("o_totalprice") > 300000),
        )
    ).select(
        F.lit("right").alias("side"),
        F.col("o_orderkey").alias("k1"),
        F.col("c_custkey").alias("k2"),
        F.col("c_acctbal").alias("metric"),
    )
    rich = customer >> sift(F.col("c_acctbal") > 4000) >> select(
        "c_custkey", "c_acctbal"
    )
    big = orders >> sift(F.col("o_totalprice") > 400000) >> select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    full_part = (
        rich >> full_join(big, F.col("c_custkey") == F.col("o_custkey"))
    ).select(
        F.lit("full").alias("side"),
        F.col("c_custkey").alias("k1"),
        F.col("o_orderkey").alias("k2"),
        F.coalesce("c_acctbal", "o_totalprice").alias("metric"),
    )
    return left_part.unionByName(right_part).unionByName(full_part)


@q(
    "sort_nulls_offset",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END AS maybe_price
    FROM orders
    ORDER BY maybe_price ASC NULLS FIRST, o_orderkey
    LIMIT 50 OFFSET 10
    """,
)
def sort_nulls_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Nulls-first ordering (the reference default, stupidb/aggregation.py:
    # 43-48) combined with limit+offset (islice semantics, stupidb/api.py:
    # 718-737) in one gate row; unique o_orderkey tiebreak keeps the
    # windowed LIMIT deterministic.
    maybe = F.when(F.col("o_orderstatus") == "O", F.lit(None).cast("double")).otherwise(
        F.col("o_totalprice")
    )
    return (
        _t(spark, sf_dir, "orders")
        >> select("o_orderkey", maybe_price=maybe)
        >> order_by("maybe_price", F.col("o_orderkey").asc(), nulls=Nulls.FIRST)
        >> limit(50, offset=10)
    )


@q(
    "agg_distinct_sets",
    """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           count(*) AS n,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           sum(l_quantity) AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag),
                            (l_linestatus), ())
    """,
)
def agg_distinct_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Distinct aggregates *inside* grouping sets — both absent in the
    # reference (SURVEY.md §2.4). One Expand feeds a two-phase distinct
    # agg; the four explicit sets are the superset of ROLLUP and exactly
    # CUBE, so this single gate row covers distinct-agg + rollup + cube +
    # grouping-sets.
    return (
        _t(spark, sf_dir, "lineitem")
        .groupingSets(
            [
                ["l_returnflag", "l_linestatus"],
                ["l_returnflag"],
                ["l_linestatus"],
                [],
            ],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.sum("l_quantity").alias("qty"),
        )
    )


@q(
    "agg_pivot_unpivot",
    """
    WITH w AS (
        SELECT CAST(year(o_orderdate) AS INT) AS order_year,
               count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)
                   AS n_urgent,
               count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END)
                   AS n_high,
               count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END)
                   AS n_medium,
               count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END)
                   AS n_notspec,
               count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS n_low
        FROM orders GROUP BY 1
    )
    SELECT order_year, 'n_urgent' AS priority, n_urgent AS n FROM w
    UNION ALL SELECT order_year, 'n_high', n_high FROM w
    UNION ALL SELECT order_year, 'n_medium', n_medium FROM w
    UNION ALL SELECT order_year, 'n_notspec', n_notspec FROM w
    UNION ALL SELECT order_year, 'n_low', n_low FROM w
    """,
)
def agg_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pivot (long→wide, pinned value list → ONE conditional-agg pass, no
    # value-discovery scan) composed with its dual unpivot (wide→long, a
    # single Expand over the tiny aggregated relation). The fact table is
    # scanned exactly once; the oracle's CTE + 5-way UNION is the same
    # long-format result.
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    names = ["n_urgent", "n_high", "n_medium", "n_notspec", "n_low"]
    wide = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .pivot("o_orderpriority", prios)
        .agg(F.count(F.lit(1)))
        .select(
            "order_year",
            *[
                F.coalesce(F.col(f"`{p}`"), F.lit(0)).cast("long").alias(n)
                for p, n in zip(prios, names)
            ],
        )
    )
    return wide.unpivot(["order_year"], names, "priority", "n")


@q(
    "join_extras",
    """
    WITH l AS (SELECT nullif(event_type, 'error') AS type_key FROM events),
         r AS (SELECT type_key, count(*) AS n_type FROM l GROUP BY type_key),
         ns AS (
             SELECT l.type_key, count(*) AS n_rows, min(r.n_type) AS n_type
             FROM l JOIN r ON l.type_key IS NOT DISTINCT FROM r.type_key
             GROUP BY l.type_key),
         -- dictionary-encoded fuzzy block: levenshtein once per distinct
         -- close NAME pair, expanded by per-brand multiplicities — see
         -- the fuzzy_match_names oracle for the equivalence argument
         -- (sf1: >300 s naive -> 0.05 s, values bit-identical)
         nm AS (SELECT p_brand, p_name, count(*) AS c FROM part GROUP BY 1, 2),
         nd AS (SELECT DISTINCT p_name FROM part),
         np AS (
            SELECT a.p_name AS x, b.p_name AS y,
                   levenshtein(a.p_name, b.p_name) AS d
            FROM nd a JOIN nd b
              ON a.p_name < b.p_name
                 AND abs(length(a.p_name) - length(b.p_name)) <= 2
            WHERE levenshtein(a.p_name, b.p_name) <= 2
         ),
         fz_pairs AS (
            SELECT ax.p_brand, np.d, ax.c * bx.c AS npairs
            FROM np
            JOIN nm ax ON ax.p_name = np.x
            JOIN nm bx ON bx.p_name = np.y AND bx.p_brand = ax.p_brand
            UNION ALL
            SELECT p_brand, 0 AS d, c * (c - 1) // 2 AS npairs
            FROM nm WHERE c >= 2
         ),
         fz AS (
             SELECT p_brand,
                    CAST(sum(npairs) AS BIGINT) AS n_pairs,
                    CAST(min(d) AS BIGINT) AS min_dist,
                    CAST(max(d) AS BIGINT) AS max_dist
             FROM fz_pairs GROUP BY p_brand)
    SELECT 'nullsafe' AS section, coalesce(type_key, '<null>') AS grp_key,
           n_rows AS n, n_type AS lo, n_type AS hi
    FROM ns
    UNION ALL
    SELECT 'fuzzy', p_brand, n_pairs, min_dist, max_dist FROM fz
    """,
)
def join_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Null-safe equality join (eqNullSafe stays a hashable equi-key — a real
    # hash join, not a nested loop) + brand-blocked fuzzy Levenshtein
    # matching (candidate pairs only within the blocking key; codegen'd
    # distance), tagged into one gate relation.
    events_l = _t(spark, sf_dir, "events").select(
        F.nullif(F.col("event_type"), F.lit("error")).alias("type_key")
    )
    events_r = (
        events_l.groupBy("type_key")
        .agg(F.count(F.lit(1)).alias("n_type"))
        .withColumnRenamed("type_key", "r_key")
    )
    nullsafe = (
        events_l.join(events_r, F.col("type_key").eqNullSafe(F.col("r_key")))
        .groupBy("type_key")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("n_type").alias("n_type"),
        )
        .select(
            F.lit("nullsafe").alias("section"),
            F.coalesce("type_key", F.lit("<null>")).alias("grp_key"),
            F.col("n_rows").alias("n"),
            F.col("n_type").alias("lo"),
            F.col("n_type").alias("hi"),
        )
    )
    # Same length-banded levenshtein_pairs engine as fuzzy_match_names —
    # the naive brand-only self-join was the sf1 single-task straggler.
    from stupidb_spark.operators.skew import levenshtein_pairs

    parts = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    fuzzy = (
        levenshtein_pairs(
            parts,
            id_col="p_partkey",
            text_col="p_name",
            block_col="p_brand",
            max_dist=2,
        )
        .groupBy(F.col("block").alias("p_brand"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("dist").alias("min_dist"),
            F.max("dist").alias("max_dist"),
        )
        .select(
            F.lit("fuzzy").alias("section"),
            F.col("p_brand").alias("grp_key"),
            F.col("n_pairs").alias("n"),
            F.col("min_dist").alias("lo"),
            F.col("max_dist").alias("hi"),
        )
    )
    return nullsafe.unionByName(fuzzy)


# ---------------------------------------------------------------------------
# TPC-H shapes, round 3 batch: q7 / q9 / q10 / q13 / q15 adapted to the
# fixture schema (no partsupp table; p_retailprice is the q9 cost proxy;
# nation names are NATION_<k>). Exact decimal sums keep every revenue
# comparison bit-identical to the oracle.
# ---------------------------------------------------------------------------


@q(
    "tpch_q7",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           {X.sql_dsum('volume', 4)} AS revenue
    FROM (
        SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
           OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
    ) shipping
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Volume-shipping shape (TPC-H Q7): trade between two nations by year.
    # Both nation dims broadcast; the only real shuffles are the fact-fact
    # joins on their keys and the final 3-key rollup. The OR-of-pairs filter
    # evaluates post-join on broadcast-joined columns — no blow-up.
    nation = _t(spark, sf_dir, "nation")
    ns = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    nc = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        _t(spark, sf_dir, "lineitem")
        >> inner_join(
            _t(spark, sf_dir, "supplier"),
            F.col("s_suppkey") == F.col("l_suppkey"),
            broadcast=True,
        )
        >> inner_join(
            _t(spark, sf_dir, "orders"), F.col("o_orderkey") == F.col("l_orderkey")
        )
        >> inner_join(
            _t(spark, sf_dir, "customer"), F.col("c_custkey") == F.col("o_custkey"),
            broadcast=True,
        )
        >> inner_join(ns, F.col("s_nationkey") == F.col("s_nk"), broadcast=True)
        >> inner_join(nc, F.col("c_nationkey") == F.col("c_nk"), broadcast=True)
        >> sift(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined
        >> group_by(
            "supp_nation",
            "cust_nation",
            l_year=F.year("l_shipdate").cast("int"),
        )
        >> aggregate(
            revenue=X.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
        )
    )


@q(
    "tpch_q9",
    f"""
    SELECT nation, o_year,
           {X.sql_dsum('amount', 4)} AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity
                   AS amount
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY 1, 2
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Product-type-profit shape (TPC-H Q9; p_retailprice stands in for the
    # fixture's missing ps_supplycost). The p_name filter prunes part BEFORE
    # it broadcasts, so the lineitem join discards non-matching rows at the
    # hash probe — the big fact is filtered by the cheapest dim first.
    part = _t(spark, sf_dir, "part") >> sift(F.col("p_name").like("%red%"))
    joined = (
        _t(spark, sf_dir, "lineitem")
        >> inner_join(part, F.col("p_partkey") == F.col("l_partkey"), broadcast=True)
        >> inner_join(
            _t(spark, sf_dir, "supplier"),
            F.col("s_suppkey") == F.col("l_suppkey"),
            broadcast=True,
        )
        >> inner_join(
            _t(spark, sf_dir, "orders"), F.col("o_orderkey") == F.col("l_orderkey")
        )
        >> inner_join(
            _t(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
            broadcast=True,
        )
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        joined
        >> group_by(
            nation=F.col("n_name"), o_year=F.year("o_orderdate").cast("int")
        )
        >> aggregate(sum_profit=X.dsum(amount, 4))
    )


@q(
    "tpch_q10",
    f"""
    SELECT c_custkey, c_name, {X.sql_dsum(_DISC_PRICE_SQL, 4)} AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Returned-item-reporting shape (TPC-H Q10): one quarter of orders,
    # returned lines only, top-20 customers by lost revenue. The returnflag
    # and date filters push into both fact scans; top-20 fuses to
    # TakeOrderedAndProject.
    orders = _t(spark, sf_dir, "orders") >> sift(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem") >> sift(F.col("l_returnflag") == "R")
    return (
        orders
        >> inner_join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        >> inner_join(
            _t(spark, sf_dir, "customer"),
            F.col("c_custkey") == F.col("o_custkey"),
            broadcast=True,
        )
        >> inner_join(
            _t(spark, sf_dir, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
            broadcast=True,
        )
        >> group_by("c_custkey", "c_name", "c_acctbal", "n_name")
        >> aggregate(
            revenue=X.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
        )
        >> order_by(F.col("revenue").desc(), F.col("c_custkey").asc())
        >> limit(20)
        >> select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@q(
    "tpch_q13",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Customer-distribution shape (TPC-H Q13): two-level aggregation where
    # the LEFT join keeps zero-order customers (count(o_orderkey) counts
    # only non-null matches). First agg shuffles on custkey, second on the
    # tiny count domain.
    return (
        _t(spark, sf_dir, "customer")
        >> left_join(
            _t(spark, sf_dir, "orders")
            >> sift(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        >> group_by("c_custkey")
        >> aggregate(c_count=agg.count("o_orderkey"))
        >> group_by("c_count")
        >> aggregate(custdist=F.count(F.lit(1)))
    )


@q(
    "tpch_q15",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {X.sql_dsum(_DISC_PRICE_SQL, 4)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Top-supplier shape (TPC-H Q15): quarter revenue per supplier, keep the
    # max. The scalar subquery becomes a 1-row broadcast cross join against
    # the (already tiny, aggregated) revenue relation — lineitem is scanned
    # once; exact decimal sums make the `= max` comparison safe.
    revenue = (
        _t(spark, sf_dir, "lineitem")
        >> sift(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        >> group_by(supplier_no=F.col("l_suppkey"))
        >> aggregate(
            total_revenue=X.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
        )
    )
    top = revenue >> aggregate(max_rev=F.max("total_revenue"))
    return (
        revenue
        >> cross_join(F.broadcast(top))
        >> sift(F.col("total_revenue") == F.col("max_rev"))
        >> inner_join(
            _t(spark, sf_dir, "supplier"),
            F.col("s_suppkey") == F.col("supplier_no"),
            broadcast=True,
        )
        >> select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# TPC-H shapes, round 4 batch: q8 / q21 — the last fixture-expressible
# shapes (q2/q11/q16/q20 need the partsupp table, which the fixtures do not
# carry). q21's lateness predicate is adapted to the fixture schema:
# l_shipdate > o_orderdate + 60 days stands in for the missing
# l_receiptdate > l_commitdate.
# ---------------------------------------------------------------------------


_Q8_NATIONAL_SQL = "CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END"
_Q8_SHARE_SQL = X.sql_dround(
    f"({X.sql_dsum(_Q8_NATIONAL_SQL, 4)} / {X.sql_dsum('volume', 4)})", 6
)


@q(
    "tpch_q8",
    f"""
    SELECT o_year,
           {_Q8_SHARE_SQL} AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               ns.n_name AS nation
        FROM part
        JOIN lineitem  ON p_partkey = l_partkey
        JOIN supplier  ON s_suppkey = l_suppkey
        JOIN orders    ON l_orderkey = o_orderkey
        JOIN customer  ON o_custkey = c_custkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        JOIN region    ON nc.n_regionkey = r_regionkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
    ) all_nations
    GROUP BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    # National-market-share shape (TPC-H Q8): NATION_5's share of PROMO-part
    # revenue sold into ASIA, by order year. Every dim (part-filtered,
    # supplier, customer, both nation roles, region) broadcasts; the only
    # fact-fact shuffle is lineitem⋈orders on the order key. The share is a
    # ratio of two exact decimal sums divided in double — bit-identical on
    # both engines, so dround is safe.
    part = _t(spark, sf_dir, "part") >> sift(F.col("p_type") == "PROMO")
    nation = _t(spark, sf_dir, "nation")
    nc = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    ns = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    asia = _t(spark, sf_dir, "region") >> sift(F.col("r_name") == "ASIA")
    orders = _t(spark, sf_dir, "orders") >> sift(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    joined = (
        _t(spark, sf_dir, "lineitem")
        >> inner_join(part, F.col("p_partkey") == F.col("l_partkey"), broadcast=True)
        >> inner_join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        >> inner_join(
            _t(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
            broadcast=True,
        )
        >> inner_join(nc, F.col("c_nationkey") == F.col("c_nk"), broadcast=True)
        >> inner_join(
            asia, F.col("c_rk") == F.col("r_regionkey"), broadcast=True
        )
        >> inner_join(
            _t(spark, sf_dir, "supplier"),
            F.col("s_suppkey") == F.col("l_suppkey"),
            broadcast=True,
        )
        >> inner_join(ns, F.col("s_nationkey") == F.col("s_nk"), broadcast=True)
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    national = F.when(F.col("nation") == "NATION_5", volume).otherwise(F.lit(0.0))
    return (
        joined
        >> group_by(o_year=F.year("o_orderdate").cast("int"))
        >> aggregate(
            mkt_share=X.dround(X.dsum(national, 4) / X.dsum(volume, 4), 6)
        )
    )


@q(
    "tpch_q21",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders   ON o_orderkey = l1.l_orderkey
    WHERE n_name = 'NATION_3'
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Suppliers-who-kept-orders-waiting shape (TPC-H Q21, lateness adapted
    # to the fixture: shipped >60 days after the order date). The classic
    # decorrelation stress test: one EXISTS → hash LeftSemi, one NOT EXISTS
    # → hash LeftAnti, both on the order key — never a per-row subquery.
    # l3's lateness reuses l1's o_orderdate (same order), so orders joins
    # once; supplier + nation broadcast; top-10 fuses to TakeOrdered.
    li = _t(spark, sf_dir, "lineitem")
    nation3 = _t(spark, sf_dir, "nation") >> sift(F.col("n_name") == "NATION_3")
    orders_f = _t(spark, sf_dir, "orders") >> sift(
        F.col("o_orderstatus") == "F"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    l1 = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        >> inner_join(
            orders_f.select("o_orderkey", "o_orderdate"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        >> sift(late)
        >> inner_join(
            _t(spark, sf_dir, "supplier"),
            F.col("s_suppkey") == F.col("l_suppkey"),
            broadcast=True,
        )
        >> inner_join(
            nation3, F.col("s_nationkey") == F.col("n_nationkey"), broadcast=True
        )
    )
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("ok3"),
        F.col("l_suppkey").alias("sk3"),
        F.col("l_shipdate").alias("sd3"),
    )
    waited = (
        l1
        >> semi_join(
            l2,
            (F.col("ok2") == F.col("l_orderkey"))
            & (F.col("sk2") != F.col("l_suppkey")),
        )
        >> anti_join(
            l3,
            (F.col("ok3") == F.col("l_orderkey"))
            & (F.col("sk3") != F.col("l_suppkey"))
            & (
                F.col("sd3")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ),
        )
    )
    return (
        waited
        >> group_by("s_name")
        >> aggregate(numwait=F.count(F.lit(1)))
        >> order_by(F.col("numwait").desc(), "s_name")
        >> limit(10)
    )


# ---------------------------------------------------------------------------
# TPC-H shapes, round 4 second batch: q2 / q11 / q16 / q20 over a DERIVED
# partsupp. The fixtures carry no partsupp table, so both engines derive the
# identical relation from lineitem — per (partkey, suppkey):
# ps_supplycost = min(extendedprice/quantity) (same IEEE divide + exact min
# on both engines), ps_availqty = exact decimal sum of quantities. With it,
# every one of the 22 TPC-H query shapes exists in the inventory.
# ---------------------------------------------------------------------------

_PARTSUPP_SQL = f"""
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               min(l_extendedprice / l_quantity) AS ps_supplycost,
               {X.sql_dsum('l_quantity', 2)} AS ps_availqty
        FROM lineitem GROUP BY 1, 2
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        >> group_by(
            ps_partkey=F.col("l_partkey"), ps_suppkey=F.col("l_suppkey")
        )
        >> aggregate(
            ps_supplycost=F.min(
                F.col("l_extendedprice") / F.col("l_quantity")
            ),
            ps_availqty=X.dsum(F.col("l_quantity"), 2),
        )
    )


@q(
    "tpch_q2",
    f"""
    WITH partsupp AS ({_PARTSUPP_SQL}),
    eu AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    costs AS (
        SELECT p_partkey, p_brand, s_name, s_acctbal, n_name, ps_supplycost,
               min(ps_supplycost) OVER (PARTITION BY p_partkey) AS min_cost
        FROM part
        JOIN partsupp ON p_partkey = ps_partkey
        JOIN eu       ON s_suppkey = ps_suppkey
        WHERE p_size = 15 AND p_type = 'PROMO'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
    FROM costs WHERE ps_supplycost = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Minimum-cost-supplier shape (TPC-H Q2): the correlated scalar
    # subquery (min cost per part among region suppliers) becomes a window
    # min over the already-joined relation — ONE pass over derived
    # partsupp, no re-scan, no per-row subquery. part + supplier/nation/
    # region broadcast; top-100 fuses to TakeOrdered.
    part = _t(spark, sf_dir, "part") >> sift(
        (F.col("p_size") == 15) & (F.col("p_type") == "PROMO")
    )
    eu = (
        _t(spark, sf_dir, "supplier")
        >> inner_join(
            _t(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
            broadcast=True,
        )
        >> inner_join(
            _t(spark, sf_dir, "region") >> sift(F.col("r_name") == "EUROPE"),
            F.col("n_regionkey") == F.col("r_regionkey"),
            broadcast=True,
        )
        >> select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = (
        _partsupp(spark, sf_dir)
        >> inner_join(part, F.col("p_partkey") == F.col("ps_partkey"), broadcast=True)
        >> inner_join(eu, F.col("s_suppkey") == F.col("ps_suppkey"), broadcast=True)
        >> mutate(
            min_cost=F.min("ps_supplycost").over(
                partition_window("p_partkey")
            )
        )
    )
    return (
        costs
        >> sift(F.col("ps_supplycost") == F.col("min_cost"))
        >> select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
        >> order_by(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        >> limit(100)
    )


@q(
    "tpch_q11",
    f"""
    WITH partsupp AS ({_PARTSUPP_SQL}),
    nat AS (
        SELECT ps_partkey, ps_supplycost * ps_availqty AS v
        FROM partsupp
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
    ),
    tot AS (SELECT {X.sql_dsum('v', 2)} AS total FROM nat)
    SELECT ps_partkey, {X.sql_dsum('v', 2)} AS value
    FROM nat CROSS JOIN tot
    GROUP BY ps_partkey, tot.total
    HAVING {X.sql_dsum('v', 2)} > 0.001 * tot.total
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Important-stock shape (TPC-H Q11): per-part inventory value for one
    # nation's suppliers, kept when above a fraction of the nation total.
    # The scalar subquery (total) is a 1-row broadcast cross join (the q15
    # idiom); both the per-part and total values are exact decimal sums, so
    # the HAVING comparison is bit-identical cross-engine. One groupBy of
    # the derived partsupp — the nation filter rides broadcast joins.
    nat = (
        _partsupp(spark, sf_dir)
        >> inner_join(
            _t(spark, sf_dir, "supplier"),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            broadcast=True,
        )
        >> inner_join(
            _t(spark, sf_dir, "nation") >> sift(F.col("n_name") == "NATION_7"),
            F.col("s_nationkey") == F.col("n_nationkey"),
            broadcast=True,
        )
        >> select(
            "ps_partkey", v=F.col("ps_supplycost") * F.col("ps_availqty")
        )
    )
    tot = nat >> aggregate(total=X.dsum(F.col("v"), 2))
    return (
        nat
        >> group_by("ps_partkey")
        >> aggregate(value=X.dsum(F.col("v"), 2))
        >> cross_join(F.broadcast(tot))
        # Decimal literal, not F.lit(0.001) (a double): the oracle's
        # `0.001 * total` is exact decimal multiplication, so a value
        # landing exactly on the threshold must not route through double
        # arithmetic on this side only.
        >> sift(
            F.col("value")
            > F.expr("CAST(0.001 AS DECIMAL(4,3))") * F.col("total")
        )
        >> select("ps_partkey", "value")
    )


@q(
    "tpch_q16",
    f"""
    WITH partsupp AS ({_PARTSUPP_SQL})
    SELECT p_brand, p_type, p_size,
           count(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'BRAND_1' AND p_type <> 'PROMO'
      AND ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Parts/supplier-relationship shape (TPC-H Q16): NOT IN over an
    # excluded-supplier set (negative balances stand in for the original's
    # complaints-comment filter) planned as a broadcast LeftAnti, then a
    # distinct-count per (brand, type, size). The brand/type predicates
    # push into the part scan before it broadcasts.
    part = _t(spark, sf_dir, "part") >> sift(
        (F.col("p_brand") != "BRAND_1") & (F.col("p_type") != "PROMO")
    )
    excluded = _t(spark, sf_dir, "supplier") >> sift(F.col("s_acctbal") < 0)
    return (
        _partsupp(spark, sf_dir)
        >> inner_join(part, F.col("p_partkey") == F.col("ps_partkey"), broadcast=True)
        >> anti_join(
            excluded.select("s_suppkey"),
            F.col("s_suppkey") == F.col("ps_suppkey"),
            broadcast=True,
        )
        >> group_by("p_brand", "p_type", "p_size")
        >> aggregate(
            supplier_cnt=F.countDistinct("ps_suppkey").cast("long")
        )
    )


@q(
    "tpch_q20",
    f"""
    WITH partsupp AS ({_PARTSUPP_SQL}),
    shipped AS (
        SELECT l_partkey, l_suppkey,
               {X.sql_dsum('l_quantity', 2)} AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY 1, 2
    ),
    surplus AS (
        SELECT DISTINCT ps_suppkey
        FROM partsupp
        JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        WHERE ps_partkey IN (
                  SELECT p_partkey FROM part WHERE p_name LIKE 'large%'
              )
          AND ps_availqty > 0.5 * qty
    )
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1'
      AND s_suppkey IN (SELECT ps_suppkey FROM surplus)
    ORDER BY s_name
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Excess-stock shape (TPC-H Q20): the nested IN (parts by name) +
    # per-(part, supplier) scalar threshold (half the year's shipped
    # quantity) decorrelates to: broadcast-semi partsupp against the name-
    # filtered parts, equi-join the per-pair shipped aggregate, compare,
    # then semi-join suppliers against the surviving supplier set. Both
    # sides of the availqty > 0.5*qty comparison are exact decimal sums, so
    # the cut is bit-identical cross-engine.
    li = _t(spark, sf_dir, "lineitem")
    shipped = (
        li
        >> sift(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        >> group_by("l_partkey", "l_suppkey")
        >> aggregate(qty=X.dsum(F.col("l_quantity"), 2))
    )
    named_parts = (
        _t(spark, sf_dir, "part")
        >> sift(F.col("p_name").like("large%"))
        >> select("p_partkey")
    )
    surplus = (
        _partsupp(spark, sf_dir)
        >> semi_join(
            named_parts, F.col("p_partkey") == F.col("ps_partkey"), broadcast=True
        )
        >> inner_join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        >> sift(F.col("ps_availqty") > F.lit(0.5) * F.col("qty"))
        >> select("ps_suppkey")
        >> distinct()
    )
    return (
        _t(spark, sf_dir, "supplier")
        >> inner_join(
            _t(spark, sf_dir, "nation") >> sift(F.col("n_name") == "NATION_1"),
            F.col("s_nationkey") == F.col("n_nationkey"),
            broadcast=True,
        )
        >> semi_join(surplus, F.col("ps_suppkey") == F.col("s_suppkey"))
        >> select("s_name", "s_acctbal")
        >> order_by("s_name")
    )
