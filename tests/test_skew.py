"""Salted operators must be result-identical to their unsalted forms —
salting changes placement, never values."""

from __future__ import annotations

from pyspark.sql import functions as F

from stupidb_spark.functions import exact as X
from stupidb_spark.operators.skew import replicate_join, salted_aggregate, with_salt
from stupidb_spark.sources import load_table
from tests.conftest import SF_DIR


def test_salted_aggregate_matches_plain(spark):
    orders = load_table(spark, SF_DIR, "orders")
    plain = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"),
        X.usum("o_totalprice", 2).alias("s"),
    )
    salted = salted_aggregate(
        orders.select("o_custkey", "o_totalprice"),
        ["o_custkey"],
        partial_aggs={"n": F.count(F.lit(1)), "s": X.usum("o_totalprice", 2)},
        merge_aggs={"n": F.sum("n"), "s": F.sum("s")},
        n_salts=16,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_replicate_join_matches_plain(spark):
    orders = load_table(spark, SF_DIR, "orders").select("o_custkey", "o_orderkey")
    customer = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = orders.join(customer, ["o_custkey"])
    salted = replicate_join(orders, customer, ["o_custkey"], n_salts=4)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salt_range(spark):
    orders = load_table(spark, SF_DIR, "orders")
    s = with_salt(orders, 8)
    out = s.agg(F.min("__salt"), F.max("__salt"), F.countDistinct("__salt")).collect()[0]
    assert out[0] >= 0 and out[1] <= 7 and out[2] >= 2


def test_rowid_salt_spreads_identical_duplicates(spark):
    """Content hashing puts byte-identical rows on ONE salt (the motivating
    hot-template case); rowid salting must spread them."""
    dupes = spark.createDataFrame([("k", "same-payload")] * 1000, "key string, v string")
    content = with_salt(dupes, 8, method="content")
    assert content.select(F.countDistinct("__salt")).collect()[0][0] == 1
    rowid = with_salt(dupes, 8, method="rowid")
    assert rowid.select(F.countDistinct("__salt")).collect()[0][0] >= 4
    # results identical either way
    plain = dupes.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    salted = salted_aggregate(
        dupes, ["key"],
        partial_aggs={"n": F.count(F.lit(1))},
        merge_aggs={"n": F.sum("n")},
        n_salts=8, salt_method="rowid",
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
