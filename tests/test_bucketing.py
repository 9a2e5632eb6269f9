"""Bucketed-table plan tests: an equi-join between two tables bucketed on
the join key must plan with NO shuffle exchange — the property that makes
bucketing worth the write-time cost at scale."""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from stupidb_spark.plans import formatted_plan
from stupidb_spark.sources import load_table
from stupidb_spark.sources.bucketing import read_table, write_bucketed
from tests.conftest import SF_DIR

SCRATCH = Path("/root/repo/.scratch")


@pytest.fixture()
def bucketed_pair(spark):
    tag = uuid.uuid4().hex[:8]
    t_orders, t_cust = f"b_orders_{tag}", f"b_cust_{tag}"
    paths = [SCRATCH / t_orders, SCRATCH / t_cust]
    write_bucketed(
        load_table(spark, SF_DIR, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
        t_orders,
        bucket_by=["o_custkey"],
        n_buckets=8,
        sort_by=["o_custkey"],
        path=str(paths[0]),
    )
    write_bucketed(
        load_table(spark, SF_DIR, "customer").select(
            F.col("c_custkey").alias("o_custkey"), "c_name"
        ),
        t_cust,
        bucket_by=["o_custkey"],
        n_buckets=8,
        sort_by=["o_custkey"],
        path=str(paths[1]),
    )
    yield t_orders, t_cust
    for t in (t_orders, t_cust):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    for p in paths:
        shutil.rmtree(p, ignore_errors=True)


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    t_orders, t_cust = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the join strategy under test is SMJ
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = read_table(spark, t_orders).join(read_table(spark, t_cust), "o_custkey")
        plan = formatted_plan(joined)
        assert "Exchange" not in plan, plan
        # result is still correct
        expected = (
            load_table(spark, SF_DIR, "orders")
            .join(
                load_table(spark, SF_DIR, "customer").select(
                    F.col("c_custkey").alias("o_custkey")
                ),
                "o_custkey",
            )
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_pair):
    t_orders, _ = bucketed_pair
    agg = read_table(spark, t_orders).groupBy("o_custkey").agg(F.sum("o_totalprice"))
    assert "Exchange" not in formatted_plan(agg)
