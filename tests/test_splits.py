"""Leakage-safe grouped splitting (operators/splits.py): the cohesion law,
determinism under repartitioning, fraction calibration, and the
registered portable-hash twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stupidb_spark.operators.splits import leakproof_split, split_column
from stupidb_spark.queryset import QUERIES
from tests.conftest import SF_DIR

FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}


@pytest.fixture(scope="module")
def domains(spark):
    return spark.createDataFrame(
        [(i, f"dom{i % 97}") for i in range(2000)], "id long, domain string"
    )


def test_groups_never_straddle_splits(domains):
    out = leakproof_split(domains, "domain", FRACS)
    straddlers = (
        out.groupBy("domain")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
    )
    assert straddlers.count() == 0


def test_split_deterministic_under_partitioning(domains):
    a = sorted(map(tuple, leakproof_split(domains, "domain", FRACS).collect()))
    b = sorted(
        map(
            tuple,
            leakproof_split(
                domains.repartition(13, "id"), "domain", FRACS
            ).collect(),
        )
    )
    assert a == b


def test_fractions_calibrate_on_many_groups(spark):
    # 10k singleton groups: empirical split fractions converge to the
    # configured ones (hash uniformity), within a loose tolerance
    d = spark.createDataFrame(
        [(i, f"g{i}") for i in range(10_000)], "id long, g string"
    )
    counts = dict(
        leakproof_split(d, "g", FRACS)
        .groupBy("split")
        .count()
        .rdd.map(lambda r: (r["split"], r["count"]))
        .collect()
    )
    assert abs(counts["train"] / 10_000 - 0.8) < 0.03
    assert abs(counts["val"] / 10_000 - 0.1) < 0.02
    assert abs(counts["test"] / 10_000 - 0.1) < 0.02


def test_salt_redeals_the_assignment(domains):
    base = leakproof_split(domains, "domain", FRACS)
    redeal = leakproof_split(domains, "domain", FRACS, salt=1)
    joined = base.alias("a").join(
        redeal.alias("b"), F.col("a.id") == F.col("b.id")
    )
    moved = joined.filter(F.col("a.split") != F.col("b.split")).count()
    assert moved > 0  # a new salt is a new deal...
    out = redeal.groupBy("domain").agg(F.countDistinct("split").alias("k"))
    assert out.filter(F.col("k") > 1).count() == 0  # ...same cohesion law


def test_bad_fractions_raise():
    with pytest.raises(ValueError, match="sum to 1.0"):
        split_column("g", {"train": 0.5, "val": 0.1})


def test_registered_twin_matches_operator_cohesion(spark):
    # the oracled portable-hash query obeys the same law the operator does
    out = QUERIES["sample_split_leakproof"](spark, SF_DIR)
    k = out.groupBy("source").agg(F.countDistinct("split").alias("k"))
    assert k.filter(F.col("k") > 1).count() == 0
