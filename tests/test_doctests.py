"""Doctest runner: executable examples in public-API docstrings, with a
live SparkSession and sample relation injected — the reference enforces
doctests on every public api function (`pyproject.toml:49-55`,
`--doctest-modules`); this is the engine's equivalent."""

from __future__ import annotations

import doctest

from pyspark.sql import functions as F

import stupidb_spark.verbs as verbs_mod


def test_verbs_doctests(spark):
    people = spark.createDataFrame(
        [("alice", 2), ("bob", -1), ("eve", 4)], "name string, balance long"
    )
    results = doctest.testmod(
        verbs_mod,
        extraglobs={"spark": spark, "F": F, "people": people,
                    "order_by": verbs_mod.order_by,
                    "group_by": verbs_mod.group_by,
                    "aggregate": verbs_mod.aggregate},
        verbose=False,
    )
    assert results.failed == 0, f"{results.failed} doctest failures"
    assert results.attempted >= 6
