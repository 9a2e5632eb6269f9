"""Doctest runner: executable examples in public-API docstrings, with a
live SparkSession and sample relation injected — the reference enforces
doctests on every public api function (`pyproject.toml:49-55`,
`--doctest-modules`); this is the engine's equivalent."""

from __future__ import annotations

import doctest

from pyspark.sql import functions as F
from pyspark.sql.window import Window

import stupidb_spark.functions.navigation as nav_mod
import stupidb_spark.functions.ranking as rank_mod
import stupidb_spark.operators.chunking as chunk_mod
import stupidb_spark.operators.components as comp_mod
import stupidb_spark.operators.coreset as coreset_mod
import stupidb_spark.operators.dedup as dedup_mod
import stupidb_spark.operators.ordering as order_mod
import stupidb_spark.operators.packing as pack_mod
import stupidb_spark.operators.similarity as sim_mod
import stupidb_spark.operators.skew as skew_mod
import stupidb_spark.operators.splits as splits_mod
import stupidb_spark.verbs as verbs_mod
import stupidb_spark.window as window_mod


def _run(mod, extraglobs, min_attempted):
    results = doctest.testmod(mod, extraglobs=extraglobs, verbose=False)
    assert results.failed == 0, f"{mod.__name__}: {results.failed} doctest failures"
    assert results.attempted >= min_attempted, mod.__name__


def _ticks(spark):
    return spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0), ("b", 1, 5.0), ("b", 2, 7.0)],
        "grp string, t long, x double",
    )


def test_verbs_doctests(spark):
    people = spark.createDataFrame(
        [("alice", 2), ("bob", -1), ("eve", 4)], "name string, balance long"
    )
    _run(
        verbs_mod,
        {"spark": spark, "F": F, "people": people,
         "order_by": verbs_mod.order_by,
         "group_by": verbs_mod.group_by,
         "aggregate": verbs_mod.aggregate},
        6,
    )


def test_window_doctests(spark):
    _run(window_mod, {"spark": spark, "F": F, "ticks": _ticks(spark)}, 4)


def test_ranking_doctests(spark):
    scores = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 20), (4, 30)], "sid long, score long"
    )
    _run(
        rank_mod,
        {
            "spark": spark,
            "F": F,
            "scores": scores,
            "w_score": Window.orderBy("score", "sid"),
            "w_ties": Window.orderBy("score"),
        },
        6,
    )


def test_navigation_doctests(spark):
    series = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "t long, x double"
    )
    _run(
        nav_mod,
        {
            "spark": spark,
            "F": F,
            "Window": Window,
            "series": series,
            "w_series": Window.orderBy("t"),
        },
        4,
    )


def test_operator_doctests(spark):
    dup_docs = spark.createDataFrame(
        [(1, "Hello World"), (2, "hello world"), (3, "something else")],
        "id long, txt string",
    )
    vecs = spark.createDataFrame(
        [([1.0, 2.0], [3.0, 4.0])], "a array<double>, b array<double>"
    )
    seqs = spark.createDataFrame(
        [(1, 60), (2, 50), (3, 40), (4, 70)], "id long, n long"
    )
    _run(dedup_mod, {"spark": spark, "F": F, "dup_docs": dup_docs}, 1)
    _run(sim_mod, {"spark": spark, "F": F, "vecs": vecs}, 2)
    _run(skew_mod, {"spark": spark, "F": F, "ticks": _ticks(spark)}, 1)
    _run(pack_mod, {"spark": spark, "F": F, "seqs": seqs}, 2)
    _run(chunk_mod, {"spark": spark, "F": F}, 1)
    _run(order_mod, {"spark": spark, "F": F}, 1)
    _run(comp_mod, {"spark": spark, "F": F}, 1)
    _run(coreset_mod, {"spark": spark, "F": F}, 1)
    _run(splits_mod, {"spark": spark, "F": F}, 1)
