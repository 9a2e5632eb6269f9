"""Connected-components laws: transitivity, isolation, orientation- and
partitioning-independence, long-chain convergence."""

from __future__ import annotations

from pyspark.sql import functions as F

from stupidb_spark.operators.components import connected_components


def _labels(df):
    return {r.node: r.component for r in df.collect()}


def test_transitive_chain(spark):
    # a-b, b-c, c-d: one component labeled by the min id, in any orientation
    e = spark.createDataFrame([(2, 1), (3, 2), (3, 4)], "src long, dst long")
    assert _labels(connected_components(e)) == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disjoint_clusters_and_singletons(spark):
    e = spark.createDataFrame([(1, 2), (8, 9)], "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(1, 11)], "doc_id long")
    out = _labels(connected_components(e, nodes=nodes))
    assert out[1] == out[2] == 1
    assert out[8] == out[9] == 8
    for iso in (3, 4, 5, 6, 7, 10):
        assert out[iso] == iso


def test_long_chain_converges(spark):
    # path graph 0-1-2-...-19: worst-case diameter for label propagation
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(19)], "src long, dst long"
    )
    out = _labels(connected_components(e))
    assert set(out.values()) == {0}
    assert len(out) == 20


def test_partitioning_independent(spark):
    # same edges, adversarial repartitioning: labels must not change
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (12, 11), (20, 3)], "src long, dst long"
    )
    base = _labels(connected_components(e))
    shuffled = _labels(connected_components(e.repartition(7, F.col("dst"))))
    assert base == shuffled == {1: 1, 2: 1, 3: 1, 20: 1, 10: 10, 11: 10, 12: 10}
