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


def test_star_components_match_propagation_on_random_graphs(spark):
    """Differential: the O(log n)-round star contraction must produce
    exactly the min-label propagation's components on random graphs
    (including self-loops, duplicate edges, both orientations)."""
    import random

    from stupidb_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(13)
    for _ in range(5):
        n = rng.randint(2, 40)
        rows = [
            (rng.randint(0, n), rng.randint(0, n))
            for _ in range(rng.randint(1, 60))
        ]
        e = spark.createDataFrame(rows, "src long, dst long")
        # three engines, one answer: driver union-find (the default at
        # this size), min-label propagation (fast path disabled), star
        a = sorted(map(tuple, connected_components(e).collect()))
        p = sorted(
            map(
                tuple,
                connected_components(e, driver_max_edge_rows=0).collect(),
            )
        )
        b = sorted(map(tuple, connected_components_star(e).collect()))
        assert a == b == p, rows


def test_star_components_collapse_long_chain(spark):
    """A 64-node path graph (diameter 63) must fully resolve well inside
    the iteration cap — the case star contraction exists for."""
    from stupidb_spark.operators.components import connected_components_star

    e = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "src long, dst long"
    )
    out = connected_components_star(e, max_iterations=10).collect()
    assert len(out) == 64
    assert {r.component for r in out} == {0}


def test_default_entry_escalates_to_star_on_long_path(spark):
    """Adversarial-graph safety through the DEFAULT entry point: a 64-node
    path graph (diameter 63, far past the 5-round propagation budget) must
    fully resolve — the auto-fallback to star contraction, not a return of
    half-propagated labels."""
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "src long, dst long"
    )
    # driver_max_edge_rows=0: force the distributed engines so the test
    # still exercises propagation -> star escalation
    out = _labels(connected_components(e, driver_max_edge_rows=0))
    assert len(out) == 64
    assert set(out.values()) == {0}


def test_escalation_preserves_isolated_nodes(spark):
    # the nodes= contract must survive the engine switch
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    out = _labels(connected_components(e, nodes=nodes, driver_max_edge_rows=0))
    assert len(out) == 40
    for i in range(31):
        assert out[i] == 0
    for iso in range(31, 40):
        assert out[iso] == iso


def test_real_dedup_graph_never_escalates(spark, monkeypatch):
    # dup-cluster graphs (small, dense) must converge inside the 5-round
    # propagation budget — the star fallback exists for adversarial chains
    # only, so the gate query's plan cost is unchanged by the auto-select.
    # DRIVER_MAX_EDGE_ROWS=0 pins the PROPAGATION engine (the fixture
    # graph is far under the driver fast-path bound otherwise).
    import stupidb_spark.operators.components as C
    from stupidb_spark.queryset import QUERIES
    from tests.conftest import SF_DIR

    def _boom(*a, **kw):  # pragma: no cover
        raise AssertionError("star fallback fired on a dedup-shaped graph")

    monkeypatch.setattr(C, "connected_components_star", _boom)
    monkeypatch.setattr(C, "DRIVER_MAX_EDGE_ROWS", 0)
    assert QUERIES["dedup_components"](spark, SF_DIR).count() > 0


def test_components_lsh_matches_exact_components(spark):
    # the sub-quadratic pairs→clusters path (MinHash-LSH candidates) must
    # produce IDENTICAL cluster labels to the exact-jaccard path at fixture
    # scale, where LSH recall is 1.0 (pinned separately in test_dedup.py):
    # identical pair sets ⇒ identical transitive closure
    from stupidb_spark.queryset import QUERIES
    from tests.conftest import SF_DIR

    exact = sorted(map(tuple, QUERIES["dedup_components"](spark, SF_DIR).collect()))
    lsh = sorted(map(tuple, QUERIES["dedup_components_lsh"](spark, SF_DIR).collect()))
    assert exact == lsh


def test_reliable_checkpoint_mode_parity(spark, monkeypatch, tmp_path):
    """SPARK_GRAFT_CHECKPOINT_DIR switches every lineage cut from
    localCheckpoint to a reliable checkpoint(); results must be identical
    in both modes, the checkpoint dir must actually receive files, and the
    knob must not leak into later local-mode calls."""
    import os

    from stupidb_spark.operators.components import connected_components_star
    from stupidb_spark.operators.knn import knn_join
    from stupidb_spark.sources import load_table
    from tests.conftest import SF_DIR

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)] + [(1, 2), (5, 6), (30, 0)],
        "src long, dst long",
    )
    emb = load_table(spark, SF_DIR, "embeddings")

    def snap():
        comp = sorted(
            map(tuple, connected_components(edges).collect())
        )
        star = sorted(
            map(tuple, connected_components_star(edges).collect())
        )
        knn = sorted(
            map(tuple, knn_join(emb, k_neighbors=3, n_probe=8).collect())
        )
        return comp, star, knn

    local = snap()
    ckdir = str(tmp_path / "ck")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", ckdir)
    durable = snap()
    assert durable == local
    # the reliable path was actually taken: checkpoint files exist
    found = [
        os.path.join(r, f)
        for r, _, fs in os.walk(ckdir)
        for f in fs
    ]
    assert found, "no checkpoint files written under SPARK_GRAFT_CHECKPOINT_DIR"
    monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_DIR")
    assert snap() == local


def test_checkpoint_dir_installed_once_per_context(spark, monkeypatch, tmp_path):
    """cut_lineage installs the checkpoint root ONCE per context: repeated
    cuts must not mint a fresh UUID root each call (getCheckpointDir returns
    a scheme-qualified URI, so a naive prefix test reinstalls every time and
    churns never-cleaned checkpoint data across iterative loops)."""
    import os

    from stupidb_spark.operators.lineage import cut_lineage

    ckdir = str(tmp_path / "ckonce")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", ckdir)
    df = spark.range(10)
    cut_lineage(df).count()
    roots_after_one = set(os.listdir(ckdir))
    assert len(roots_after_one) == 1, "first cut installs exactly one root"
    cut_lineage(df).count()
    cut_lineage(df.withColumn("y", df.id * 2)).count()
    assert set(os.listdir(ckdir)) == roots_after_one, (
        "later cuts reused the installed root instead of minting new ones"
    )


def test_already_installed_compares_scheme_and_netloc():
    """The fallback root comparison must match on (scheme, netloc, parent
    path), not path alone: a context checkpointing to hdfs://nn/ck/<uuid>
    is NOT installed for a configured local /ck — skipping setCheckpointDir
    there would leave checkpoints on the wrong filesystem. Empty scheme
    means the local filesystem, so it normalizes to 'file'."""
    from stupidb_spark.operators.lineage import _already_installed

    class FakeSC:
        def __init__(self, current):
            self.applicationId = "app-fake-uri-compare"
            self._current = current

        def getCheckpointDir(self):
            return self._current

    # same path, different filesystem: NOT installed (both directions)
    assert not _already_installed(FakeSC("hdfs://nn/ck/uuid-1"), "/ck")
    assert not _already_installed(FakeSC("file:/ck/uuid-1"), "hdfs://nn/ck")
    # different netloc on the same scheme: NOT installed
    assert not _already_installed(
        FakeSC("hdfs://nn-a/ck/uuid-1"), "hdfs://nn-b/ck"
    )
    # matching scheme+netloc+parent: installed, however the local root is
    # spelled (bare path, file:, or file://)
    assert _already_installed(FakeSC("file:/ck/uuid-1"), "/ck")
    assert _already_installed(FakeSC("file:/ck/uuid-1"), "file:///ck")
    assert _already_installed(
        FakeSC("hdfs://nn/ck/uuid-1"), "hdfs://nn/ck/"
    )


def test_cut_lineage_sets_ancestor_truncation_property(spark):
    """Contract (round 11): cut_lineage must set the job-local
    spark.checkpoint.checkpointAllMarkedAncestors property on the driver
    thread. Without it, a round that chains several LAZY cuts and runs its
    one action on a derived frame truncates only the first checkpointed
    ancestor doCheckpoint meets; the inner cuts keep their dependency
    chains and RDD lineage grows with rounds — measured on BPE training at
    the 200k-word probe corpus as ~8 toDebugString lines/round, ending in
    a JVM StackOverflowError during plan serialization at ~100+ rounds
    (scripts/bpe_scale_probe.py deep32k reproduces; with the property the
    same run holds flat). The growth needs corpus-scale plans, so the unit
    test pins the mechanism, and the probe pins the behavior."""
    from pyspark.sql import functions as F

    from stupidb_spark.operators.lineage import cut_lineage

    sc = spark.sparkContext
    key = "spark.checkpoint.checkpointAllMarkedAncestors"
    sc.setLocalProperty(key, None)
    assert sc.getLocalProperty(key) is None
    d = cut_lineage(
        spark.range(10).toDF("x").select((F.col("x") + 1).alias("x")),
        eager=False,
    )
    assert sc.getLocalProperty(key) == "true"
    assert d.count() == 10
