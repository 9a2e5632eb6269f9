"""Similarity-search validation: LSH recall against the exact brute-force
ground truth, ordering invariants, and near-dup blocking correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from stupidb_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    lsh_topk,
)
from stupidb_spark.sources import load_table
from tests.conftest import SF_DIR


def _emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def test_lsh_recall_vs_brute_force(spark):
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 5)
    bf = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=10).collect()
    }
    lsh = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk(emb, queries, k=10).collect()
    }
    recall = len(bf & lsh) / len(bf)
    # deterministic (seeded planes, fixed data): measured 1.0 at 16 tables ×
    # 4 planes on the fixtures; bound left slack for fixture regeneration
    assert recall >= 0.9, f"LSH recall {recall} below bound"


def test_topk_is_ranked_and_bounded(spark):
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 5)
    out = brute_force_topk(emb, queries, k=10)
    per_q = out.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("rk").alias("max_rk")
    )
    assert per_q.filter((F.col("n") > 10) | (F.col("max_rk") > 10)).count() == 0
    # rank 1 has the max similarity within each query group
    w_best = out.groupBy("query_id").agg(F.max("cosine_sim").alias("best"))
    top1 = out.filter(F.col("rk") == 1).join(w_best, "query_id")
    assert top1.filter(F.col("cosine_sim") != F.col("best")).count() == 0


def test_cosine_self_similarity(spark):
    emb = _emb(spark).limit(50)
    out = emb.select(cosine(F.col("embedding"), F.col("embedding")).alias("c"))
    assert out.filter(F.abs(F.col("c") - 1.0) > 1e-9).count() == 0


def test_ivf_recall_vs_brute_force(spark):
    from stupidb_spark.operators.ivf import ivf_topk

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 5)
    bf = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=10).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, queries, k=10).collect()
    }
    recall = len(bf & ivf) / len(bf)
    # deterministic (lowest-id seeds, fixed iterations): measured 0.92 at
    # n_probe=6/16 cells on the fixtures
    assert recall >= 0.8, f"IVF recall {recall} below bound"


def test_ivf_index_save_load_prunes(spark):
    """A persisted (cell-partitioned) index probes to identical results,
    and the probe's static cell filter scans ONLY probed partitions."""
    import shutil
    import uuid

    from stupidb_spark.operators.ivf import (
        _probe_cells,
        build_ivf_index,
        ivf_probe,
        load_ivf_index,
        save_ivf_index,
    )
    from stupidb_spark.operators.similarity import collect_query_matrix

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 5)
    path = f"/root/repo/.scratch/ivf-{uuid.uuid4().hex[:8]}"
    try:
        idx = build_ivf_index(emb)
        save_ivf_index(idx, path)
        loaded = load_ivf_index(spark, path)
        mem = sorted(
            map(tuple, ivf_probe(idx.indexed, idx.centroids, queries).collect())
        )
        dur = sorted(
            map(tuple, ivf_probe(loaded.indexed, loaded.centroids, queries).collect())
        )
        assert mem == dur
        # pruning: the probe's cell filter reads only probed partitions
        _, Q = collect_query_matrix(queries, "vec_id", "embedding")
        probed = sorted(
            {int(c) for row in _probe_cells(Q, loaded.centroids, 6) for c in row}
        )
        from stupidb_spark.plans import formatted_plan

        pruned = loaded.indexed.filter(F.col("cell").isin(probed))
        plan = formatted_plan(pruned)
        # the cell predicate must land in PartitionFilters (pruned at plan
        # time), not PushedFilters/post-scan Filter
        pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
        assert pf and "cell" in pf[0], f"no partition filter on cell:\n{plan}"
        # and some cells must actually be excluded on disk
        n_cells_on_disk = len(
            {f.split("cell=")[1].split("/")[0] for f in loaded.indexed.inputFiles()}
        )
        assert len(probed) < n_cells_on_disk
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_ivf_probe_collects_queries_once(spark, monkeypatch):
    """The probe path must run exactly ONE Spark job over the query side:
    a single collect_query_matrix shared by cell selection and the scorer
    (r2 regression: ivf_probe + query_lookup_cosine each collected)."""
    from stupidb_spark.operators import ivf as ivf_mod
    from stupidb_spark.operators import similarity as sim_mod
    from stupidb_spark.sources import load_table
    from tests.conftest import SF_DIR

    calls = {"n": 0}
    real = sim_mod.collect_query_matrix

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(ivf_mod, "collect_query_matrix", counting)
    monkeypatch.setattr(sim_mod, "collect_query_matrix", counting)

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    idx = ivf_mod.build_ivf_index(emb, n_centroids=8, cache_key=None)
    calls["n"] = 0
    out = ivf_mod.ivf_probe(idx.indexed, idx.centroids, queries, k=5, n_probe=4)
    assert out.count() > 0
    assert calls["n"] == 1


def test_pq_recall_and_compression(spark):
    """PQ ADC ranking must (a) reproduce a decent fraction of the exact
    top-k (recall floor), (b) encode deterministically, and (c) actually
    compress: m int codes per vector versus dim floats."""
    from stupidb_spark.operators.pq import pq_encode, pq_topk, pq_train
    from stupidb_spark.operators.similarity import brute_force_topk
    from stupidb_spark.sources import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)

    books = pq_train(emb, m=16, k=256)
    assert books.shape == (16, 256, 4)  # 64-dim fixture → 16 subspaces of 4
    codes = pq_encode(emb, books)
    row = codes.first()
    assert len(row.code) == 16 and all(0 <= c < 256 for c in row.code)
    # deterministic: same codebooks, same codes
    again = pq_encode(emb, books)
    assert codes.orderBy("neighbor_id").collect() == again.orderBy(
        "neighbor_id"
    ).collect()

    exact = brute_force_topk(emb, queries, k=10)
    approx = pq_topk(codes, books, queries, k=10)
    truth = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    got = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.7, f"PQ recall@10 {recall:.2f} below floor"


def test_ivfpq_recall_vs_brute_force(spark):
    """The composed IVF-PQ path compounds both approximations (cell pruning
    and code quantization); its recall floor is pinned below either alone
    but must stay useful."""
    from stupidb_spark.operators.pq import ivfpq_topk
    from stupidb_spark.operators.similarity import brute_force_topk
    from stupidb_spark.sources import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    truth = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, queries, k=10).collect()}
    got = {(r.query_id, r.neighbor_id) for r in ivfpq_topk(emb, queries, k=10).collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.6, f"IVF-PQ recall@10 {recall:.2f} below floor"


def test_near_dup_salting_matches_unsalted(spark):
    # skewed fixture: ONE giant block — exactly the shape that serialized
    # onto one task before salting. Salted pairs must equal unsalted pairs.
    from stupidb_spark.operators.similarity import embedding_near_dup_pairs

    emb = _emb(spark).withColumn("blk", F.lit("hot"))
    kw = dict(
        id_col="vec_id", vec_col="embedding", block_col="blk", threshold=0.4
    )
    unsalted = embedding_near_dup_pairs(emb, max_block=10**9, **kw)
    salted = embedding_near_dup_pairs(emb, max_block=100, **kw)
    key = lambda r: (r.id_a, r.id_b)  # noqa: E731
    u = sorted(((r.id_a, r.id_b, round(r.cosine_sim, 9)) for r in unsalted.collect()))
    s = sorted(((r.id_a, r.id_b, round(r.cosine_sim, 9)) for r in salted.collect()))
    assert len(u) > 0
    assert u == s


def test_salted_tasks_bound_per_task_work(spark):
    # every pair appears in exactly one task, and no task's input exceeds
    # ~2 sub-blocks of rows — the property that bounds per-task O(b²) work
    from stupidb_spark.operators.similarity import salted_block_tasks

    max_block = 100
    work = _emb(spark).select(
        F.lit("hot").alias("block"),
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("vec"),
    )
    n = work.count()
    s = -(-n // max_block)
    assert s >= 3, "fixture too small to exercise salting"
    tasks = salted_block_tasks(work, max_block=max_block)
    rows = tasks.groupBy("__ka", "__kb").count().collect()
    # all s*(s+1)/2 sub-block combinations appear, each bounded by two
    # hash sub-blocks of ~n/s rows (2x slack for hash imbalance)
    assert len(rows) == s * (s + 1) // 2
    assert max(r["count"] for r in rows) <= 4 * (n // s)
    # replication factor is exactly s
    assert sum(r["count"] for r in rows) == n * s


def test_pq_train_rejects_undersized_training_set(spark):
    import pytest

    from stupidb_spark.operators.pq import pq_train

    tiny = _emb(spark).limit(10)
    with pytest.raises(ValueError, match="at least k="):
        pq_train(tiny, m=16, k=256)


def test_salted_tasks_keep_null_blocks(spark):
    # a nullable block_col must not lose its NULL group: the pre-salting
    # groupBy(block) plan scored it, so the task-splitting join is
    # null-safe (eqNullSafe), not a silent equi-join drop
    from stupidb_spark.operators.similarity import salted_block_tasks

    work = _emb(spark).select(
        F.when(F.col("vec_id") % 2 == 0, F.lit("even")).alias("block"),
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("vec"),
    )
    n_null = work.filter(F.col("block").isNull()).count()
    assert n_null > 0
    tasks = salted_block_tasks(work, max_block=10**9)
    # s == 1 for every block, so each input row appears exactly once
    assert tasks.count() == work.count()
    assert tasks.filter(F.col("block").isNull()).count() == n_null


def test_near_dup_pairs_found_inside_null_block(spark):
    from stupidb_spark.operators.similarity import embedding_near_dup_pairs

    emb = _emb(spark).withColumn(
        "blk", F.when(F.col("vec_id") % 2 == 0, F.lit("even"))
    )
    kw = dict(
        id_col="vec_id", vec_col="embedding", block_col="blk", threshold=0.4
    )
    all_pairs = embedding_near_dup_pairs(emb, max_block=10**9, **kw).collect()
    # pairs between two odd (NULL-block) ids exist on the fixture and
    # must survive both the unsalted and the salted path
    null_pairs = [
        (r.id_a, r.id_b) for r in all_pairs if r.id_a % 2 and r.id_b % 2
    ]
    assert null_pairs
    salted = embedding_near_dup_pairs(emb, max_block=100, **kw).collect()
    assert sorted((r.id_a, r.id_b) for r in salted) == sorted(
        (r.id_a, r.id_b) for r in all_pairs
    )


def test_ivf_append_recall_and_durable_pruning(spark):
    """Incremental IVF append: index 80% of the corpus, append the rest
    without retraining, and (a) probe recall stays within epsilon of a full
    retrain; (b) the durable append lands inside the existing cell
    partitions so PartitionFilters still prune; (c) in-session and durable
    appends probe identically."""
    import shutil
    import uuid

    from stupidb_spark.operators.ivf import (
        append_ivf_index,
        build_ivf_index,
        ivf_append,
        ivf_cell_stats,
        ivf_probe,
        load_ivf_index,
        save_ivf_index,
    )

    emb = _emb(spark)
    n = emb.count()
    cut = int(n * 0.8)
    old = emb.filter(F.col("vec_id") < cut)
    new = emb.filter(F.col("vec_id") >= cut)
    queries = emb.filter(F.col("vec_id") < 5)

    bf = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=10).collect()
    }

    full = build_ivf_index(emb)
    base = build_ivf_index(old)
    appended = ivf_append(base, new)
    assert appended.indexed.count() == n
    # cell stats cover every cell the full index uses (rebalance signal)
    assert ivf_cell_stats(appended.indexed).count() > 0

    def recall(idx):
        got = {
            (r.query_id, r.neighbor_id)
            for r in ivf_probe(idx.indexed, idx.centroids, queries).collect()
        }
        return len(bf & got) / len(bf)

    r_full, r_app = recall(full), recall(appended)
    assert r_app >= r_full - 0.05, f"append recall {r_app} vs full {r_full}"

    path = f"/root/repo/.scratch/ivfapp-{uuid.uuid4().hex[:8]}"
    try:
        save_ivf_index(base, path)
        append_ivf_index(spark, path, new)
        loaded = load_ivf_index(spark, path)
        assert loaded.indexed.count() == n
        # durable append probes identically to the in-session union (same
        # frozen centroids => same assignment => same probe rows)
        mem = sorted(
            map(
                tuple,
                ivf_probe(appended.indexed, appended.centroids, queries).collect(),
            )
        )
        dur = sorted(
            map(
                tuple,
                ivf_probe(loaded.indexed, loaded.centroids, queries).collect(),
            )
        )
        assert mem == dur
        # appends landed inside cell=N dirs: partition pruning still works
        some_cells = sorted(
            {f.split("cell=")[1].split("/")[0] for f in loaded.indexed.inputFiles()}
        )
        assert len(some_cells) > 1
        from stupidb_spark.plans import formatted_plan

        pruned = loaded.indexed.filter(F.col("cell").isin([0]))
        pf = [
            ln
            for ln in formatted_plan(pruned).splitlines()
            if "PartitionFilters" in ln
        ]
        assert pf and "cell" in pf[0]
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_ivfpq_append_matches_all_at_once_encode(spark):
    """IVF-PQ append: the delta encoded with frozen quantizers must produce
    the exact code table a from-scratch encode of all rows (same training)
    produces — so every downstream search is identical by construction, and
    the recall floors pinned by test_ivfpq_recall_vs_brute_force carry over
    to appended indexes whose deltas match the training distribution."""
    from stupidb_spark.operators.pq import ivfpq_append, ivfpq_encode, pq_train
    from stupidb_spark.operators.ivf import ivf_train

    emb = _emb(spark)
    n = emb.count()
    cut = int(n * 0.8)
    old = emb.filter(F.col("vec_id") < cut)
    new = emb.filter(F.col("vec_id") >= cut)

    # same quantizers (trained on `old`), all rows encoded at once vs
    # base-encode + append-encode — the code tables must be identical
    centroids = ivf_train(old)
    books = pq_train(old)
    all_at_once = (centroids, books, ivfpq_encode(emb, centroids, books))
    appended = ivfpq_append(
        (centroids, books, ivfpq_encode(old, centroids, books)), new
    )
    assert appended[2].count() == n

    # the public ivfpq_topk path is cache-keyed on build params, so compare
    # the appended TABLE against the all-at-once TABLE directly: the same
    # frozen quantizers must encode the delta identically either way, which
    # makes every downstream search result identical by construction
    a = sorted(map(tuple, appended[2].orderBy("neighbor_id").collect()))
    b = sorted(map(tuple, all_at_once[2].orderBy("neighbor_id").collect()))
    assert a == b


def test_ivf_rebalance_splits_hot_cells(spark):
    """The rebalance loop the append contract promises: skewed appends →
    ivf_cell_stats signals → ivf_rebalance splits the hot cells against the
    frozen quantizer → skew drops, recall holds, cold cells untouched."""
    import numpy as np

    from stupidb_spark.operators.ivf import (
        build_ivf_index,
        ivf_append,
        ivf_cell_stats,
        ivf_probe,
        ivf_rebalance,
    )

    emb = _emb(spark)
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < 5)
    idx = build_ivf_index(emb, cache_key=None)

    # skewed append: a heterogeneous CLOUD around one existing vector piles
    # into few cells of the frozen quantizer — drifted-but-splittable, the
    # case rebalance exists for (a pile of true duplicates is NOT splittable
    # by any quantizer and is dedup's job, not the index's)
    seed = emb.filter(F.col("vec_id") == 7).select("embedding").first()[0]
    dim = len(seed)
    skew_rows = [
        (
            int(n + i),
            [
                float(seed[d]) * (1.0 + 0.08 * (((i * 31 + d * 7) % 13) - 6))
                for d in range(dim)
            ],
        )
        for i in range(6 * n // len(idx.centroids))
    ]
    skew = spark.createDataFrame(
        skew_rows, "vec_id long, embedding array<double>"
    )
    appended = ivf_append(idx, skew)

    def max_and_ratio(ix):
        counts = {r.cell: r.n for r in ivf_cell_stats(ix.indexed).collect()}
        mean = sum(counts.values()) / len(ix.centroids)
        return max(counts.values()), max(counts.values()) / mean

    skew_max, skew_ratio = max_and_ratio(appended)
    assert skew_ratio > 4.0, f"fixture failed to skew: {skew_ratio}"

    res = ivf_rebalance(appended, max_ratio=4.0, target_ratio=2.0)
    assert res.split, "no cell was split"
    new = res.index
    # the straggler metric — the hottest cell's population — measurably
    # drops; row count preserved; centroid ids stable (parents keep their
    # row, new ids append at the end)
    new_max, _ = max_and_ratio(new)
    assert new_max < skew_max / 1.5, f"max cell {skew_max} -> {new_max}"
    assert new.indexed.count() == appended.indexed.count()
    assert len(new.centroids) > len(appended.centroids)
    for parent, ids in res.split.items():
        assert ids[0] == parent
        assert all(i >= len(appended.centroids) for i in ids[1:])
    # cold cells: assignment unchanged row-for-row (exclude the whole
    # split family on the new side — reassigned rows live in parent or new
    # sub-cell ids, never in a cold cell)
    hot = list(res.split)
    fam = {i for ids in res.split.values() for i in ids}
    cold_before = sorted(
        map(tuple, appended.indexed.filter(~F.col("cell").isin(hot)).collect())
    )
    cold_after = sorted(
        map(
            tuple,
            new.indexed.filter(~F.col("cell").isin(list(fam))).collect(),
        )
    )
    assert cold_before == cold_after
    # every reassigned row stays within its parent's sub-centroid family
    moved = new.indexed.filter(F.col("cell").isin(list(fam)))
    assert moved.count() == appended.indexed.filter(
        F.col("cell").isin(hot)
    ).count()

    # recall: probe the rebalanced index vs brute force on the grown corpus
    grown = emb.select("vec_id", "embedding").unionByName(skew)
    bf = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(grown, queries, k=10).collect()
    }
    before = {
        (r.query_id, r.neighbor_id)
        for r in ivf_probe(
            appended.indexed, appended.centroids, queries
        ).collect()
    }
    # probe-budget contract: n_probe scales with the cell count so the
    # probed fraction of the space is unchanged (see ivf_rebalance doc)
    import math

    scaled_probe = math.ceil(6 * len(new.centroids) / len(appended.centroids))
    after = {
        (r.query_id, r.neighbor_id)
        for r in ivf_probe(
            new.indexed, new.centroids, queries, n_probe=scaled_probe
        ).collect()
    }
    r_before = len(bf & before) / len(bf)
    r_after = len(bf & after) / len(bf)
    assert r_after >= r_before - 0.05, f"recall {r_before} -> {r_after}"
    # idempotent: a second pass finds nothing hot at the same threshold
    assert not ivf_rebalance(new, max_ratio=4.0).split


def test_rebalance_lloyd_sample_spans_id_range(spark):
    """The hot-cell Lloyd sample must represent appended HIGH-id rows, not
    just the n_train lowest ids: append-drift piles are high-id, and a
    lowest-id sample from a cell with >= n_train tenured rows would contain
    zero pile members, so the fitted sub-centroids would never see the hot
    region."""
    import numpy as np

    from stupidb_spark.operators.ivf import _cell_sample

    rows = [
        (int(i), [float((i * 13 + d) % 7) for d in range(4)], 0)
        for i in range(300)
    ]
    indexed = spark.createDataFrame(
        rows, "neighbor_id long, b_vec array<double>, cell int"
    )
    ids, X = _cell_sample(indexed, 0, 100)
    assert len(ids) == 100 and X.shape == (100, 4)
    assert list(ids) == sorted(ids)  # id-sorted for evenly-spaced seeds
    # evenly drawn: the top-third id segment (the "appended pile") is
    # represented roughly proportionally — a lowest-id sample has none
    high = (ids >= 200).sum()
    assert 15 <= high <= 55, f"high-id rows in sample: {high}"
    # deterministic draw
    ids2, _ = _cell_sample(indexed, 0, 100)
    assert list(ids) == list(ids2)


def test_durable_rebalance_emptied_parent_leaves_no_stale_partition(spark):
    """If every row of a hot parent moves to new sub-cells, the parent's
    cell=N directory must not survive the durable rebalance: dynamic
    partition overwrite only replaces partitions present in the written
    data, so a stale parent dir would double-count its neighbors on every
    probe of the reloaded index."""
    import os
    import shutil
    import uuid

    import numpy as np

    from stupidb_spark.operators import ivf as ivf_mod
    from stupidb_spark.operators.ivf import (
        _CachedIndex,
        RebalanceResult,
        build_ivf_index,
        load_ivf_index,
        rebalance_ivf_index,
        save_ivf_index,
    )

    emb = _emb(spark)
    idx = build_ivf_index(emb, cache_key=None)
    k_old = len(idx.centroids)
    # a parent cell that actually has rows
    parent = idx.indexed.groupBy("cell").count().orderBy(
        F.col("count").desc()
    ).first().cell

    path = f"/root/repo/.scratch/ivfempty-{uuid.uuid4().hex[:8]}"
    try:
        save_ivf_index(idx, path)
        loaded = load_ivf_index(spark, path)

        def crafted_rebalance(ix, **kwargs):
            # every row of `parent` moves to the new appended sub-cell —
            # the parent ends EMPTY (the hazard under dynamic overwrite)
            moved = ix.indexed.withColumn(
                "cell",
                F.when(F.col("cell") == parent, F.lit(k_old)).otherwise(
                    F.col("cell")
                ),
            )
            cents = np.vstack([ix.centroids, ix.centroids[parent]])
            return RebalanceResult(
                _CachedIndex(centroids=cents, indexed=moved),
                {parent: [parent, k_old]},
            )

        orig = ivf_mod.ivf_rebalance
        ivf_mod.ivf_rebalance = crafted_rebalance
        try:
            split = rebalance_ivf_index(spark, path)
        finally:
            ivf_mod.ivf_rebalance = orig
        assert split == {parent: [parent, k_old]}
        # stale parent dir is gone; the sub-cell dir exists
        assert not os.path.exists(f"{path}/cells/cell={parent}")
        assert os.path.exists(f"{path}/cells/cell={k_old}")
        # the reloaded index has no duplicate neighbors and no lost rows
        re = load_ivf_index(spark, path)
        total = emb.count()
        assert re.indexed.count() == total
        assert re.indexed.select("neighbor_id").distinct().count() == total
        assert re.indexed.filter(F.col("cell") == parent).count() == 0
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_ivf_rebalance_durable_rewrites_only_hot_partitions(spark):
    """Durable rebalance: only hot parents + new sub-cells are rewritten;
    cold cell=N directories keep their files; probes against the reloaded
    index match the in-memory rebalance; PartitionFilters still prune."""
    import shutil
    import uuid

    from stupidb_spark.operators.ivf import (
        append_ivf_index,
        build_ivf_index,
        ivf_probe,
        load_ivf_index,
        rebalance_ivf_index,
        save_ivf_index,
    )

    emb = _emb(spark)
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < 5)
    idx = build_ivf_index(emb, cache_key=None)
    seed = emb.filter(F.col("vec_id") == 7).select("embedding").first()[0]
    dim = len(seed)
    skew = spark.createDataFrame(
        [
            (
                int(n + i),
                [float(seed[d]) + 1e-4 * ((i + d) % 7) for d in range(dim)],
            )
            for i in range(6 * n // len(idx.centroids))
        ],
        "vec_id long, embedding array<double>",
    )

    path = f"/root/repo/.scratch/ivfreb-{uuid.uuid4().hex[:8]}"
    try:
        save_ivf_index(idx, path)
        append_ivf_index(spark, path, skew)
        import os

        def mtimes():
            out = {}
            for d in os.listdir(f"{path}/cells"):
                if d.startswith("cell="):
                    cell_dir = f"{path}/cells/{d}"
                    out[d] = max(
                        os.path.getmtime(os.path.join(cell_dir, f))
                        for f in os.listdir(cell_dir)
                        if f.endswith(".parquet")
                    )
            return out

        before_files = mtimes()
        split = rebalance_ivf_index(spark, path, max_ratio=4.0)
        assert split, "durable rebalance found nothing hot"
        after_files = mtimes()
        touched = {f"cell={c}" for ids in split.values() for c in ids} | {
            f"cell={p}" for p in split
        }
        for d, t in before_files.items():
            if d not in touched:
                assert after_files[d] == t, f"cold partition {d} rewritten"
        for d in touched:
            assert d in after_files

        loaded = load_ivf_index(spark, path)
        total = n + skew.count()
        assert loaded.indexed.count() == total
        # no duplicate neighbor ids (the stale-parent hazard the fallback
        # guards)
        assert (
            loaded.indexed.select("neighbor_id").distinct().count() == total
        )
        got = ivf_probe(loaded.indexed, loaded.centroids, queries)
        per_q = got.groupBy("query_id", "neighbor_id").count()
        assert per_q.filter(F.col("count") > 1).count() == 0
        # pruning survives: static cell filter still reaches the scan
        from stupidb_spark.plans import formatted_plan

        pruned = loaded.indexed.filter(F.col("cell").isin([0]))
        pf = [
            ln
            for ln in formatted_plan(pruned).splitlines()
            if "PartitionFilters" in ln
        ]
        assert pf and "cell" in pf[0]
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_near_dup_zero_norm_vector_fails_loudly(spark):
    import pytest

    from stupidb_spark.operators.similarity import embedding_near_dup_pairs

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception) as ei:
        embedding_near_dup_pairs(df, threshold=0.5).collect()
    assert "zero norm" in str(ei.value)


def test_check_ivf_index_detects_crash_window_damage(spark):
    """check_ivf_index: all-clear on a healthy index; flags duplicated
    neighbor_ids (stale parent dir surviving a crash between the rebalance
    data commit and the stale-parent delete) and orphan data cells (crash
    before the centroid write)."""
    import shutil
    import uuid

    from stupidb_spark.operators.ivf import (
        build_ivf_index,
        check_ivf_index,
        load_ivf_index,
        save_ivf_index,
    )

    emb = _emb(spark)
    idx = build_ivf_index(emb, cache_key=None)
    path = f"/root/repo/.scratch/ivfchk-{uuid.uuid4().hex[:8]}"
    try:
        save_ivf_index(idx, path)
        assert check_ivf_index(spark, path) == {
            "duplicate_ids": 0,
            "stale_cells": [],
            "orphan_cells": [],
        }

        # Simulate the crash: rows of one populated cell ALSO written under
        # a new sub-cell id (the moved copies committed, the stale parent
        # dir never deleted) — and the new cell has no centroid row yet.
        loaded = load_ivf_index(spark, path)
        parent = (
            loaded.indexed.groupBy("cell")
            .count()
            .orderBy(F.col("count").desc())
            .first()
            .cell
        )
        new_cell = len(loaded.centroids)
        dup_rows = loaded.indexed.filter(F.col("cell") == parent).withColumn(
            "cell", F.lit(new_cell)
        )
        n_dup = dup_rows.count()
        dup_rows.write.partitionBy("cell").mode("append").parquet(
            f"{path}/cells"
        )

        report = check_ivf_index(spark, path)
        assert report["duplicate_ids"] == n_dup
        assert report["stale_cells"] == sorted([int(parent), int(new_cell)])
        assert report["orphan_cells"] == [int(new_cell)]

        # the named repair (delete the stale dir) restores the invariant
        shutil.rmtree(f"{path}/cells/cell={new_cell}")
        assert check_ivf_index(spark, path) == {
            "duplicate_ids": 0,
            "stale_cells": [],
            "orphan_cells": [],
        }
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_ivf_assignment_rejects_null_embedding(spark):
    """The plan-shape coalesce(assign, 0) must never silently route a null
    embedding to cell 0 — assignment fails loudly instead (both the float64
    and the quantized-grid assigners)."""
    import numpy as np
    import pytest

    from stupidb_spark.operators.ivf import _assign_udf
    from stupidb_spark.operators.semantic import _quant_assign_udf

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None)], "vec_id long, embedding array<double>"
    )
    C = np.array([[1.0, 0.0], [0.0, 1.0]])
    for factory in (_assign_udf, _quant_assign_udf):
        with pytest.raises(Exception) as ei:
            df.select(
                F.coalesce(factory(C)("embedding"), F.lit(0))
            ).collect()
        assert "null embedding" in str(ei.value)


def test_quant_sims_float64_sum_bit_identical_to_int64():
    """_quant_sims sums the floored per-products in float64 (round 11:
    skips two full-tensor dtype conversions). The floored values are
    integers |v| <= 2^40 and 64-dim sums <= 2^46 — exact in float64 — so
    the result must be BIT-identical to the explicit int64-sum
    construction the SQL oracles mirror, including adversarial values at
    the grid boundary."""
    import numpy as np

    from stupidb_spark.operators.similarity import (
        QUANT_SCALE,
        _qdot,
        _quant_sims,
    )

    rng = np.random.default_rng(7)
    B = rng.normal(size=(200, 64))
    B /= np.linalg.norm(B, axis=1, keepdims=True)
    Q = rng.normal(size=(37, 64))
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    # adversarial rows: exact grid-boundary and near-boundary values
    B[0] = 0.5 ** np.arange(1, 65)
    Q[0] = 0.5 ** np.arange(1, 65)
    qnorms = np.sqrt(_qdot(Q, Q).astype(np.float64) / QUANT_SCALE)
    got = _quant_sims(B, Q, qnorms)
    bnorms = np.sqrt(_qdot(B, B).astype(np.float64) / QUANT_SCALE)
    want = np.empty_like(got)
    for j in range(len(Q)):
        prod = B * Q[j][None, :]
        d = (
            np.floor(prod * QUANT_SCALE + 0.5).astype(np.int64).sum(axis=1)
        ).astype(np.float64) / QUANT_SCALE
        want[:, j] = d / (bnorms * qnorms[j])
    assert got.tobytes() == want.tobytes()
