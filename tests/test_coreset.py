"""k-center coreset: numpy reference differential, greedy invariants,
and the quantized-distance fold."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from stupidb_spark.operators.coreset import (
    MAX_DEFAULT_K,
    kcenter_coreset,
    qdist2,
)
from stupidb_spark.operators.similarity import QUANT_SCALE


def _np_qdist2(a: np.ndarray, b: np.ndarray) -> int:
    # per-term floor onto the 2^-40 grid, summed as int — the contract
    return int(
        np.floor((a - b) * (a - b) * QUANT_SCALE + 0.5).astype(np.int64).sum()
    )


def _np_kcenter(ids, vecs, k):
    """Reference greedy: seed = min id, then argmax of min-dist over the
    NOT-yet-selected points with smallest-id tie-break."""
    order = np.argsort(ids)
    ids = np.asarray(ids)[order]
    vecs = np.asarray(vecs, dtype=np.float64)[order]
    sel = [(1, int(ids[0]), None)]
    taken = np.zeros(len(ids), dtype=bool)
    taken[0] = True
    mind = np.array([_np_qdist2(v, vecs[0]) for v in vecs], dtype=np.int64)
    for rank in range(2, k + 1):
        if taken.all():
            break
        cand = np.flatnonzero(~taken)
        best = int(cand[np.lexsort((ids[cand], -mind[cand]))[0]])
        taken[best] = True
        sel.append((rank, int(ids[best]), int(mind[best])))
        mind = np.minimum(
            mind,
            np.array([_np_qdist2(v, vecs[best]) for v in vecs], dtype=np.int64),
        )
    return sel


def test_qdist2_matches_numpy_fold(spark):
    rng = np.random.default_rng(7)
    a, b = rng.normal(size=16), rng.normal(size=16)
    df = spark.createDataFrame(
        [(a.tolist(), b.tolist())], "a array<double>, b array<double>"
    )
    got = df.select(qdist2(F.col("a"), F.col("b")).alias("d")).collect()[0].d
    assert got == _np_qdist2(a, b)


def test_kcenter_matches_numpy_reference(spark):
    rng = np.random.default_rng(11)
    n, dim, k = 120, 8, 9
    ids = rng.permutation(n * 3)[:n].tolist()
    vecs = rng.normal(scale=0.4, size=(n, dim)).astype(np.float32)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)],
        "vec_id long, embedding array<float>",
    )
    got = [
        (r.rank, r.vec_id, r.dist)
        for r in kcenter_coreset(df, k).orderBy("rank").collect()
    ]
    assert got == _np_kcenter(ids, vecs, k)


def test_kcenter_cover_radius_monotone_and_deterministic(spark):
    from stupidb_spark.sources import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    a = kcenter_coreset(emb, 8).orderBy("rank").collect()
    dists = [r.dist for r in a[1:]]
    assert all(
        x >= y for x, y in zip(dists, dists[1:])
    ), "greedy cover radius must be non-increasing"
    assert a[0].dist is None and a[0].rank == 1
    b = kcenter_coreset(emb, 8).orderBy("rank").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_kcenter_k1_and_bounds(spark):
    df = spark.createDataFrame(
        [(3, [0.0]), (1, [1.0])], "vec_id long, embedding array<float>"
    )
    rows = kcenter_coreset(df, 1).collect()
    assert [(r.rank, r.vec_id, r.dist) for r in rows] == [(1, 1, None)]
    with pytest.raises(ValueError, match="k must be"):
        kcenter_coreset(df, 0)
    with pytest.raises(ValueError, match="MAX_DEFAULT_K"):
        kcenter_coreset(df, MAX_DEFAULT_K + 1)
    with pytest.raises(ValueError, match="empty"):
        kcenter_coreset(df.filter(F.lit(False)), 2)


def test_kcenter_seed_tie_and_equidistant_tiebreak(spark):
    # three identical vectors: every distance is 0, so ranks 2..3 must
    # fall back to smallest-id order — the partition-order-independence
    # guarantee the quantized grid + id tie-break exists to provide
    df = spark.createDataFrame(
        [(5, [0.5, 0.5]), (2, [0.5, 0.5]), (9, [0.5, 0.5])],
        "vec_id long, embedding array<float>",
    )
    rows = kcenter_coreset(df, 3).orderBy("rank").collect()
    assert [(r.rank, r.vec_id, r.dist) for r in rows] == [
        (1, 2, None),
        (2, 5, 0),
        (3, 9, 0),
    ]


def test_kcenter_k_exceeding_population_returns_all(spark):
    df = spark.createDataFrame(
        [(5, [0.5]), (2, [0.25]), (9, [0.75])],
        "vec_id long, embedding array<float>",
    )
    rows = kcenter_coreset(df, 7).orderBy("rank").collect()
    assert [r.vec_id for r in rows] == [2, 9, 5]


def test_kcenter_first_pick_is_farthest(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.1, 0.0]), (3, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = kcenter_coreset(df, 2).orderBy("rank").collect()
    assert rows[1].vec_id == 3
    expect = math.floor(1.0 * QUANT_SCALE + 0.5) + 0  # (1-0)^2 term only
    assert rows[1].dist == expect
