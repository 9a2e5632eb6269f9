"""IVF (inverted-file) approximate nearest-neighbor search.

The second scale path for similarity search next to multi-table LSH
(operators/similarity.py): a k-means coarse quantizer partitions the vector
space into ``n_centroids`` cells; each base vector is indexed under its
nearest centroid, and a query scores only the ``n_probe`` nearest cells —
scan-per-query becomes cell-local scoring, the classic IVF-Flat layout.

Train / index / probe are SEPARATE steps (the FAISS lifecycle), because at
100 TB an index must be built once and probed many times — never rebuilt
inside a query:

- :func:`ivf_train` fits the quantizer on a bounded deterministic SAMPLE of
  the base table collected to the driver, with Lloyd iterations running as
  vectorized numpy on that sample (k·dim model floats). Training on a sample
  is the standard IVF recipe — the quantizer only needs the coarse shape of
  the distribution, and it turns ~7 Spark jobs per Lloyd iteration into one
  bounded collect.
- :func:`ivf_index` is one map-only pass assigning every base vector to its
  cell (vectorized matmul per Arrow batch). At scale the result is written
  partitioned/bucketed by cell (sources/bucketing.py) so probes are
  pruned scans; locally we ``persist()`` it.
- :func:`ivf_probe` explodes each query into its ``n_probe`` nearest cells
  and scores only those cells' vectors — no k-means, no full scan.

:func:`ivf_topk` composes the three for one-shot use and memoizes the
trained index per (DataFrame, params) so repeated queries against the same
base table skip straight to the probe — the behavior a 1000-executor
deployment gets from the bucketed index table.

Deterministic: the training sample is the ``n_train`` lowest-id vectors,
seeds are the first ``k`` of those, iteration count is fixed — same inputs,
same index.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stupidb_spark.operators.similarity import (
    collect_query_matrix,
    spread_small_scan,
)


def _normalize(M: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return M / norms


def _assign_udf(centroids: np.ndarray):
    """cluster id of each vector = argmax cosine vs centroid matrix."""
    C = _normalize(centroids.astype(np.float64))

    def fn(v: pd.Series) -> pd.Series:
        if v.isna().any():
            # Loud by contract: the coalesce(assign, 0) at the ivf_index
            # call site exists only for plan shape (non-nullable `cell`
            # suppresses an inferred isnotnull filter that would double-run
            # this UDF). It must never become a silent null→cell-0 router,
            # so reject null vectors here, mirroring the zero-norm contract.
            raise ValueError(
                "null embedding passed to IVF assignment; filter null "
                "vectors at ingest (cosine cell assignment is undefined)"
            )
        M = _normalize(np.stack(v.to_numpy()).astype(np.float64))
        return pd.Series(np.argmax(M @ C.T, axis=1).astype(np.int32))

    return F.pandas_udf(fn, "int")


def _probe_cells(Q: np.ndarray, centroids: np.ndarray, n_probe: int) -> np.ndarray:
    """(nq, n_probe) ids of the nearest centroids per query vector — driver
    math on the collected query matrix (nq × k floats)."""
    C = _normalize(centroids.astype(np.float64))
    sims = _normalize(Q) @ C.T
    return np.argsort(-sims, axis=1)[:, :n_probe].astype(np.int32)


def ivf_train(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 3,
    n_train: int = 4096,
) -> np.ndarray:
    """Fit the coarse quantizer: deterministic Lloyd's k-means on the
    ``n_train`` lowest-id vectors (one bounded TakeOrdered collect — the
    only data that ever reaches the driver), iterations vectorized in numpy.

    The sample bound is what makes this a 100 TB operation: quantizer
    quality needs a distribution sketch, not the data set, so training cost
    is O(n_train · k · dim · iters) on the driver regardless of table size.
    """
    rows = (
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy("_id")
        .limit(n_train)
        .collect()
    )
    X = np.stack([np.array(r._v, dtype=np.float64) for r in rows])
    Xn = _normalize(X)
    centroids = X[:k].copy()
    for _ in range(iters):
        C = _normalize(centroids)
        assign = np.argmax(Xn @ C.T, axis=1)  # cosine assignment
        for c in range(k):
            members = X[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


# Back-compat alias (pre-split name); same contract, sample-trained now.
def kmeans_centroids(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 3,
) -> np.ndarray:
    return ivf_train(df, id_col=id_col, vec_col=vec_col, k=k, iters=iters)


# component-quantization scale for exact distributed centroid sums: fine
# enough that refined centroids sit within 1e-6 of the float means, coarse
# enough that petabyte-scale cell sums stay far below 2^63 (and below 2^53
# for the exact long→double cast at any cell size under ~8e9 rows)
REFINE_SCALE = float(1 << 20)


def ivf_refine(
    df: DataFrame,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 1,
    assign_udf_factory=None,
) -> np.ndarray:
    """Full-corpus Lloyd refinement of a (sample-trained) quantizer.

    :func:`ivf_train` fits centroids on an ``n_train`` sample — a
    distribution sketch, which is what makes training driver-cheap at
    100 TB. But sample-only cell boundaries can misplace mass the sample
    never saw; the classic fix is corpus-scale Lloyd passes: assign every
    vector to its nearest centroid (the map-only assignment UDF), reduce
    per-(cell, dim) component sums, recompute the k×dim centroid matrix
    driver-side, repeat. Each iteration is one corpus pass:

    - **Assignment is map-only** (centroid matrix rides the closure, the
      PQ-codebook movement class).
    - **The reduce is pre-aggregated map-side**: dims are exploded and
      hash-aggregated on (cell, dim), so each task emits at most k×dim
      partial rows — the shuffle carries tasks × k × dim longs, never the
      corpus.
    - **Driver state is model-sized**: the collect is k×dim (sum, count)
      rows per iteration.
    - **Sums are exact**: components are quantized to the
      ``REFINE_SCALE`` grid (floor(x·S + 0.5), the shared dround idiom)
      and summed as longs — order-independent under any partitioning, so
      refined centroids are bit-identical across reruns, engines, and the
      numpy mirror (:func:`ivf_refine_reference`). New centroid =
      sum/n/S in IEEE doubles. Cells with no members keep their previous
      centroid (standard Lloyd).

    ``assign_udf_factory`` defaults to the float64-matmul
    :func:`_assign_udf` (fastest); pass
    ``stupidb_spark.operators.semantic._quant_assign_udf`` for the
    engine-portable quantized-grid assignment (DuckDB-replayable, used by
    the oracled ``emb_kmeans_refine`` query).
    """
    factory = assign_udf_factory or _assign_udf
    C = centroids.astype(np.float64).copy()
    k, dim = C.shape
    for _ in range(iters):
        qv = F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.floor(x * F.lit(REFINE_SCALE) + F.lit(0.5)).cast(
                "long"
            ),
        )
        # two-step select: assignment FIRST, explode second — in a single
        # select Catalyst plans the Generate below the UDF and the
        # assignment would re-evaluate once per exploded dim (observed:
        # ArrowEvalPython above posexplode = dim× redundant matmuls)
        assigned = spread_small_scan(df.select(F.col(vec_col))).select(
            F.coalesce(factory(C)(vec_col), F.lit(0)).alias("cell"),
            qv.alias("__qv"),
        )
        rows = (
            assigned.select("cell", F.posexplode("__qv").alias("dim", "q"))
            .groupBy("cell", "dim")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("q").alias("sq"))
            .collect()
        )
        for r in rows:
            C[r["cell"], r["dim"]] = (
                float(r["sq"]) / float(r["n"]) / REFINE_SCALE
            )
    return C


def ivf_refine_reference(
    V: np.ndarray, centroids: np.ndarray, *, iters: int = 1, quant: bool = False
) -> np.ndarray:
    """Driver-side numpy mirror of :func:`ivf_refine` with the identical
    quantized-sum arithmetic — the differential ground truth. Test-support
    code. ``quant=True`` mirrors the quantized-grid assignment
    (``semantic._quant_assign_udf``); False mirrors :func:`_assign_udf`.
    """
    from stupidb_spark.operators.similarity import QUANT_SCALE, _qdot

    C = centroids.astype(np.float64).copy()
    X = V.astype(np.float64)
    for _ in range(iters):
        if quant:
            nm = np.sqrt(_qdot(X, X).astype(np.float64) / QUANT_SCALE)
            cn = np.sqrt(
                np.array(
                    [
                        _qdot(C[j][None, :], C[j][None, :]).astype(np.float64)[0]
                        for j in range(len(C))
                    ]
                )
                / QUANT_SCALE
            )
            sims = np.empty((len(X), len(C)))
            for j in range(len(C)):
                d = (
                    _qdot(X, np.broadcast_to(C[j], X.shape)).astype(np.float64)
                    / QUANT_SCALE
                )
                sims[:, j] = d / (nm * cn[j])
            assign = np.argmax(sims, axis=1)
        else:
            assign = np.argmax(_normalize(X) @ _normalize(C).T, axis=1)
        Q = np.floor(X * REFINE_SCALE + 0.5).astype(np.int64)
        for c in range(len(C)):
            members = Q[assign == c]
            if len(members):
                C[c] = members.sum(axis=0, dtype=np.int64) / len(members) / REFINE_SCALE
    return C


def ivf_index(
    base: DataFrame,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every base vector to its nearest cell — one map-only pass
    (columns: neighbor_id, b_vec, cell). At scale, write this partitioned or
    bucketed by ``cell`` so probes scan only probed cells."""
    # coalesce-to-0 never fires (argmax always yields an int) but marks
    # `cell` non-nullable, so downstream joins on it don't infer an
    # isnotnull(cell) filter — which would push below the scan spread and
    # make Catalyst evaluate the assignment UDF TWICE per subtree (see
    # simhash_fingerprints for the observed plan shape).
    #
    # Volume-derived spread width (guide §2, the knn_join probe rule): the
    # assignment is a vectorized matmul — light per byte — so core-count
    # width on a kilobyte-scale scan multiplies fixed task overhead for
    # ~1 ms of numpy per task (r15: three 32-task checkpoint consumers at
    # ~430 ms/task of overhead in the dedup_semantic profile).
    return spread_small_scan(
        base.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("b_vec")
        ),
        bytes_per_task=256 * 1024,
    ).withColumn(
        "cell", F.coalesce(_assign_udf(centroids)("b_vec"), F.lit(0))
    )


def ivf_probe(
    indexed: DataFrame,
    centroids: np.ndarray,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 6,
) -> DataFrame:
    """Probe a prebuilt index: each query fans out to its ``n_probe``
    nearest cells (computed driver-side on the collected query matrix —
    queries are the small, broadcastable side), and only those cells' index
    rows are scored. The scorer is the same ``mapInPandas`` shape as
    :func:`~stupidb_spark.operators.similarity.brute_force_topk` — query
    matrix embedded, one matmul per Arrow batch, a per-query cell-membership
    mask instead of a probe-pair join, batch-local top-k — so no vector ever
    rides a join or shuffle and the merge exchange carries only
    ``partitions × nq × k`` id+double rows. No training, no full scan.

    Returns: query_id, neighbor_id, cosine_sim, rk (≤ k rows per query).
    """
    from stupidb_spark.operators.similarity import QUANT_SCALE, _qdot, _quant_sims

    # ONE collect: the same (ids, matrix) drives cell selection and the
    # scorer — the query side never touches Spark again.
    q_ids, Q = collect_query_matrix(queries, id_col, vec_col)
    cells = _probe_cells(Q, centroids, n_probe)
    qnorms = np.sqrt(_qdot(Q, Q).astype(np.float64) / QUANT_SCALE)
    # (nq, n_centroids) membership mask: does query j probe cell c?
    probe_mask = np.zeros((len(q_ids), len(centroids)), dtype=bool)
    for j, row in enumerate(cells):
        probe_mask[j, row] = True

    id_type = dict(indexed.dtypes)["neighbor_id"]
    out_schema = f"query_id {id_type}, neighbor_id {id_type}, cosine_sim double"

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            B = np.stack(pdf["b_vec"].to_numpy()).astype(np.float64)
            ids = pdf["neighbor_id"].to_numpy()
            cell_v = pdf["cell"].to_numpy()
            sims = _quant_sims(B, Q, qnorms)
            frames = []
            for j, qid in enumerate(q_ids):
                mask = probe_mask[j, cell_v] & (ids != qid)
                cid, csim = ids[mask], sims[mask, j]
                order = np.lexsort((cid, -csim))[:k]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": cid[order],
                            "cosine_sim": csim[order],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    # The probed cell set is known driver-side — filter it STATICALLY so a
    # cell-partitioned index scans only probed partitions (partition pruning
    # at plan time, not dynamic pruning at run time).
    probed = sorted({int(c) for row in cells for c in row})
    partials = indexed.filter(F.col("cell").isin(probed)).mapInPandas(
        score, out_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        partials.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rk")
    )


@dataclass
class _CachedIndex:
    centroids: np.ndarray
    indexed: DataFrame


def save_ivf_index(idx: _CachedIndex, path: str) -> None:
    """Persist an index as a table: the cell assignment partitioned by
    ``cell`` (so :func:`ivf_probe`'s static cell filter prunes to probed
    partitions at scan time) plus the centroid matrix as model metadata.

    This is the durable form of :func:`build_ivf_index`'s in-session
    ``persist()`` — on a cluster the index outlives the session and is
    shared by every probing job.
    """
    idx.indexed.write.partitionBy("cell").mode("overwrite").parquet(
        f"{path}/cells"
    )
    spark = idx.indexed.sparkSession
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(idx.centroids)]
    spark.createDataFrame(rows, "cell int, centroid array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/centroids")


def load_ivf_index(spark, path: str) -> _CachedIndex:
    """Load a :func:`save_ivf_index` table; probes against it scan only the
    probed cell partitions."""
    cent_rows = spark.read.parquet(f"{path}/centroids").orderBy("cell").collect()
    centroids = np.stack([np.array(r.centroid, dtype=np.float64) for r in cent_rows])
    indexed = spark.read.parquet(f"{path}/cells")
    return _CachedIndex(centroids=centroids, indexed=indexed)


def check_ivf_index(spark, path: str) -> dict:
    """Integrity probe for a saved index — the repair tool for the
    non-transactional window in :func:`rebalance_ivf_index`.

    Two invariants, each one bounded aggregate over (id, cell) ints:

    - no neighbor_id appears in more than one cell (violated by a crash
      between the rebalance's data commit and its stale-parent delete);
    - every data cell id has a centroid row (violated by a crash between
      the data commit and the centroid write — orphan sub-cells a probe
      would silently never scan).

    Returns ``{"duplicate_ids": n, "stale_cells": [...], "orphan_cells":
    [...]}``; all-clear is ``(0, [], [])``. ``stale_cells`` names the cells
    holding duplicated ids — for a crashed split that is the parent dir to
    delete (the moved copies are the ones nearest their centroid).
    """
    indexed = spark.read.parquet(f"{path}/cells").select("neighbor_id", "cell")
    cent_cells = {
        r.cell for r in spark.read.parquet(f"{path}/centroids").select("cell").collect()
    }
    dup = (
        indexed.groupBy("neighbor_id")
        .agg(F.collect_set("cell").alias("cells"))
        .filter(F.size("cells") > 1)
        .agg(
            F.count(F.lit(1)).alias("n_ids"),
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("cells")))
            ).alias("cells"),
        )
        .collect()[0]
    )
    data_cells = {r.cell for r in indexed.select("cell").distinct().collect()}
    return {
        "duplicate_ids": int(dup.n_ids),
        "stale_cells": [int(c) for c in (dup.cells or [])],
        "orphan_cells": sorted(int(c) for c in data_cells - cent_cells),
    }


def ivf_append(
    idx: _CachedIndex,
    new_vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> _CachedIndex:
    """Append new vectors to an existing index WITHOUT retraining: assign
    them to the frozen coarse quantizer's cells (one map-only pass over the
    new vectors only) and union with the existing assignment.

    Drift / rebalance contract: the quantizer stays frozen, so appended
    vectors are binned by the distribution the index was TRAINED on. That is
    exactly what a growing corpus wants (index cost proportional to the
    delta, probes unchanged) as long as the new data resembles the old; if
    the distribution drifts, cells skew and recall decays gracefully — never
    wrongly, since probes still score true cosines, just over less-balanced
    cells. Monitor with :func:`ivf_cell_stats`; retrain (full
    :func:`build_ivf_index`) when the max/mean cell ratio exceeds ~8x or the
    appended volume exceeds the originally-indexed volume.
    """
    assigned = ivf_index(new_vectors, idx.centroids, id_col=id_col, vec_col=vec_col)
    return _CachedIndex(
        centroids=idx.centroids,
        indexed=idx.indexed.unionByName(assigned),
    )


def append_ivf_index(
    spark,
    path: str,
    new_vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Durable form of :func:`ivf_append`: assign new vectors with the
    SAVED centroids and append them to the cell-partitioned index table.

    Writes land inside the existing ``cell=N`` partition directories
    (``mode("append")`` with the same ``partitionBy``), so
    :func:`ivf_probe`'s static cell filter prunes exactly as before — the
    probed-partition contract survives appends. Cost is one map-only pass
    over the delta; the existing index is never read or rewritten. Same
    drift/rebalance contract as :func:`ivf_append`.
    """
    cent_rows = spark.read.parquet(f"{path}/centroids").orderBy("cell").collect()
    centroids = np.stack(
        [np.array(r.centroid, dtype=np.float64) for r in cent_rows]
    )
    assigned = ivf_index(new_vectors, centroids, id_col=id_col, vec_col=vec_col)
    # Align the delta to the STORED vector type (e.g. array<float> index,
    # array<double> delta): parquet partitions mixing element types fail at
    # read time with PARQUET_COLUMN_DATA_TYPE_MISMATCH — schema drift on an
    # append must not poison the index.
    stored = dict(spark.read.parquet(f"{path}/cells").dtypes)["b_vec"]
    assigned = assigned.withColumn("b_vec", F.col("b_vec").cast(stored))
    assigned.write.partitionBy("cell").mode("append").parquet(f"{path}/cells")


def ivf_cell_stats(indexed: DataFrame) -> DataFrame:
    """Per-cell population (cell, n) — the rebalance signal for appended
    indexes. One hash aggregate over (cell) ints; never touches vectors."""
    return indexed.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))


@dataclass
class RebalanceResult:
    """Outcome of :func:`ivf_rebalance`: the (possibly unchanged) index and
    the split map ``{parent_cell: [new_cell_ids...]}`` (empty = no cell was
    hot; the first id of every family is the parent's own, reused)."""

    index: _CachedIndex
    split: dict[int, list[int]]


def _local_lloyd(X: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Deterministic Lloyd on a driver-side sample — cosine assignment,
    fixed iterations, POPULATION-PROPORTIONAL seeds (evenly spaced over the
    id-sorted sample) rather than ivf_train's first-k. Rebalance exists
    because one region of a cell piled up; first-k seeds all land among the
    longest-tenured members (lowest ids), leaving the pile — typically the
    newest, highest-id rows — to collapse into a single sub-centroid and
    defeat the split. Evenly-spaced seeds give every population segment
    representation proportional to its size, so the hot region gets seeds
    inside it."""
    Xn = _normalize(X)
    centroids = X[np.linspace(0, len(X) - 1, k).astype(int)].copy()
    for _ in range(iters):
        C = _normalize(centroids)
        assign = np.argmax(Xn @ C.T, axis=1)
        for c in range(k):
            members = X[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def _cell_sample(
    indexed: DataFrame, cell: int, n_train: int
) -> tuple[np.ndarray, np.ndarray]:
    """Bounded Lloyd sample for one cell: ``n_train`` members drawn EVENLY
    across the cell's id range (deterministic hash order, id tie-break),
    returned id-sorted as ``(ids, X)``.

    Lowest-id sampling would be wrong here: rebalance exists because
    appends piled into the cell, and appended rows carry the HIGHEST ids —
    a cell with ≥ n_train pre-append members would contribute a sample with
    zero pile members, the fitted sub-centroids would never see the hot
    region, and the split would fail to reduce skew. Hash-ordered
    draw gives every id segment (tenured and appended alike)
    representation proportional to its population."""
    rows = (
        indexed.filter(F.col("cell") == cell)
        .orderBy(F.xxhash64("neighbor_id"), "neighbor_id")
        .limit(n_train)
        .collect()
    )
    ids = np.array([r.neighbor_id for r in rows])
    X = np.stack([np.array(r.b_vec, dtype=np.float64) for r in rows])
    # id-sort so _local_lloyd's evenly-spaced seeds span the id range —
    # tenured lows and appended highs both get seeds in proportion
    order = np.argsort(ids)
    return ids[order], X[order]


def ivf_rebalance(
    idx: _CachedIndex,
    *,
    max_ratio: float = 8.0,
    target_ratio: float = 2.0,
    n_train: int = 4096,
    iters: int = 3,
    max_split: int = 8,
) -> RebalanceResult:
    """Split hot cells of a drifted/appended index — the action answering
    :func:`ivf_cell_stats`'s signal (the ~8× max/mean trigger documented on
    :func:`ivf_append`), closing the append loop without a full retrain.

    Mechanics, all bounded:

    - ONE k-row collect of per-cell counts finds cells whose population
      exceeds ``max_ratio`` × mean (mean over ALL quantizer cells, so empty
      cells count — drift that hollows out cells raises the pressure on the
      hot ones, as it should).
    - Per hot cell, a local deterministic Lloyd (the :func:`ivf_train`
      recipe) on ``n_train`` members drawn evenly across the cell's id
      range (:func:`_cell_sample` — so an appended high-id pile is
      represented even when the cell had ≥ n_train tenured rows) fits
      ``ceil(pop / (target_ratio × mean))`` ≤ ``max_split`` sub-centroids —
      a bounded driver-side sample per hot cell, exactly like training.
    - Cell ids are STABLE: the first sub-centroid takes the parent's row in
      the centroid matrix, the rest append at the end. Cold cells keep
      their ids, are never reassigned and never rewritten, so a durable
      index rewrites only hot partitions and partition pruning is
      unchanged.
    - Only hot-cell rows are reassigned (one map-only pass over those cells,
      each vector restricted to its parent's sub-centroid family) — cost is
      O(hot rows), not O(index).

    Probes against the result score the same true cosines over finer
    cells. Probe-budget contract: keep ``n_probe / n_centroids`` roughly
    constant across a rebalance (e.g. ``ceil(n_probe * k_new / k_old)``) —
    splitting shrinks each cell's coverage, so a FIXED n_probe scans a
    smaller fraction of the space and recall decays with every split
    (measured: 0.96 → 0.88 on the fixture with n_probe frozen at 6 while
    16 → 19 cells; restored at the scaled budget). With the scaled budget
    the probe's work is unchanged — the same fraction of a now
    better-balanced index — which is the whole point of the split.
    """
    k_old = len(idx.centroids)
    counts = {r.cell: r.n for r in ivf_cell_stats(idx.indexed).collect()}
    total = sum(counts.values())
    if not total:
        return RebalanceResult(idx, {})
    mean = total / k_old
    hot = sorted(c for c, n in counts.items() if n > max_ratio * mean)
    if not hot:
        return RebalanceResult(idx, {})

    centroids = [c.copy() for c in idx.centroids]
    split: dict[int, list[int]] = {}
    families: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for c in hot:
        n_sub = int(min(max_split, max(2, np.ceil(counts[c] / (target_ratio * mean)))))
        _, X = _cell_sample(idx.indexed, c, n_train)
        n_sub = min(n_sub, len(X))
        sub = _local_lloyd(X, n_sub, iters)
        ids = [c] + list(range(len(centroids), len(centroids) + n_sub - 1))
        centroids[c] = sub[0]
        centroids.extend(sub[1:])
        split[c] = ids
        families[c] = (np.array(ids, dtype=np.int32), _normalize(sub))

    def reassign(v: pd.Series, cell: pd.Series) -> pd.Series:
        M = _normalize(np.stack(v.to_numpy()).astype(np.float64))
        cells = cell.to_numpy()
        out = np.empty(len(cells), dtype=np.int32)
        for parent, (ids, C) in families.items():
            m = cells == parent
            if m.any():
                out[m] = ids[np.argmax(M[m] @ C.T, axis=1)]
        return pd.Series(out)

    reassign_udf = F.pandas_udf(reassign, "int")
    hot_rows = idx.indexed.filter(F.col("cell").isin(hot)).select(
        "neighbor_id",
        "b_vec",
        reassign_udf("b_vec", "cell").alias("cell"),
    )
    cold_rows = idx.indexed.filter(~F.col("cell").isin(hot))
    new_idx = _CachedIndex(
        centroids=np.stack(centroids),
        indexed=cold_rows.unionByName(hot_rows),
    )
    return RebalanceResult(new_idx, split)


def rebalance_ivf_index(spark, path: str, **kwargs) -> dict[int, list[int]]:
    """Durable form of :func:`ivf_rebalance`: split the saved index's hot
    cells in place and return the split map (empty = nothing was hot, no
    write happened).

    Only the AFFECTED partitions are rewritten (dynamic partition
    overwrite: the hot parents plus the appended sub-cells); cold ``cell=N``
    directories are untouched, so the probe-side PartitionFilters contract
    survives the rebalance exactly as it survives appends. One edge needs
    explicit cleanup: a hot parent whose rows ALL moved to new sub-cells
    has no rows in the written data, so dynamic overwrite never touches its
    ``cell=N`` directory and the stale files would double-count those
    neighbors on probe — detected with one bounded aggregate before
    writing, and the emptied parent directories are deleted (Hadoop
    FileSystem, so it works on any cluster store) after the write commits.
    The delete is a separate action after the commit, so a crash between
    the two can leave a stale parent dir whose rows duplicate the moved
    sub-cell copies. That window is NOT self-healing: a later rebalance
    only deletes parents *it* empties, so a no-longer-hot stale parent
    keeps its duplicates until repaired. After any crash mid-rebalance,
    run :func:`check_ivf_index` — it detects duplicated neighbor_ids with
    one aggregate and names the offending cells; deleting those ``cell=N``
    directories (the copy NOT nearest its centroid is the stale one, which
    for a split is always the parent) restores the invariant. This is the
    same non-transactional contract every bare-parquet layout has.
    """
    idx = load_ivf_index(spark, path)
    res = ivf_rebalance(idx, **kwargs)
    if not res.split:
        return {}
    new = res.index
    affected = sorted(
        {c for ids in res.split.values() for c in ids} | set(res.split)
    )
    changed = new.indexed.filter(F.col("cell").isin(affected))
    # A changed ROW set that leaves a parent partition empty can't be
    # expressed as a dynamic partition overwrite — check first (k-row agg).
    changed_counts = {
        r.cell: r.n for r in ivf_cell_stats(changed).collect()
    }
    parents_emptied = [c for c in res.split if not changed_counts.get(c)]
    prev_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        changed.write.partitionBy("cell").mode("overwrite").parquet(
            f"{path}/cells"
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    if parents_emptied:
        # Dynamic overwrite replaces only the partitions PRESENT in the
        # written data; an emptied parent has none, so its stale directory
        # must be deleted explicitly or the reloaded index would return
        # those neighbors twice on probe.
        hconf = spark._jsc.hadoopConfiguration()
        jpath = spark._jvm.org.apache.hadoop.fs.Path
        for c in parents_emptied:
            p = jpath(f"{path}/cells/cell={c}")
            p.getFileSystem(hconf).delete(p, True)
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(new.centroids)]
    spark.createDataFrame(
        rows, "cell int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    return res.split


# Memoized per-base-table index; keyed by the base plan + build params so a
# different table or config trains its own index.
_INDEX_CACHE: dict[tuple, _CachedIndex] = {}


def build_ivf_index(
    base: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    iters: int = 3,
    cache_key: str | None = None,
) -> _CachedIndex:
    """Train + index once, persist the assignment, memoize. ``cache_key``
    (e.g. the source path) scopes reuse; None disables memoization."""
    key = (cache_key, id_col, vec_col, n_centroids, iters)
    if cache_key is not None and key in _INDEX_CACHE:
        return _INDEX_CACHE[key]
    centroids = ivf_train(
        base, id_col=id_col, vec_col=vec_col, k=n_centroids, iters=iters
    )
    indexed = ivf_index(base, centroids, id_col=id_col, vec_col=vec_col).persist()
    built = _CachedIndex(centroids=centroids, indexed=indexed)
    if cache_key is not None:
        _INDEX_CACHE[key] = built
    return built


def ivf_topk(
    base: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 6,
    iters: int = 3,
    cache_key: str | None = None,
) -> DataFrame:
    """IVF-Flat top-k = build (memoized when ``cache_key`` given) + probe."""
    idx = build_ivf_index(
        base,
        id_col=id_col,
        vec_col=vec_col,
        n_centroids=n_centroids,
        iters=iters,
        cache_key=cache_key,
    )
    return ivf_probe(
        idx.indexed,
        idx.centroids,
        queries,
        id_col=id_col,
        vec_col=vec_col,
        k=k,
        n_probe=n_probe,
    )
