#!/usr/bin/env python
"""Isolate the knn_join per-query top-k merge: materialize the candidate
relation once, then A/B merge strategies in one session.

Variants:
  agg      — slice(sort_array(collect_list(struct)), 1, k) + posexplode (stock)
  agghi    — stock, with objectHashAggregate fallback threshold raised
  window   — row_number window over (query) ordered by (sim DESC, neighbor)
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from stupidb_spark.session import get_session
    from stupidb_spark.sources import load_table

    spark = get_session("ab-topk")
    spark.sparkContext.setLogLevel("ERROR")

    # Build the real candidate relation by running knn_join's pipeline up
    # to the task scorer, then materialize it so the A/B times ONLY the
    # merge step.
    import stupidb_spark.operators.knn as K

    emb = load_table(spark, sf_dir, "embeddings")
    # monkey-patch-free: replicate the cand construction via knn_join
    # internals is brittle; instead run knn_join and strip its tail by
    # rebuilding: we call knn_join but materialize candidates via the
    # exposed pipeline. Simplest: run the full knn_join once and ALSO
    # materialize the pre-merge relation by re-deriving it here.
    # We time the merge over a parquet-backed cand table.
    cand_path = "/tmp/ab_topk_cand"
    import shutil

    shutil.rmtree(cand_path, ignore_errors=True)

    # Re-derive cand exactly as knn_join does (self-join form).
    import numpy as np
    import pandas as pd

    from stupidb_spark.operators.dedup import spread_small_scan
    from stupidb_spark.operators.ivf import _normalize, ivf_index, ivf_train
    from stupidb_spark.operators.lineage import cut_lineage
    from stupidb_spark.operators.similarity import (
        QUANT_SCALE,
        _qdot,
        _quant_sims,
        norm_guard,
    )

    base = emb
    n_cells = K.derive_n_cells(base.count())
    centroids = ivf_train(base, id_col="vec_id", vec_col="embedding", k=n_cells, iters=3, n_train=4096)
    C = _normalize(centroids.astype(np.float64))
    indexed = ivf_index(base, centroids, id_col="vec_id", vec_col="embedding")
    b = norm_guard(
        indexed.select(
            F.col("neighbor_id").alias("id"),
            F.col("b_vec").cast("array<double>").alias("vec"),
            "cell",
        ),
        "knn_join",
    )
    max_block = 2048
    n_probe = 4
    k = 5
    cell_counts = b.groupBy("cell").agg(F.count(F.lit(1)).alias("__n"))
    cell_s = cell_counts.select(
        "cell", F.ceil(F.col("__n") / F.lit(max_block)).cast("int").alias("__s")
    )
    qraw = spread_small_scan(
        norm_guard(
            base.select(F.col("vec_id").alias("id"), F.col("embedding").cast("array<double>").alias("vec")),
            "knn_join",
        )
    )

    def _probe_fn(v):
        M = _normalize(np.stack(v.to_numpy()).astype(np.float64))
        sims = M @ C.T
        top = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series([[int(c) for c in row] for row in top])

    probe = F.pandas_udf(_probe_fn, "array<int>")

    qprobed = cut_lineage(qraw.withColumn("cell", F.explode(probe(F.col("vec")))), eager=False)
    qcnt = qprobed.groupBy("cell").agg(F.count(F.lit(1)).alias("__qn"))
    cell_tasks = cell_s.join(qcnt, "cell", "left").select(
        "cell", "__s",
        F.coalesce(F.ceil(F.col("__qn") / F.lit(max_block)).cast("int"), F.lit(1)).alias("__qc"),
    )
    b2 = b.join(F.broadcast(cell_tasks), "cell").select(
        "cell",
        F.pmod(F.xxhash64("id"), F.col("__s")).cast("int").alias("sub"),
        F.explode(F.sequence(F.lit(0), F.col("__qc") - F.lit(1))).alias("qc"),
        "id", "vec", F.lit(True).alias("is_base"),
    )
    q2 = qprobed.join(F.broadcast(cell_tasks), "cell").select(
        "cell",
        F.explode(F.sequence(F.lit(0), F.col("__s") - F.lit(1))).alias("sub"),
        F.pmod(F.xxhash64("id"), F.col("__qc")).cast("int").alias("qc"),
        "id", "vec", F.lit(False).alias("is_base"),
    )
    tasks_input = b2.unionByName(q2)
    id_type = dict(tasks_input.dtypes)["id"]
    cand_schema = f"query {id_type}, neighbor {id_type}, sim double"

    def task(key, pdf):
        Bp = pdf[pdf["is_base"]]
        Qp = pdf[~pdf["is_base"]]
        if len(Bp) == 0 or len(Qp) == 0:
            return pd.DataFrame({"query": [], "neighbor": [], "sim": []}).astype({"sim": "float64"})
        Bm = np.stack(Bp["vec"].to_numpy()).astype(np.float64)
        Qm = np.stack(Qp["vec"].to_numpy()).astype(np.float64)
        b_ids = Bp["id"].to_numpy()
        q_ids = Qp["id"].to_numpy()
        qnorms = np.sqrt(_qdot(Qm, Qm).astype(np.float64) / QUANT_SCALE)
        sims = _quant_sims(Bm, Qm, qnorms)
        out_q, out_n, out_s = [], [], []
        for j in range(len(q_ids)):
            col = sims[:, j]
            mask = b_ids != q_ids[j]
            ids_j = b_ids[mask]
            col_j = col[mask]
            if len(ids_j) == 0:
                continue
            order = np.lexsort((ids_j, -col_j))[:k]
            out_q.append(np.repeat(q_ids[j], len(order)))
            out_n.append(ids_j[order])
            out_s.append(col_j[order])
        if not out_q:
            return pd.DataFrame({"query": [], "neighbor": [], "sim": []}).astype({"sim": "float64"})
        return pd.DataFrame({
            "query": np.concatenate(out_q),
            "neighbor": np.concatenate(out_n),
            "sim": np.concatenate(out_s),
        })

    cand = tasks_input.groupBy("cell", "sub", "qc").applyInPandas(task, cand_schema)
    cand.write.parquet(cand_path)
    candr = spark.read.parquet(cand_path)
    print("cand rows:", candr.count(), flush=True)

    def merge_agg(c):
        top = c.groupBy("query").agg(
            F.slice(
                F.sort_array(
                    F.collect_list(F.struct((-F.col("sim")).alias("s"), F.col("neighbor").alias("n")))
                ), 1, k,
            ).alias("top")
        )
        return top.select(
            F.col("query").alias("query_id"),
            F.posexplode("top").alias("__pos", "__t"),
        ).select(
            "query_id", (F.col("__pos") + 1).alias("rank"),
            F.col("__t.n").alias("neighbor_id"), (-F.col("__t.s")).alias("cosine_sim"),
        )

    def merge_window(c):
        w = Window.partitionBy("query").orderBy(F.col("sim").desc(), F.col("neighbor"))
        return (
            c.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(
                F.col("query").alias("query_id"), "rank",
                F.col("neighbor").alias("neighbor_id"), F.col("sim").alias("cosine_sim"),
            )
        )

    variants = [("agg", merge_agg, None), ("agghi", merge_agg, "1000000"), ("window", merge_window, None)]
    # warmup
    for name, fn, thr in variants:
        if thr: spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", thr)
        fn(candr).write.format("noop").mode("overwrite").save()
        if thr: spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")

    times = {n: [] for n, _, _ in variants}
    for r in range(rounds):
        for name, fn, thr in variants:
            if thr: spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", thr)
            spark.sparkContext.setJobDescription(f"{name}#r{r}")
            t0 = time.perf_counter()
            fn(candr).write.format("noop").mode("overwrite").save()
            times[name].append(round(time.perf_counter() - t0, 3))
            if thr: spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    # hash parity between variants
    import hashlib
    hashes = {}
    for name, fn, thr in variants:
        rows = sorted(repr(tuple(r)) for r in fn(candr).collect())
        hashes[name] = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    for name, ts in times.items():
        print(f"{name:8s} min={min(ts):6.3f}s med={sorted(ts)[len(ts)//2]:6.3f}s all={ts} hash={hashes[name]}")
    spark.stop()


if __name__ == "__main__":
    main()
