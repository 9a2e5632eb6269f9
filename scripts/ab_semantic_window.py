#!/usr/bin/env python
"""Interleaved same-session A/B: semantic_dedup survivor step as
groupBy+self-join (stock r13 form) vs whole-partition window (r14
candidate). Both variants run in ONE session, alternating, min-of-N —
the host-noise-proof protocol from OPTIMIZATION_r14.md."""

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

    from stupidb_spark.functions import exact as X
    from stupidb_spark.operators.dedup import corpus_join_strategy
    from stupidb_spark.operators import semantic as S
    from stupidb_spark.session import get_session
    from stupidb_spark.sources import load_table

    spark = get_session("ab-semantic")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")

    def labeled_df():
        # everything up to the survivor step, shared by both variants
        import numpy as np

        from stupidb_spark.operators.ivf import ivf_index, ivf_train
        from stupidb_spark.operators.lineage import cut_lineage
        from stupidb_spark.operators.components import connected_components
        from stupidb_spark.operators.similarity import (
            embedding_near_dup_pairs,
            pair_cosine,
        )

        centroids = ivf_train(
            emb, id_col="vec_id", vec_col="embedding", k=16, iters=3,
            n_train=4096,
        )
        indexed = cut_lineage(
            ivf_index(emb, centroids, id_col="vec_id", vec_col="embedding"),
            eager=False,
        )
        cent_df = spark.createDataFrame(
            [(int(i), [float(x) for x in centroids[i]]) for i in range(len(centroids))],
            "cell int, __centroid array<double>",
        )
        scored = indexed.join(F.broadcast(cent_df), "cell").select(
            F.col("neighbor_id").alias("node"),
            "cell",
            pair_cosine(F.col("b_vec"), F.col("__centroid")).alias("centroid_sim"),
        )
        pairs = embedding_near_dup_pairs(
            indexed.select(
                F.col("neighbor_id").alias("vec_id"),
                F.col("b_vec").alias("embedding"),
                "cell",
            ),
            id_col="vec_id", vec_col="embedding", block_col="cell",
            threshold=0.4, max_block=1024,
        )
        comp = connected_components(
            pairs.select("id_a", "id_b"), src="id_a", dst="id_b",
            nodes=indexed.select(F.col("neighbor_id").alias("node")),
        )
        return comp.hint(corpus_join_strategy()).join(
            scored.hint(corpus_join_strategy()), "node"
        )

    def stock(labeled):
        best = labeled.groupBy("component").agg(
            F.min_by(
                F.col("node"),
                F.struct(F.col("centroid_sim").alias("s"), F.col("node").alias("n")),
            ).alias("__keep_id")
        )
        return (
            labeled.hint(corpus_join_strategy())
            .join(best.hint(corpus_join_strategy()), "component")
            .select(
                F.col("node").alias("vec_id"), "cell", "component",
                X.dround(F.col("centroid_sim"), 9).alias("centroid_sim"),
                (F.col("node") == F.col("__keep_id")).alias("keep"),
            )
        )

    def windowed(labeled):
        keep_id = F.min_by(
            F.col("node"),
            F.struct(F.col("centroid_sim").alias("s"), F.col("node").alias("n")),
        ).over(Window.partitionBy("component"))
        return labeled.select(
            F.col("node").alias("vec_id"), "cell", "component",
            X.dround(F.col("centroid_sim"), 9).alias("centroid_sim"),
            (F.col("node") == keep_id).alias("keep"),
        )

    # warmup both
    for fn in (stock, windowed):
        fn(labeled_df()).write.format("noop").mode("overwrite").save()

    times = {"stock": [], "window": []}
    for r in range(rounds):
        for name, fn in (("stock", stock), ("window", windowed)):
            spark.sparkContext.setJobDescription(f"{name}#r{r}")
            t0 = time.perf_counter()
            fn(labeled_df()).write.format("noop").mode("overwrite").save()
            times[name].append(round(time.perf_counter() - t0, 3))
    for name, ts in times.items():
        print(f"{name:8s} min={min(ts):6.3f}s med={sorted(ts)[len(ts)//2]:6.3f}s all={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
