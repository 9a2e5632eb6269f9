#!/usr/bin/env python
"""Wide-cluster shuffle fan-out proxy (VERDICT r8 "what's missing" #3).

local[32] cannot measure real multi-node shuffle fan-out (netty transfer,
external shuffle service), but it CAN measure the one axis that scales
with cluster width and is visible in a single JVM: the number of shuffle
partitions every exchange writes and reads. A 1000-executor cluster runs
thousands of reducers; this probe runs the heaviest sf1 queries under
``spark.sql.shuffle.partitions`` = 32 (the tuned local record) and = 2000
(wide-cluster scale) in separate sequential sessions and reports the
per-query delta. What the comparison shows:

- the cost of tiny-partition overhead (task scheduling, file handles,
  shuffle index blocks) when partition count far exceeds data size — the
  penalty a mis-sized cluster config pays;
- whether any operator's correctness or plan shape depends on the
  partition count (it must not — AQE coalescing is expected to absorb
  most of the fan-out for these data sizes).

Usage: python scripts/shuffle_fanout_probe.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

QUERIES_TO_RUN = [
    "dedup_components",
    "dedup_canonical",
    "stream_quality_gate",
    "stream_knn_label",
    # round-11 paths: the stream-static labeling route and the sketch
    # table's persist/prune/rollup cycle
    "stream_knn_label_join",
    "sketch_events_daily",
    # round-12 paths: the events-family stream gate (complete-mode epoch
    # sink) and a second lineage-fixed iterative path (sample-train +
    # corpus Lloyd refine) alongside dedup_components/dedup_semantic —
    # the r11 checkpoint-truncation fix must hold at 2000 partitions
    "stream_events_tumbling",
    # round-13 paths: the sliding/session complete-mode gates at their
    # production shapes (state_partitions pinned per the r12 22× fix) and
    # the watermarked APPEND session route (state evicted as sessions
    # finalize — the state store count must track open sessions, not the
    # inherited shuffle width)
    "stream_events_sliding",
    "stream_events_session",
    "stream_events_session_append",
    "emb_kmeans_refine",
    "pipeline_training_mix",
    "ann_knn_join",
    "dedup_semantic",
    "dedup_ingest_candidates",
    "text_dup_spans",
    "dedup_simhash",
    "text_strip_dup_spans",
    "text_metrics",
    "dedup_components_lsh",
    "text_nb_lang",
    "text_lm_backoff",
    "tpch_q9",
    # round-14 paths: DSIR importance weighting (the heaviest new oracled
    # query: distinct-shingle explode -> bounded bucket aggregate ->
    # broadcast ratio table -> per-doc sum; 11 exchanges at sf0.1) and
    # the multimodal exact lanes (map-only Arrow decode pipelines — the
    # probe verifies the groupBy in frames_exact is the only exchange
    # that widens)
    "text_dsir_weights",
    # round-14 optimization paths: the side-tagged single-probe kNN
    # pipeline (classify shape) — the checkpoint + filter split must not
    # widen with the shuffle count
    "emb_knn_classify",
    "multimodal_features_exact",
    "multimodal_audio_exact",
    "multimodal_frames_exact",
]


def run_mode(sf_dir: str, partitions: int) -> dict[str, float]:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", str(partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .appName(f"fanout-{partitions}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from stupidb_spark.queryset import QUERIES

    # warm the JVM/codegen path once
    QUERIES["tpch_q1"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    out: dict[str, float] = {}
    for name in QUERIES_TO_RUN:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        out[name] = round(time.time() - t0, 3)
    spark.stop()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/root/repo/.scratch/shuffle_fanout.json"
    )
    narrow = run_mode(sf_dir, 32)
    wide = run_mode(sf_dir, 2000)
    report = {
        "sf_dir": sf_dir,
        "narrow_partitions": 32,
        "wide_partitions": 2000,
        "narrow": narrow,
        "wide": wide,
        "ratio": {
            k: round(wide[k] / narrow[k], 2) for k in narrow if narrow[k] > 0
        },
        "narrow_total": round(sum(narrow.values()), 2),
        "wide_total": round(sum(wide.values()), 2),
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
