#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Runs a representative cross-section of the declared query inventory (one per
operator family — scan/agg, joins, windows, sort, dedup, similarity, text,
event-time) and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced with a `noop` datasource write (full pipeline runs, no
driver-side collect — the same discipline we'd use on a cluster).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from stupidb_spark.queryset import QUERIES
from stupidb_spark.session import get_session

HEADLINE = [
    "tpch_q1",
    "agg_grouped_stats",
    "agg_rollup",
    "agg_udaf_sum_sq",
    "join_inner_star",
    "join_fact_fact",
    "join_semi_exists",
    "win_running_sum",
    "win_stat_frames",
    "win_rank",
    "win_dynamic_lag",
    "sort_topk",
    "setop_except_all",
    "events_sliding",
    "events_session",
    "asof_join_orders",
    "range_join_buckets",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "multimodal_features",
    "text_token_stats",
    "text_quality",
    "text_lang_id",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_session("stupidb-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers so per-query timings measure the plan,
    # not first-touch JIT/IO (the driver's baseline does the same)
    QUERIES["tpch_q1"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        start = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
