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

# Make the repo importable regardless of the caller's cwd — including by the
# forked Python UDF workers, which resolve cloudpickled references to
# `stupidb_spark` via PYTHONPATH (set before the first worker forks).
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from stupidb_spark.queryset import QUERIES
from stupidb_spark.session import get_session

HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q17",
    "tpch_q18",
    "tpch_q4",
    "tpch_q12",
    "tpch_q14",
    "tpch_q19",
    "tpch_q22",
    "agg_grouped_stats",
    "agg_grouping_sets",
    "agg_udaf_sum_sq",
    "join_inner_star",
    "join_fact_fact",
    "join_semi_exists",
    "join_skew_replicate",
    "win_running_sum",
    "win_stat_frames",
    "win_rank",
    "win_navigation",
    "win_dynamic_frame",
    "sort_topk",
    "setop_six",
    "events_sliding",
    "events_session",
    "events_attribution",
    "events_props_json",
    "asof_join_orders",
    "range_join_buckets",
    "dedup_exact",
    "dedup_components",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "ann_topk_pq",
    "ann_topk_ivfpq",
    "multimodal_features",
    "text_token_stats",
    "text_metrics",
    "text_lang_id",
    "pipeline_prep",
    "chunk_documents",
    "contamination_ngram",
    "pii_redact",
    "prep_winsorize",
    "shuffle_deterministic",
    "terms_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_session("stupidb-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers + Python UDF worker pool so per-query
    # timings measure the plan, not first-touch JIT/IO/worker-fork (the
    # driver's baseline does the same)
    QUERIES["tpch_q1"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda s: s, "long")
    spark.range(1000).select(_warm("id")).write.format("noop").mode(
        "overwrite"
    ).save()

    # best-of-2 per query: steady-state timing, robust to noisy-neighbor
    # interference and first-plan codegen compile. Shuffle-exchange counts
    # per plan are recorded alongside so a timing regression is attributable
    # (did the plan change, or just the machine?).
    from stupidb_spark.plans import exchange_count

    timings: dict[str, float] = {}
    exchanges: dict[str, int] = {}
    for name in HEADLINE:
        samples = []
        for _ in range(2):
            start = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - start)
        # host CPU-steal on this box swings identical plans up to ~2×; when
        # the two samples disagree by >1.5× the measurement is suspect, so
        # buy ONE more sample for that query only (bounded extra cost)
        if max(samples) > 1.5 * min(samples):
            start = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - start)
        timings[name] = round(min(samples), 3)
        exchanges[name] = exchange_count(QUERIES[name](spark, sf_dir))

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "exchanges": exchanges,
        "sf": sf,
    }
    # Durable copy first: BENCH_r02's stdout line was truncated by the
    # driver's tail capture, losing the round's headline number. The file is
    # the record; stdout is the interface.
    with open(os.path.join(_REPO, "BENCH_LOCAL.json"), "w") as f:
        json.dump(payload, f)
        f.write("\n")
    # Quiesce Spark BEFORE printing so executor/teardown chatter can't land
    # after (or interleave with) the JSON line, then emit ONE compact line
    # (no exchanges dict — it lives in the file) as the very last stdout.
    spark.stop()
    line = json.dumps(
        {k: payload[k] for k in ("metric", "value", "unit", "queries", "sf")},
        separators=(",", ":"),
    )
    sys.stdout.flush()
    print(line, flush=True)


if __name__ == "__main__":
    sys.exit(main())
