#!/usr/bin/env python
"""Capture .explain("formatted") for headline queries into plans/r15/.

Usage: python scripts/capture_plans.py <suffix> [name,...]

Writes plans/r15/<query>_<suffix>.txt for each requested headline query
(default: all). The streaming gate queries RUN their staged stream when the
callable is invoked and return a read-back scan, so their formatted plan is
the read-back only — their evidence lives in bench timings + code; they are
skipped here unless named explicitly.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from stupidb_spark.queryset import QUERIES
from stupidb_spark.session import get_session

# Queries whose callable runs a real staged stream (or writes a batch
# artifact) as a side effect; the returned DataFrame is a parquet read-back,
# so the formatted plan carries no optimization signal.
STREAM_GATES = {
    "stream_quality_gate",
    "stream_knn_label",
    "stream_knn_label_join",
    "stream_events_tumbling",
    "stream_events_sliding",
    "stream_events_session",
    "stream_events_session_append",
    "sketch_events_daily",
}


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import HEADLINE

    names = only or [n for n in HEADLINE if n not in STREAM_GATES]
    out_dir = os.path.join(_REPO, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session("stupidb-spark-plans")
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        text = df._jdf.queryExecution().explainString(mode)
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        print(name, "ok", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
