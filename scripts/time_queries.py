#!/usr/bin/env python
"""Quick A/B timer: run named headline queries to the noop sink, min-of-N.

Usage: python scripts/time_queries.py q1,q2,... [--runs N] [--fingerprint]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    names = sys.argv[1].split(",")
    runs = 2
    fp = "--fingerprint" in sys.argv
    for i, a in enumerate(sys.argv):
        if a == "--runs":
            runs = int(sys.argv[i + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from stupidb_spark.queryset import QUERIES
    from stupidb_spark.session import get_session

    spark = get_session("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py
    QUERIES["tpch_q1"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    for name in names:
        samples = []
        for r in range(runs + 1):
            spark.sparkContext.setJobDescription(f"{name}#r{r}")
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        # drop the first (warm) sample, report min of the rest
        line = f"{name:34s} best={min(samples[1:]):6.3f}s  all={[round(s,3) for s in samples]}"
        if fp:
            rows = sorted(repr(tuple(r)) for r in QUERIES[name](spark, sf_dir).collect())
            line += f"  rows={len(rows)} hash={hashlib.sha256(chr(10).join(rows).encode()).hexdigest()[:16]}"
        print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
