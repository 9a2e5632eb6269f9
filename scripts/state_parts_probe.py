#!/usr/bin/env python
"""Probe: streaming-gate wall time vs state-partition count.

Usage: python scripts/state_parts_probe.py <gate> <parts>[,parts...] [--runs N]

Monkeypatches the two stream runners so ``state_partitions`` takes the
probed value, runs the full gate callable (stage → stream → read-back →
noop write, the bench-timed region), and reports wall seconds plus a
result fingerprint (row count + sorted-row hash) so any probe value that
changed the output is caught immediately.
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
    gate = sys.argv[1]
    parts_list = [int(p) for p in sys.argv[2].split(",")]
    runs = 2
    for i, a in enumerate(sys.argv):
        if a == "--runs":
            runs = int(sys.argv[i + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from stupidb_spark.queryset import QUERIES
    from stupidb_spark.session import get_session
    from stupidb_spark.streaming import events as ev
    from stupidb_spark.queryset import streamgate as sg

    spark = get_session("state-parts-probe")
    spark.sparkContext.setLogLevel("ERROR")

    orig_idem = ev.run_to_parquet_idempotent
    orig_epochs = ev.run_complete_to_parquet_epochs
    override = {"v": None}

    def idem(df, path, *, checkpoint_dir, state_partitions=None):
        sp = override["v"] if override["v"] is not None else state_partitions
        return orig_idem(df, path, checkpoint_dir=checkpoint_dir, state_partitions=sp)

    def epochs(df, path, *, checkpoint_dir, state_partitions=None, max_sink_files=32):
        sp = override["v"] if override["v"] is not None else state_partitions
        return orig_epochs(
            df, path, checkpoint_dir=checkpoint_dir,
            state_partitions=sp, max_sink_files=max_sink_files,
        )

    sg.run_to_parquet_idempotent = idem
    sg.run_complete_to_parquet_epochs = epochs

    def fingerprint(df):
        rows = sorted(repr(tuple(r)) for r in df.collect())
        h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
        return len(rows), h

    # warm (footers, JIT) at default partitioning
    QUERIES[gate](spark, sf_dir).write.format("noop").mode("overwrite").save()

    base_fp = None
    for p in parts_list:
        override["v"] = p
        best = None
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"{gate}@parts={p}#r{r}")
            t0 = time.perf_counter()
            df = QUERIES[gate](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        fp = fingerprint(QUERIES[gate](spark, sf_dir))
        if base_fp is None:
            base_fp = fp
        print(
            f"parts={p:4d}  best={best:6.3f}s  rows={fp[0]}  hash={fp[1]}"
            f"  match={'OK' if fp == base_fp else 'MISMATCH'}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
