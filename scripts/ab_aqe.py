#!/usr/bin/env python
"""Interleaved A/B of the size-first AQE coalescing policy.

Alternates fresh sessions A (size-first: parallelismFirst=false, advisory
1m) and B (stock: parallelismFirst=true, advisory 64m) several times and
reports the per-config min per query — robust to the intermittent
hypervisor steal this host shows (min-of-N across interleaved sessions
samples past noise bursts; same methodology as the bench's best-of-N).

Usage: python scripts/ab_aqe.py q1,q2 [--cycles N] [--runs M]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def session(size_first: bool):
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-aqe")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(1024 * 1024))
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            "false" if size_first else "true",
        )
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "1m" if size_first else "64m",
        )
    )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main() -> None:
    names = sys.argv[1].split(",")
    cycles, runs = 2, 2
    for i, a in enumerate(sys.argv):
        if a == "--cycles":
            cycles = int(sys.argv[i + 1])
        if a == "--runs":
            runs = int(sys.argv[i + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from stupidb_spark.queryset import QUERIES

    best: dict[tuple[str, bool], float] = {}
    for c in range(cycles):
        for size_first in (True, False):
            spark = session(size_first)
            QUERIES["tpch_q1"](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            from pyspark.sql import functions as F

            _w = F.pandas_udf(lambda s: s, "long")
            spark.range(1000).select(_w("id")).write.format("noop").mode(
                "overwrite"
            ).save()
            for name in names:
                for r in range(runs + 1):
                    t0 = time.perf_counter()
                    QUERIES[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    dt = time.perf_counter() - t0
                    if r > 0:  # skip per-session first (cold) sample
                        key = (name, size_first)
                        best[key] = min(best.get(key, 1e9), dt)
            spark.stop()
        print(f"-- cycle {c} done", flush=True)
    print(f"{'query':30s} {'size-first':>10s} {'stock':>10s}  ratio")
    for name in names:
        a = best[(name, True)]
        b = best[(name, False)]
        print(f"{name:30s} {a:10.3f} {b:10.3f}  {a/b:5.2f}", flush=True)


if __name__ == "__main__":
    main()
