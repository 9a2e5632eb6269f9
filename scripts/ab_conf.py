#!/usr/bin/env python
"""Interleaved A/B of arbitrary session-conf overrides vs stock engine conf.

Usage: python scripts/ab_conf.py q1,q2 "key=val;key2=val2" [--cycles N] [--runs M]

Config A = get_session defaults + overrides; config B = get_session defaults.
Alternates fresh sessions A,B per cycle, reports per-config min per query.
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def session(overrides: dict[str, str]):
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-conf")
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
    )
    for k, v in overrides.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main() -> None:
    names = sys.argv[1].split(",")
    overrides = dict(
        kv.split("=", 1) for kv in sys.argv[2].split(";") if kv
    )
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
        for use_overrides in (True, False):
            spark = session(overrides if use_overrides else {})
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
                    if r > 0:
                        key = (name, use_overrides)
                        best[key] = min(best.get(key, 1e9), dt)
            spark.stop()
        print(f"-- cycle {c} done", flush=True)
    print(f"{'query':30s} {'override':>10s} {'stock':>10s}  ratio")
    for name in names:
        a, b = best[(name, True)], best[(name, False)]
        print(f"{name:30s} {a:10.3f} {b:10.3f}  {a/b:5.2f}", flush=True)


if __name__ == "__main__":
    main()
