#!/usr/bin/env python
"""Isolated fan-out re-probe: one query per fresh session, alternating
narrow (32) / wide (2000) shuffle partitions, N rounds each, min per
mode — the adjudication protocol from SCALE.md round 14 ("probe-hygiene
lesson": shared-session ratios are flags, isolated re-probes decide).

Usage: python scripts/fanout_isolated.py q1,q2 [rounds] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def run_once(name: str, sf_dir: str, partitions: int) -> float:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", str(partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .appName(f"fanout-iso-{partitions}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from stupidb_spark.queryset import QUERIES

    QUERIES["tpch_q1"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # warm run of the probed query itself, then the timed run — isolates
    # codegen/JIT from the fan-out measurement
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    t0 = time.time()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    spark.stop()
    return round(dt, 3)


def main() -> None:
    names = sys.argv[1].split(",")
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    for name in names:
        narrow, wide = [], []
        for _ in range(rounds):
            narrow.append(run_once(name, sf_dir, 32))
            wide.append(run_once(name, sf_dir, 2000))
        r = min(wide) / min(narrow)
        print(
            f"{name:28s} narrow={narrow} wide={wide} "
            f"ratio(min/min)={r:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
