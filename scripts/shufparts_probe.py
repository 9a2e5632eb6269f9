#!/usr/bin/env python
"""Probe: headline query wall time vs spark.sql.shuffle.partitions and AQE
coalesce settings. Usage:

  python scripts/shufparts_probe.py <query> <parts>[,...] [--pf] [--runs N]

--pf additionally sets spark.sql.adaptive.coalescePartitions.parallelismFirst=false
with advisoryPartitionSizeInBytes=1m for the LAST probed value (fresh session
per setting — these are session-start configs in effect).
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def run_one(name, sf_dir, shuffle_parts, pf_false, runs):
    from pyspark.sql import SparkSession

    from stupidb_spark.queryset import QUERIES

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("shufparts-probe")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(1024 * 1024))
    )
    if pf_false:
        b = b.config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false"
        ).config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["tpch_q1"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda s: s, "long")
    spark.range(1000).select(_warm("id")).write.format("noop").mode("overwrite").save()
    samples = []
    for r in range(runs + 1):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    tag = f"parts={shuffle_parts}" + (" pf=false adv=1m" if pf_false else "")
    print(
        f"{name:28s} {tag:24s} best={min(samples[1:]):6.3f}s all={[round(s,3) for s in samples]}",
        flush=True,
    )
    spark.stop()


def main() -> None:
    name = sys.argv[1]
    parts_list = [int(p) for p in sys.argv[2].split(",")]
    pf = "--pf" in sys.argv
    runs = 2
    for i, a in enumerate(sys.argv):
        if a == "--runs":
            runs = int(sys.argv[i + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for p in parts_list:
        run_one(name, sf_dir, p, False, runs)
    if pf:
        run_one(name, sf_dir, parts_list[0], True, runs)


if __name__ == "__main__":
    main()
