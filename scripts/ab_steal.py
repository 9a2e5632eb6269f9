#!/usr/bin/env python
"""Steal-aware interleaved A/B of session-conf overrides vs stock conf.

Like ab_conf.py, but every individual run is stamped with the host steal%
measured across that run (from /proc/stat), and the report shows, per
(query, config): min over CLEAN runs (steal <= --max-steal, default 1.0%),
min over all runs, and the clean-run count. On a host with foreign steal
bursts this separates code effects from burst pollution: a verdict is only
trustworthy when both configs have clean runs.

Usage:
    python scripts/ab_steal.py q1,q2 "key=val;key2=val2" \
        [--cycles N] [--runs M] [--max-steal PCT]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def _cpu_ticks() -> tuple[int, int]:
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return v[7], sum(v)  # steal, total


def session(overrides: dict[str, str]):
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-steal")
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
    import argparse

    p = argparse.ArgumentParser(
        description="Steal-aware interleaved A/B of conf overrides vs stock."
    )
    p.add_argument("queries", help="comma-separated headline query names")
    p.add_argument(
        "overrides", help='conf overrides as "key=val;key2=val2" ("" = none)'
    )
    p.add_argument("--cycles", type=int, default=3)
    p.add_argument("--runs", type=int, default=2)
    p.add_argument("--max-steal", type=float, default=1.0, dest="max_steal")
    args = p.parse_args()
    names = args.queries.split(",")
    overrides = dict(
        kv.split("=", 1) for kv in args.overrides.split(";") if kv
    )
    cycles, runs, max_steal = args.cycles, args.runs, args.max_steal
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from stupidb_spark.queryset import QUERIES

    # samples[(name, is_override)] = list of (seconds, steal_pct)
    samples: dict[tuple[str, bool], list[tuple[float, float]]] = {}
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
                    s0, t0 = _cpu_ticks()
                    w0 = time.perf_counter()
                    QUERIES[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    wall = time.perf_counter() - w0
                    s1, t1 = _cpu_ticks()
                    steal = 100.0 * (s1 - s0) / max(1, t1 - t0)
                    if r == 0:
                        continue  # warm-up run per session
                    samples.setdefault((name, use_overrides), []).append(
                        (wall, steal)
                    )
            spark.stop()
        print(f"-- cycle {c} done", flush=True)

    print(
        f"{'query':32s} {'ovr_clean':>9} {'stk_clean':>9} {'ratio':>6} "
        f"{'ovr_all':>8} {'stk_all':>8}  clean_n(ovr/stk)"
    )
    for name in names:
        row = {}
        for ovr in (True, False):
            ss = samples.get((name, ovr), [])
            clean = [w for w, st in ss if st <= max_steal]
            row[ovr] = (
                min(clean) if clean else float("nan"),
                min(w for w, _ in ss) if ss else float("nan"),
                len(clean),
            )
        oc, oa, on = row[True]
        sc, sa, sn = row[False]
        ratio = oc / sc if sc == sc and oc == oc and sc > 0 else float("nan")
        print(
            f"{name:32s} {oc:9.3f} {sc:9.3f} {ratio:6.2f} "
            f"{oa:8.3f} {sa:8.3f}  {on}/{sn}"
        )
    for (name, ovr), ss in sorted(samples.items()):
        tag = "ovr" if ovr else "stk"
        detail = ", ".join(f"{w:.2f}@{st:.1f}%" for w, st in ss)
        print(f"  {name} [{tag}]: {detail}")


if __name__ == "__main__":
    main()
