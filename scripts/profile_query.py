#!/usr/bin/env python
"""Per-job/stage profile of one headline query via the Spark event log.

Usage: python scripts/profile_query.py <query> [sf_dir] [--runs N]

Runs the query to the noop sink N times (first run warms JIT/footers), with
``spark.eventLog.enabled`` on, then parses the event log into a per-job and
per-stage breakdown: wall time, task time, shuffle bytes, task counts.
This substitutes for the Spark UI (disabled in this environment) — guide §1
"measure first" / §7.1.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

EVDIR = "/tmp/spark-events"


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    runs = 2
    for i, a in enumerate(sys.argv):
        if a == "--runs":
            runs = int(sys.argv[i + 1])

    import shutil

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    from pyspark.sql import SparkSession

    from stupidb_spark.queryset import QUERIES

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file://{EVDIR}")
        .config("spark.eventLog.compress", "false")
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
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sc = spark.sparkContext
    for r in range(runs):
        sc.setJobDescription(f"{name}#run{r}")
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        print(f"run {r}: {time.perf_counter() - t0:.3f}s", flush=True)
    sc.setJobDescription(None)
    app_id = sc.applicationId
    spark.stop()

    # parse (Spark 4: rolling dir eventlog_v2_<appid>/events_* or flat file)
    path = os.path.join(EVDIR, app_id)
    if not os.path.exists(path):
        path = os.path.join(EVDIR, f"eventlog_v2_{app_id}")
    files = (
        sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.startswith("events_")
        )
        if os.path.isdir(path)
        else [path]
    )
    jobs = {}
    stages = {}
    lines = []
    for p in files:
        if p.endswith(".zstd"):
            import subprocess

            raw = subprocess.run(
                ["zstd", "-dc", p], capture_output=True, check=True
            ).stdout.decode()
            lines.extend(raw.splitlines())
        else:
            lines.extend(open(p).read().splitlines())
    if True:
        for line in lines:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "desc": ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    ),
                    "t0": ev["Submission Time"],
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["ms"] = ev["Completion Time"] - jobs[jid]["t0"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                acc = {a["Name"]: a for a in si.get("Accumulables", [])}

                def val(n):
                    a = acc.get(n)
                    if a is None:
                        return 0
                    try:
                        return int(a.get("Value", 0))
                    except (TypeError, ValueError):
                        return 0

                stages[sid] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "tasks": si["Number of Tasks"],
                    "ms": (si.get("Completion Time") or 0)
                    - (si.get("Submission Time") or 0),
                    "shuf_w": val("internal.metrics.shuffle.write.bytesWritten"),
                    "shuf_r": val(
                        "internal.metrics.shuffle.read.remoteBytesRead"
                    )
                    + val("internal.metrics.shuffle.read.localBytesRead"),
                    "task_ms": val("internal.metrics.executorRunTime"),
                    "py_ms": val("internal.metrics.executorDeserializeTime"),
                }

    by_run: dict[str, list] = {}
    for jid in sorted(jobs):
        j = jobs[jid]
        by_run.setdefault(j["desc"], []).append((jid, j))
    for desc, js in by_run.items():
        tot = sum(j.get("ms", 0) for _, j in js)
        print(f"\n== {desc or '(no desc)'}: {len(js)} jobs, {tot} ms total ==")
        for jid, j in js:
            sids = [s for s in j["stages"] if s in stages]
            print(f"  job {jid}: {j.get('ms', '?')} ms, {len(j['stages'])} stages")
            for sid in sids:
                s = stages[sid]
                print(
                    f"    stage {sid}: {s['ms']} ms wall, {s['task_ms']} ms task, "
                    f"{s['tasks']} tasks, shufW {s['shuf_w']}, shufR {s['shuf_r']} | {s['name']}"
                )


if __name__ == "__main__":
    main()
