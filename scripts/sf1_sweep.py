#!/usr/bin/env python
"""Full sf1 oracle sweep (VERDICT r11 "Next round" #4): run EVERY oracled
query in the registry at the sf1 fixture and hash-compare against DuckDB,
driver-identically (same value_hash/_canon as scripts/gate_check.py).

The capped-oracle rewrite (round 11) removed the last structural blocker —
oracle and engine now cap identically at every scale — so the remaining
question per query is only whether DUCKDB's side is tractable at 50k docs /
6M lineitem / 20k embeddings. Each oracle runs on a watchdog thread with a
bounded budget (default 300 s, SPARK_GRAFT_SF1_ORACLE_TIMEOUT overrides);
an oracle that exceeds it is interrupted and recorded as
``SKIP(oracle-timeout)`` with its elapsed time — a *DuckDB* envelope, not
an engine failure (the Spark side completed; its timing is recorded).

Usage: python scripts/sf1_sweep.py [sf_dir] [--only name,...]
Prints one line per query and a trailing summary; exit 1 on any MISMATCH.
"""

from __future__ import annotations

import os
import sys
import threading
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from gate_check import TABLES, value_hash  # noqa: E402


def main() -> int:
    argv = list(sys.argv[1:])
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = argv[i + 1].split(",")
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else os.path.join(_REPO, ".scratch", "sf1")
    budget = float(os.environ.get("SPARK_GRAFT_SF1_ORACLE_TIMEOUT", "300"))

    import duckdb

    from stupidb_spark.oracle_checks import oracle_type_violations
    from stupidb_spark.queryset import ORACLES, QUERIES
    from stupidb_spark.session import get_session

    spark = get_session("sf1-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    names = [n for n in (only or list(QUERIES)) if n in ORACLES]
    unknown = [n for n in (only or []) if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 1

    failures: list[str] = []
    skips: list[str] = []
    for pos, name in enumerate(names):
        t0 = time.perf_counter()
        sdf = QUERIES[name](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        t_spark = time.perf_counter() - t0
        cols = sorted(sdf.columns)

        result: dict = {}
        # Per-query cursor: DuckDB connections are not safe for concurrent
        # use, so a watchdog-interrupted query must not share its handle
        # with the next one. A cursor() is a cheap child connection over
        # the same catalog (the views are visible); interrupting it leaves
        # the parent untouched.
        qcon = con.cursor()

        def run_oracle() -> None:
            try:
                cur = qcon.execute(ORACLES[name])
                result["rows"] = cur.fetchall()
                result["names"] = [d[0] for d in cur.description]
            except Exception as e:  # interrupt lands here too
                result["err"] = repr(e)

        t1 = time.perf_counter()
        th = threading.Thread(target=run_oracle, daemon=True)
        th.start()
        th.join(budget)
        if th.is_alive():
            qcon.interrupt()
            th.join(30)
            if th.is_alive():
                # The worker is wedged past interrupt: abort rather than
                # run anything else concurrently with it. Remaining
                # queries are recorded as skips so the log stays complete.
                # qcon deliberately NOT closed here — the wedged worker
                # thread still owns the handle.
                rest = names[pos:]
                skips.extend(rest)
                for r in rest:
                    print(f"{r:28s} SKIP(sweep-aborted: wedged oracle)")
                break
            qcon.close()  # worker joined: release the child connection
            print(
                f"{name:28s} SKIP(oracle-timeout>{budget:.0f}s) "
                f"spark={t_spark:.1f}s spark_rows={len(srows)}"
            , flush=True)
            skips.append(name)
            continue
        qcon.close()  # worker joined: release the child connection
        t_duck = time.perf_counter() - t1
        if "err" in result:
            if "interrupt" in result["err"].lower():
                print(
                    f"{name:28s} SKIP(oracle-timeout>{budget:.0f}s) "
                    f"spark={t_spark:.1f}s spark_rows={len(srows)}"
                )
                skips.append(name)
            else:
                print(f"{name:28s} ORACLE-ERROR {result['err'][:120]}", flush=True)
                failures.append(name)
            continue

        orows, onames = result["rows"], result["names"]
        type_problems = oracle_type_violations(con, ORACLES[name], sdf.schema)
        shash = value_hash(srows, sdf.columns, cols)
        ohash = value_hash(orows, onames, cols)
        ok = (
            len(srows) == len(orows)
            and sorted(onames) == cols
            and shash == ohash
            and not type_problems
        )
        tag = "OK" if ok else "MISMATCH"
        extra = ""
        if not ok:
            extra = (
                f" spark_rows={len(srows)} oracle_rows={len(orows)}"
                f" schema={sorted(onames) == cols} hash={shash == ohash}"
                f" types={type_problems or 'ok'}"
            )
            failures.append(name)
        print(
            f"{name:28s} {tag} rows={len(srows)} "
            f"spark={t_spark:.1f}s duck={t_duck:.1f}s{extra}", flush=True
        )

    print(
        f"\n{len(names) - len(failures) - len(skips)}/{len(names)} green; "
        f"skips(oracle-timeout): {skips}; failures: {failures}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
