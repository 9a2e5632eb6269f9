#!/usr/bin/env python
"""Driver-style correctness gate rehearsal: run the first N registered
queries against their DuckDB oracles at sf0.01 and report row/hash matches.

Usage: python scripts/gate_check.py [N] [sf_dir] [--repeat R] [--only name,...] [--vanilla]

--repeat R re-executes each Spark query R times and diffs the value hashes
between runs: a query whose hash varies across runs is nondeterministic
(partition-order-sensitive float accumulation, unstable sorts, rand()),
which is exactly the class of flake that shows up as a driver-side-only
hash mismatch.
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def _canon(v):
    """Engine-neutral rendering: Decimal 1.5000 == float 1.5, datetime vs
    Timestamp reprs collapse to isoformat, floats get repr (shortest
    round-trip). A Decimal bridges to float ONLY when the double round-trips
    exactly — otherwise it keeps its exact normalized form, so precision
    beyond double surfaces as a loud mismatch instead of being masked."""
    if v is None:
        return "\0NULL"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, decimal.Decimal):
        if decimal.Decimal(repr(float(v))) == v.normalize():
            return repr(float(v))
        return str(v.normalize())
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def value_hash(rows, names, order):
    idx = [names.index(c) for c in order]
    canon = sorted(tuple(_canon(r[i]) for i in idx) for r in rows)
    return hashlib.md5(str(canon).encode()).hexdigest()


def main() -> int:
    argv = list(sys.argv[1:])
    repeat = 1
    only = None
    if "--repeat" in argv:
        i = argv.index("--repeat")
        repeat = int(argv[i + 1])
        del argv[i : i + 2]
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    vanilla = "--vanilla" in argv
    if vanilla:
        argv.remove("--vanilla")
    # "all" sweeps the ENTIRE registry — use it for the stability sweep so
    # the count can never be hand-miscounted (r4 swept 122 of 123 queries).
    n = None if argv and argv[0] == "all" else (int(argv[0]) if argv else 50)
    if n is not None and n <= 0:
        # a non-positive N would slice to an empty list and exit green with
        # "0/0 green" — silently running nothing. Loud usage error instead.
        print(f"N must be positive (got {n}); use 'all' for the full registry")
        return 2
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.01"

    import duckdb

    from stupidb_spark.oracle_checks import oracle_type_violations
    from stupidb_spark.queryset import ORACLES, QUERIES
    from stupidb_spark.session import get_session

    if vanilla:
        # Driver-faithful mode: the driver does NOT apply our session
        # configs (UTC timezone, Arrow, shuffle partitions, tiny
        # maxPartitionBytes...) — this is the seam that breaks first
        # (.claude/skills/verify/SKILL.md). --vanilla rehearses with a
        # bare builder exactly like the driver's session.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master(f"local[{os.cpu_count()}]")
            .appName("gate-check-vanilla")
            .getOrCreate()
        )
    else:
        spark = get_session("gate-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # --only selects from the FULL registry (not the first-N gate slice):
    # the point of --only is targeted checking, and silently matching
    # nothing would exit green without running anything
    names = (
        list(only)
        if only is not None
        else list(QUERIES)[: len(QUERIES) if n is None else n]
    )
    unknown = [q for q in names if q not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 1
    failures = []
    for name in names:
        try:
            sdf = QUERIES[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            if name not in ORACLES:
                print(f"{name:28s} rows-only {len(srows)}")
                continue
            cols = sorted(sdf.columns)
            shash = value_hash(srows, sdf.columns, cols)
            unstable = []
            for k in range(repeat - 1):
                rdf = QUERIES[name](spark, sf_dir)
                rhash = value_hash(
                    [tuple(r) for r in rdf.collect()], rdf.columns, cols
                )
                if rhash != shash:
                    unstable.append((k + 2, rhash))
            # Type parity first: _canon renders DuckDB HUGEINT (python int)
            # identically to Spark long, so a value compare here can stay
            # green while the driver's pandas-based hasher goes red (the
            # prep_winsorize r3/r4 failure). DESCRIBE catches it.
            type_problems = oracle_type_violations(
                con, ORACLES[name], sdf.schema
            )
            res = con.execute(ORACLES[name])
            onames = [d[0] for d in res.description]
            orows = res.fetchall()
            rows_ok = len(srows) == len(orows)
            hash_ok = rows_ok and shash == value_hash(orows, onames, cols)
            if type_problems:
                hash_ok = False
                status = f"TYPE-PARITY {type_problems}"
            else:
                status = (
                    "OK" if hash_ok else f"MISMATCH {len(srows)} vs {len(orows)}"
                )
            if repeat > 1:
                status += (
                    f" UNSTABLE@runs{[u[0] for u in unstable]}"
                    if unstable
                    else f" stable x{repeat}"
                )
            if not hash_ok or unstable:
                failures.append(name)
        except Exception as exc:  # present errors as gate rows, like the driver
            status = f"ERROR {type(exc).__name__}: {exc}"
            failures.append(name)
        print(f"{name:28s} {status}")

    print(f"\n{len(names) - len(failures)}/{len(names)} green; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
