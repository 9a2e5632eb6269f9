#!/usr/bin/env python
"""Driver-style correctness gate rehearsal: run the first N registered
queries against their DuckDB oracles at sf0.01 and report row/hash matches.

Usage: python scripts/gate_check.py [N] [sf_dir]
"""

from __future__ import annotations

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


def value_hash(rows, names, order):
    idx = [names.index(c) for c in order]
    canon = sorted(tuple(str(r[i]) for i in idx) for r in rows)
    return hashlib.md5(str(canon).encode()).hexdigest()


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import duckdb

    from stupidb_spark.queryset import ORACLES, QUERIES
    from stupidb_spark.session import get_session

    spark = get_session("gate-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name in list(QUERIES)[:n]:
        try:
            sdf = QUERIES[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            if name not in ORACLES:
                status = f"rows-only {len(srows)}"
                print(f"{name:28s} {status}")
                continue
            res = con.execute(ORACLES[name])
            onames = [d[0] for d in res.description]
            orows = res.fetchall()
            cols = sorted(sdf.columns)
            rows_ok = len(srows) == len(orows)
            hash_ok = rows_ok and value_hash(srows, sdf.columns, cols) == value_hash(
                orows, onames, cols
            )
            status = "OK" if hash_ok else f"MISMATCH {len(srows)} vs {len(orows)}"
            if not hash_ok:
                failures.append(name)
        except Exception as exc:  # present errors as gate rows, like the driver
            status = f"ERROR {type(exc).__name__}: {exc}"
            failures.append(name)
        print(f"{name:28s} {status}")

    print(f"\n{n - len(failures)}/{n} green; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
