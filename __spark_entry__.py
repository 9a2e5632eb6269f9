"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 shape) on sf0.001.
``queries()`` / ``oracle_sql()`` expose the full declared inventory from
``stupidb_spark.queryset`` — every SURVEY.md §2 operator plus the
beyond-reference extension surface (dedup / similarity / text / event-time).
Queries without an oracle entry are approximate algorithms (MinHash-LSH,
SimHash, LSH-ANN) or non-SQL folds (rolling hash), verified in tests/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# Repo importable from any cwd — and, critically, by forked Python UDF
# workers (pandas UDFs cloudpickle references to `stupidb_spark`, resolved
# via PYTHONPATH at worker start).
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from pyspark.sql import DataFrame, SparkSession

from stupidb_spark.queryset import ORACLES, QUERIES
from stupidb_spark.session import configure_existing


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    configure_existing(spark)
    return QUERIES["tpch_q1"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (where SQL-expressible)."""
    return dict(ORACLES)
