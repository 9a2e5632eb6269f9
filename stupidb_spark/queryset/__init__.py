"""Declared query inventory — the correctness surface of the engine.

Every operator from SURVEY.md §2 (and the beyond-reference extension
surface) has a named query here plus, where SQL-expressible, a DuckDB oracle
statement over the same parquet views. The driver runs both at sf0.01 and
hash-compares; ``tests/test_oracle_parity.py`` runs the identical comparison
locally at sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def q(name: str, sql: str | None = None):
    """Register a query and (optionally) its DuckDB oracle SQL."""

    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


# Import side-effect: populate the registry.
from stupidb_spark.queryset import core  # noqa: E402,F401
from stupidb_spark.queryset import windows  # noqa: E402,F401
from stupidb_spark.queryset import setops  # noqa: E402,F401
from stupidb_spark.queryset import events  # noqa: E402,F401
from stupidb_spark.queryset import text  # noqa: E402,F401
from stupidb_spark.queryset import dedup  # noqa: E402,F401
from stupidb_spark.queryset import similarity  # noqa: E402,F401
from stupidb_spark.queryset import multimodal  # noqa: E402,F401
from stupidb_spark.queryset import udaf  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "q"]
