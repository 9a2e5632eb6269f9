"""Shared fixtures: one SparkSession per test run, DuckDB oracle helper, and
an order-insensitive comparison mirroring the driver's check."""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest

from stupidb_spark.session import get_session
from stupidb_spark.sources import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    session = get_session("stupidb-spark-tests", cpus="8", shuffle_partitions=8)
    yield session


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


def _norm_cell(v):
    """Normalize a cell for cross-engine comparison."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and represent at 10 significant digits
        if v == 0:
            return 0.0
        return v
    if isinstance(v, bool):
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None)
    try:
        from decimal import Decimal

        if isinstance(v, Decimal):
            return float(v)
    except ImportError:  # pragma: no cover
        pass
    return v


def rowset(rows, columns):
    """Order-insensitive canonical form: sort columns by name, then rows."""
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in idx) for r in rows]
    return sorted(out, key=repr)


# DuckDB types that the driver's hasher cannot render like the Spark side
# (pandas materializes int128 as float64/object → "975144700.0" != "975144700",
# the exact failure that kept prep_winsorize red in rounds 3-4 while every
# local value comparison passed). An uncast sum(int)/sum(bigint) in an oracle
# projection is always one of these.
_DUCK_FORBIDDEN = {"HUGEINT", "UHUGEINT", "UBIGINT"}
_DUCK_INT = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT", "USMALLINT", "UINTEGER"}
_DUCK_FLOAT = {"FLOAT", "DOUBLE", "REAL"}
_SPARK_INT = {"tinyint", "smallint", "int", "bigint"}
_SPARK_FLOAT = {"float", "double"}


def oracle_type_violations(duck_con, sql, spark_schema):
    """Type-parity check between a DuckDB oracle projection and the Spark
    result schema: the driver hashes values through pandas, so each oracle
    column must DESCRIBE to a type pandas renders the same way as the Spark
    column.  Returns a list of human-readable violations (empty = parity).

    Rules (deliberately minimal, to avoid false alarms on legit queries):
      * no HUGEINT/UHUGEINT/UBIGINT anywhere — unrepresentable in int64;
      * a Spark integral column must map to a <=64-bit DuckDB integer type
        (not DOUBLE/DECIMAL/HUGEINT);
      * a Spark float/double column must map to FLOAT/DOUBLE/REAL.
    """
    duck_types = {
        r[0]: r[1].upper() for r in duck_con.execute(f"DESCRIBE {sql}").fetchall()
    }
    spark_types = {f.name: f.dataType.simpleString() for f in spark_schema.fields}
    problems = []
    for col, dt in duck_types.items():
        base = dt.split("(")[0].strip()
        st = spark_types.get(col)
        if base in _DUCK_FORBIDDEN:
            problems.append(
                f"{col}: oracle type {dt} is driver-unhashable — wrap the "
                f"aggregate in CAST(... AS BIGINT)"
            )
        elif st in _SPARK_INT and base not in _DUCK_INT:
            problems.append(f"{col}: spark {st} vs oracle {dt}")
        elif st in _SPARK_FLOAT and base not in _DUCK_FLOAT:
            problems.append(f"{col}: spark {st} vs oracle {dt}")
    return problems


def assert_matches_oracle(sdf, duck_con, sql, *, name=""):
    """Driver-style comparison: row count + sorted-column value sets, plus
    oracle-vs-Spark type parity (the check that would have caught the
    prep_winsorize HUGEINT red rows locally)."""
    type_problems = oracle_type_violations(duck_con, sql, sdf.schema)
    assert not type_problems, f"{name}: oracle type parity: {type_problems}"
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)
    rel = duck_con.execute(sql)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    left = rowset(spark_rows, spark_cols)
    right = rowset(duck_rows, duck_cols)
    if left != right:
        diffs = [(l, r) for l, r in zip(left, right) if l != r][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
