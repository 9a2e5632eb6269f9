"""Differential test: every declared query with an oracle must hash-match
DuckDB at sf0.001 — the same comparison the driver runs at sf0.01
(SURVEY.md §5: the reference's SQLite-oracle pattern, scaled up to DuckDB).

Queries without an oracle still execute and must return a stable schema and
``count() >= 0`` (the driver's weaker rows-only check).
"""

from __future__ import annotations

import pytest

from stupidb_spark.queryset import ORACLES, QUERIES
from tests.conftest import SF_DIR, assert_matches_oracle

ORACLE_NAMES = sorted(ORACLES)
NO_ORACLE_NAMES = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(sdf, duck, ORACLES[name], name=name)


@pytest.mark.parametrize("name", NO_ORACLE_NAMES)
def test_query_runs(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    assert len(sdf.columns) > 0
    assert sdf.count() >= 0


def test_type_parity_flags_uncast_hugeint_sum(spark, duck):
    """The checker that closed the prep_winsorize saga: DuckDB types
    sum(int)/sum(bigint) as HUGEINT, which the driver's pandas hasher
    renders differently from Spark's LONG. An uncast integer sum in an
    oracle must be flagged even though its *values* compare equal."""
    from tests.conftest import oracle_type_violations

    sdf = spark.range(1).selectExpr("CAST(1 AS BIGINT) AS s")
    bad = oracle_type_violations(
        duck, "SELECT sum(r_regionkey) AS s FROM region", sdf.schema
    )
    assert bad and "HUGEINT" in bad[0]
    good = oracle_type_violations(
        duck,
        "SELECT CAST(sum(r_regionkey) AS BIGINT) AS s FROM region",
        sdf.schema,
    )
    assert good == []
    # A float-typed oracle column against a Spark integral column is the
    # same hasher-render mismatch by another road.
    bad_float = oracle_type_violations(
        duck, "SELECT CAST(1 AS DOUBLE) AS s FROM region", sdf.schema
    )
    assert bad_float


def test_every_oracle_type_parity(duck):
    """Fast DESCRIBE-only sweep: no oracle projection may use a type the
    driver hasher cannot render (HUGEINT/UHUGEINT/UBIGINT), independent of
    whether the query is in the current 50-row gate rotation."""
    from stupidb_spark.oracle_checks import _DUCK_FORBIDDEN

    offenders = {}
    for name, sql in ORACLES.items():
        hits = [
            f"{r[0]}:{r[1]}"
            for r in duck.execute(f"DESCRIBE {sql}").fetchall()
            if r[1].upper().split("(")[0].strip() in _DUCK_FORBIDDEN
        ]
        if hits:
            offenders[name] = hits
    assert offenders == {}
