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
