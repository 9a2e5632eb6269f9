"""Set-operation queries — SURVEY.md §2.7.

The two sides are derived projections of ``orders`` chosen to contain both
duplicates and partial overlap, so distinct-vs-bag multiplicity semantics are
actually exercised.

Quirk Q4: the reference's ``intersect_all`` / ``difference_all`` are NOT SQL
bag semantics (`stupidb/core.py:437-450,479-490`); we follow SQL
(``intersectAll`` / ``exceptAll``) because DuckDB is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stupidb_spark.queryset import q
from stupidb_spark.sources import load_table
from stupidb_spark.verbs import (
    difference,
    difference_all,
    intersect,
    intersect_all,
    select,
    sift,
    union,
    union_all,
)

_LEFT_SQL = """
    SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_totalprice > 200000
"""
_RIGHT_SQL = """
    SELECT o_orderstatus, o_orderpriority FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01'
"""


def _sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    orders = load_table(spark, sf_dir, "orders")
    left = orders >> sift(F.col("o_totalprice") > 200000) >> select(
        "o_orderstatus", "o_orderpriority"
    )
    right = orders >> sift(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    ) >> select("o_orderstatus", "o_orderpriority")
    return left, right


def _tagged(op: str, df: DataFrame) -> DataFrame:
    return df.select(F.lit(op).alias("op"), "*")


@q(
    "setop_six",
    f"""
    SELECT 'union' AS op, * FROM
        (SELECT * FROM ({_LEFT_SQL}) UNION SELECT * FROM ({_RIGHT_SQL}))
    UNION ALL
    SELECT 'intersect' AS op, * FROM
        (SELECT * FROM ({_LEFT_SQL}) INTERSECT SELECT * FROM ({_RIGHT_SQL}))
    UNION ALL
    SELECT 'except' AS op, * FROM
        (SELECT * FROM ({_LEFT_SQL}) EXCEPT SELECT * FROM ({_RIGHT_SQL}))
    UNION ALL
    SELECT 'union_all' AS op, * FROM
        (SELECT * FROM ({_LEFT_SQL}) UNION ALL SELECT * FROM ({_RIGHT_SQL}))
    UNION ALL
    SELECT 'intersect_all' AS op, * FROM
        (SELECT * FROM ({_LEFT_SQL}) INTERSECT ALL SELECT * FROM ({_RIGHT_SQL}))
    UNION ALL
    SELECT 'except_all' AS op, * FROM
        (SELECT * FROM ({_LEFT_SQL}) EXCEPT ALL SELECT * FROM ({_RIGHT_SQL}))
    """,
)
def setop_six(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All six set operations over the same two sides, tagged and stacked —
    one hard-signal correctness row covering ``union`` / ``intersect`` /
    ``difference`` (stupidb/core.py:416-425,437-450,479-490) and their bag
    (ALL) variants with SQL multiset semantics (quirk Q4 deviation from the
    reference for ``intersect_all`` / ``difference_all``)."""
    left, right = _sides(spark, sf_dir)
    return (
        _tagged("union", left >> union(right))
        >> union_all(_tagged("intersect", left >> intersect(right)))
        >> union_all(_tagged("except", left >> difference(right)))
        >> union_all(_tagged("union_all", left >> union_all(right)))
        >> union_all(_tagged("intersect_all", left >> intersect_all(right)))
        >> union_all(_tagged("except_all", left >> difference_all(right)))
    )
