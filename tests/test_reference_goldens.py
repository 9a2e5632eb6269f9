"""Reference-golden parity: the reference's own test fixtures and expected
rowsets (cpcloud/stupidb test suite), run through OUR verb/window API.

Each golden cites its source test. Where SURVEY.md §2.9 records a deliberate
deviation (Q2-Q5), the test pins OUR (SQL) semantics and says so — these are
the cases a user migrating from the reference must know about.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from stupidb_spark.functions import aggregates as agg
from stupidb_spark.functions import ranking as rk
from stupidb_spark.verbs import (
    aggregate,
    difference,
    difference_all,
    full_join,
    group_by,
    intersect,
    intersect_all,
    mutate,
    order_by,
    select,
    union,
    union_all,
)
from stupidb_spark.window import partition_window, range_window, rows_window

# the `rows` fixture — stupidb/tests/conftest.py:16-25
ROWS = [
    ("a", 1, 2, 1),
    ("b", 2, -1, 2),
    ("a", 3, 4, 3),
    ("a", 4, -3, 4),
    ("a", 1, -3, 5),
    ("b", 2, -3, 6),
    ("b", 3, -3, 7),
]

# the `t_rows` fixture — stupidb/tests/conftest.py:58-67
T_ROWS = [
    ("alice", datetime.date(2018, 1, 1), 2),
    ("alice", datetime.date(2018, 1, 4), 4),
    ("alice", datetime.date(2018, 1, 6), -3),
    ("alice", datetime.date(2018, 1, 7), -3),
    ("bob", datetime.date(2018, 1, 2), -1),
    ("bob", datetime.date(2018, 1, 3), -3),
    ("bob", datetime.date(2018, 1, 4), -3),
]


@pytest.fixture(scope="module")
def rows_df(spark):
    return spark.createDataFrame(ROWS, "z string, a long, b long, e long")


@pytest.fixture(scope="module")
def t_df(spark):
    return spark.createDataFrame(T_ROWS, "name string, date date, balance long")


def test_rows_window_golden(rows_df):
    # stupidb/tests/test_stupidb.py:409-441: sum(a) ROWS 2 PRECEDING..CURRENT
    w = rows_window(
        partition_by=("z",), order_by=("e",), preceding=2, following=0
    )
    out = (
        rows_df
        >> mutate(my_agg=F.sum("a").over(w))
        >> order_by("z", "e")
        >> select("z", "e", "my_agg")
    )
    # positional goldens [1,2,4,8,8,4,7] re-sorted by (z,e) as the query orders
    assert [r.my_agg for r in out.collect()] == [1, 4, 8, 8, 2, 4, 7]


def test_rows_window_whole_partition_golden(rows_df):
    # stupidb/tests/test_stupidb.py:443-468: unordered window ⇒ whole
    # partition (reference default, stupidb/aggregation.py:185-194)
    w = rows_window(partition_by=("z",))
    out = rows_df >> mutate(my_agg=F.sum("a").over(w)) >> order_by("z", "e")
    assert [r.my_agg for r in out.collect()] == [9, 9, 9, 9, 7, 7, 7]


def test_range_window_golden(rows_df):
    # stupidb/tests/test_stupidb.py:488-526: sum(a) RANGE 2 PRECEDING over e.
    # NOTE the reference's expected rowset omits e=2/e=6 ties concerns — its
    # golden is exactly reproducible in SQL RANGE mode.
    w = range_window(partition_by=("z",), order_by="e", preceding=2, following=0)
    out = (
        rows_df
        >> mutate(my_agg=F.sum("a").over(w))
        >> order_by("z", "e")
        >> select("z", "e", "my_agg")
    )
    got = {(r.z, r.e): r.my_agg for r in out.collect()}
    expected = {
        ("a", 1): 1, ("a", 3): 4, ("a", 4): 7, ("a", 5): 8,
        ("b", 2): 2, ("b", 6): 2, ("b", 7): 5,
    }
    assert got == expected


def test_temporal_range_window_golden(t_df):
    # stupidb/tests/test_stupidb.py:529-588: mean(balance) RANGE 3 days
    # PRECEDING over date, per name
    w = range_window(
        partition_by=("name",),
        order_by="date",
        preceding=datetime.timedelta(days=3),
        following=datetime.timedelta(days=0),
    )
    out = t_df >> mutate(avg_balance=F.avg("balance").over(w)) >> order_by("name", "date")
    got = [round(r.avg_balance, 10) for r in out.collect()]
    assert got == [
        2.0,
        3.0,
        0.5,
        round(-2 / 3, 10),
        -1.0,
        -2.0,
        round(-7 / 3, 10),
    ]


def test_global_agg_golden(rows_df):
    # stupidb/tests/test_stupidb.py:591-599: ungrouped aggregate = one row
    out = rows_df >> aggregate(
        sum=agg.sum("e"), mean=agg.mean("e"), count=agg.count("e")
    )
    (r,) = out.collect()
    # item access: Row.count/Row.sum collide with Row methods
    assert (r["sum"], r["count"]) == (28, 7)
    assert r["mean"] == r["sum"] / r["count"]


def test_group_by_sum_golden(rows_df):
    # stupidb/tests/test_stupidb.py:89-105 (sum part): total a per z
    out = rows_df >> group_by("z") >> aggregate(total=agg.sum("a"))
    assert {(r.z, r.total) for r in out.collect()} == {("a", 9), ("b", 7)}


FRUIT = [("apple",), ("apple",), ("grapes",), ("grapes",), ("orange",), ("watermelon",)]


def test_rank_golden_zero_based(spark):
    # stupidb/tests/test_ranking.py:25-38 — reference ranks are 0-based
    # (quirk Q3); zero_based=True reproduces them exactly
    df = spark.createDataFrame(FRUIT, "name string")
    w = partition_window(order_by=("name",))
    out = df >> select("name", ranked=rk.rank(w, zero_based=True)) >> order_by("ranked")
    assert [r.ranked for r in out.collect()] == [0, 0, 2, 2, 4, 5]


def test_rank_with_nulls_golden(spark):
    # stupidb/tests/test_ranking.py:41-51: NULLs order first (reference
    # default) and tie for rank 0
    df = spark.createDataFrame([("a",), (None,), (None,), ("b",)], "name string")
    w = partition_window(order_by=("name",))
    out = df >> select(ranked=rk.rank(w, zero_based=True)) >> order_by("ranked")
    assert [r.ranked for r in out.collect()] == [0, 0, 2, 3]


def test_dense_rank_golden(spark):
    # stupidb/tests/test_ranking.py:54-82
    df = spark.createDataFrame(FRUIT, "name string")
    w = partition_window(order_by=("name",))
    out = df >> select(ranked=rk.dense_rank(w, zero_based=True)) >> order_by("ranked")
    assert [r.ranked for r in out.collect()] == [0, 0, 1, 1, 2, 3]
    df2 = spark.createDataFrame([("a",), (None,), (None,), ("b",)], "name string")
    out2 = df2 >> select(ranked=rk.dense_rank(w, zero_based=True)) >> order_by("ranked")
    assert [r.ranked for r in out2.collect()] == [0, 0, 1, 2]


def test_full_join_employee_department(spark):
    # stupidb/tests/test_stupidb.py:229-282 — declared-but-NotImplemented in
    # the reference (xfail there, first-class here); fixture from
    # conftest.py:76-94
    employee = spark.createDataFrame(
        [
            ("Rafferty", 31),
            ("Jones", 33),
            ("Heisenberg", 33),
            ("Robinson", 34),
            ("Smith", 34),
            ("Williams", None),
        ],
        "last_name string, department_id long",
    )
    department = spark.createDataFrame(
        [(31, "Sales"), (33, "Engineering"), (34, "Clerical"), (35, "Marketing")],
        "department_id long, department_name string",
    )
    out = (
        employee.withColumnRenamed("department_id", "emp_dept")
        >> full_join(department, F.col("emp_dept") == F.col("department_id"))
        >> select("last_name", "emp_dept", "department_name")
    )
    rows = {(r.last_name, r.emp_dept, r.department_name) for r in out.collect()}
    assert ("Williams", None, None) in rows  # null key never matches
    assert (None, None, "Marketing") in rows  # unmatched right padded
    assert ("Rafferty", 31, "Sales") in rows
    assert len(rows) == 7  # 5 matched + 1 left-pad + 1 right-pad


SETOP_SOURCE = "stupidb/tests/test_set_operations.py"


def _names(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "name string")


def test_set_ops_sql_semantics(spark):
    # union/intersect/difference distinct forms match the reference
    # (stupidb/tests/test_set_operations.py); *_all forms deliberately follow
    # SQL bag semantics instead (quirks Q4) — pinned here:
    ab, a, abb = _names(spark, "ab"), _names(spark, "a"), _names(spark, ["a", "b", "b"])
    assert sorted(r.name for r in (ab >> union(a)).collect()) == ["a", "b"]
    assert sorted(r.name for r in (ab >> union_all(a)).collect()) == ["a", "a", "b"]
    assert [r.name for r in (ab >> intersect(a)).collect()] == ["a"]
    # reference would emit [a, a] here (dedups both sides then one per side);
    # SQL INTERSECT ALL = min multiplicity = [a]
    assert [r.name for r in (ab >> intersect_all(a)).collect()] == ["a"]
    assert sorted(r.name for r in (ab >> difference(a)).collect()) == ["b"]
    # reference difference_all keeps every left copy not in right (no
    # multiplicity subtraction); SQL EXCEPT ALL subtracts multiplicities
    assert sorted(r.name for r in (abb >> difference_all(ab)).collect()) == ["b"]


def test_sum_vs_total_all_null(spark):
    # stupidb/tests/test_stupidb.py:640-647 + associative/__init__.py:119-133
    df = spark.createDataFrame([(None,), (None,)], "value double")
    out = df >> aggregate(s=agg.sum("value"), t=agg.total("value"))
    (r,) = out.collect()
    assert r.s is None and r.t == 0.0


def test_first_last_ignore_nulls(spark):
    # quirk Q1: reference first/last ALWAYS skip nulls
    # (stupidb/functions/navigation/__init__.py:94-98)
    df = spark.createDataFrame(
        [(1, None), (2, 10.0), (3, None), (4, 20.0), (5, None)], "i long, x double"
    )
    # explicit wide following bound: with an order key, following=None means
    # CURRENT ROW (reference default) — here we want the whole partition
    w = rows_window(order_by=("i",), preceding=None, following=100)
    out = (
        df
        >> select(
            "i",
            f=F.first("x", ignorenulls=True).over(w),
            l=F.last("x", ignorenulls=True).over(w),
        )
        >> order_by("i")
    )
    for r in out.collect():
        assert (r.f, r.l) == (10.0, 20.0)
