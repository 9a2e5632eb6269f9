"""Function library: aggregates, ranking, navigation, text, vectors.

The reference ships 12 aggregate functions, 3 ranking functions and 5
navigation functions (SURVEY.md §2.4-2.5) and **no scalar function library**
(arbitrary Python lambdas serve instead, `stupidb/typehints.py:28-31`).
Here every function is a native Column expression so plans stay inside
whole-stage codegen.
"""

from stupidb_spark.functions.aggregates import (
    count,
    cov_pop,
    cov_samp,
    first,
    last,
    max,
    mean,
    min,
    stdev_pop,
    stdev_samp,
    sum,
    total,
    var_pop,
    var_samp,
)
from stupidb_spark.functions.ranking import dense_rank, ntile, percent_rank, rank, row_number
from stupidb_spark.functions.navigation import lag, lead, nth

__all__ = [
    "count",
    "sum",
    "total",
    "mean",
    "min",
    "max",
    "cov_samp",
    "cov_pop",
    "var_samp",
    "var_pop",
    "stdev_samp",
    "stdev_pop",
    "first",
    "last",
    "row_number",
    "rank",
    "dense_rank",
    "percent_rank",
    "ntile",
    "lead",
    "lag",
    "nth",
]
