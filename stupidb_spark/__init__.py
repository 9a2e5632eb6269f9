"""stupidb_spark — a PySpark-native analytics engine with the query surface
of cpcloud/stupidb, rebuilt Spark-first.

Not a port: the reference (`/root/reference`) is a single-threaded pure-Python
iterator engine; this package is a thin, typed verb layer over
``pyspark.sql.DataFrame`` in which every verb compiles to native Catalyst
expressions, plus a beyond-reference extension surface (dedup, similarity
search, text analysis, event-time windows, streaming) designed for 100 TB
inputs.
"""

from stupidb_spark.session import get_session, configure_existing
from stupidb_spark.verbs import (
    Nulls,
    Verb,
    aggregate,
    anti_join,
    const,
    count_rows,
    cross_join,
    difference,
    difference_all,
    distinct,
    full_join,
    get,
    group_by,
    inner_join,
    intersect,
    intersect_all,
    left_join,
    limit,
    mutate,
    order_by,
    rename,
    right_join,
    select,
    semi_join,
    sift,
    top_k,
    union,
    union_all,
)
from stupidb_spark.window import partition_window, range_window, rows_window

__version__ = "0.1.0"

__all__ = [
    "get_session",
    "configure_existing",
    "Nulls",
    "Verb",
    "select",
    "mutate",
    "sift",
    "distinct",
    "rename",
    "const",
    "get",
    "cross_join",
    "inner_join",
    "left_join",
    "right_join",
    "full_join",
    "semi_join",
    "anti_join",
    "group_by",
    "aggregate",
    "count_rows",
    "order_by",
    "limit",
    "top_k",
    "union",
    "union_all",
    "intersect",
    "intersect_all",
    "difference",
    "difference_all",
    "rows_window",
    "range_window",
    "partition_window",
]
