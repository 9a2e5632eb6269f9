"""Generic source readers.

The reference's sole source is ``table(rows)`` over an iterable of mappings
(`stupidb/api.py:102-131`). We keep that entry point (``table_from_rows``)
and add real file sources — parquet/csv/json — which the reference lacks
entirely (SURVEY.md §2.1).
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def table_from_rows(
    spark: SparkSession,
    rows: Iterable[Mapping[str, Any]],
    schema: StructType | str | None = None,
) -> DataFrame:
    """Base relation from an iterable of mappings.

    Mirrors ``stupidb.api.table`` (`stupidb/api.py:102-131`) but with an
    optional explicit schema; without one, Spark infers (ad-hoc input only —
    fixture tables always use the pinned catalog schemas).
    """
    rows = list(rows)
    if schema is not None:
        return spark.createDataFrame(rows, schema=schema)
    return spark.createDataFrame(rows)


def read_parquet(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    **options: Any,
) -> DataFrame:
    reader = spark.read.option("header", header)
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    **options: Any,
) -> DataFrame:
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """ORC source — Spark-native columnar alternative to parquet, with the
    same pushdown/pruning behavior (vectorized reader, predicate pushdown
    via ORC row-group statistics)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_text(
    spark: SparkSession, path: str, *, whole_file: bool = False
) -> DataFrame:
    """Raw text ingestion — the front door of a document pipeline.

    Default: one row per line (column ``value``). ``whole_file=True``: one
    row per file (the shape for document corpora staged as one doc per
    file); at scale prefer many medium files — a single giant file is one
    task under wholetext.
    """
    return spark.read.text(path, wholetext=whole_file)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", **options: Any) -> None:
    """Sink: parquet writer (absent in the reference — SURVEY.md §2.1)."""
    df.write.mode(mode).options(**options).parquet(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite", **options: Any) -> None:
    """Sink: ORC writer (same contract as :func:`write_parquet`)."""
    df.write.mode(mode).options(**options).orc(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    out_path: str | None = None,
) -> int:
    """Rewrite a parquet directory into files near ``target_file_bytes``;
    returns the output file count.

    Small-file compaction is routine 100 TB table maintenance: streaming
    sinks and fine-grained partitioned writes accumulate KB-scale files
    whose per-file open/footer/task overhead eventually dominates scans.
    The output file count is sized from the ACTUAL on-disk bytes (driver-
    side listing — no data job), then one coalesce-write pass rewrites the
    data; ``coalesce`` (not ``repartition``) keeps the rewrite shuffle-free.
    Writes to ``out_path`` (default: atomically replace ``path`` is left to
    the caller/table format — plain parquet has no atomic swap, so the safe
    pattern is write-new-dir + repoint readers).
    """
    import glob as _glob
    import os as _os

    files = _glob.glob(f"{path}/**/*.parquet", recursive=True)
    total = sum(_os.path.getsize(f) for f in files)
    n_out = max(1, -(-total // target_file_bytes))  # ceil
    dest = out_path or f"{path.rstrip('/')}_compacted"
    spark.read.parquet(path).coalesce(int(n_out)).write.mode("overwrite").parquet(dest)
    return len(_glob.glob(f"{dest}/*.parquet"))
