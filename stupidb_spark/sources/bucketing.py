"""Bucketed tables: co-located joins and aggregations without a shuffle.

At 100 TB the dominant cost of a fact-fact join is shuffling both sides on
the join key. Bucketed storage pays that shuffle ONCE at write time: rows
are hash-distributed into a fixed number of bucket files per partition, and
any later equi-join or groupBy on the bucket key reads co-located buckets
with no Exchange at all (pinned by tests/test_bucketing.py on the physical
plan). This is the storage-level counterpart of ``repartition()`` — the
same hash, persisted.

Sizing rule of thumb: ``n_buckets ≈ table_bytes / 128 MB`` rounded to a
power of two, kept equal across tables that join together (equal bucket
counts are required for the shuffle-free plan)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket sorted)
    parquet table in the session catalog.

    ``sort_by`` additionally sorts within each bucket file — a sort-merge
    join between two tables bucketed AND sorted on the join key needs
    neither shuffle nor sort.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read preserving bucketing metadata (a raw parquet-path read
    would lose it and reintroduce the shuffle)."""
    return spark.table(table)
