"""Document chunking — split long texts into fixed-size overlapping windows.

The standard prep step between cleaning and packing in a training-data
pipeline: a document becomes ``ceil`` many ``size``-char chunks placed every
``stride`` chars (``size - stride`` chars of overlap between neighbours), so
no token at a chunk boundary loses its left context.

Scale design: ``explode(sequence(...))`` is a row generator *inside the scan
stage* — chunking 100 TB is a zero-shuffle map whose output feeds straight
into tokenize/pack operators. The per-row array is just the chunk indices
(``len/stride`` ints), never the chunk texts, so generator memory is O(1)
per chunk. The reference has no chunking surface (its relations are
row-iterators over dicts, stupidb/core.py); this is extension surface per
SURVEY.md §7.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_text(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    size: int = 200,
    stride: int = 150,
) -> DataFrame:
    """Explode each document into overlapping fixed-size character chunks.

    Chunk ``i`` covers ``[i*stride, i*stride + size)``; starts run while
    ``start < length(text)``, so every document (even one shorter than
    ``size``) yields at least one chunk and no chunk is empty.

    Returns columns: ``{id_col}, chunk_id, chunk_start, chunk_text,
    chunk_len``.

    >>> from stupidb_spark.session import get_session
    >>> spark = get_session()
    >>> df = spark.createDataFrame([(1, "abcdefghij")], "id long, t string")
    >>> [r.chunk_text for r in
    ...  chunk_text(df, id_col="id", text_col="t", size=6, stride=4)
    ...  .orderBy("chunk_id").collect()]
    ['abcdef', 'efghij', 'ij']
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    n_chars = F.length(F.col(text_col))
    # number of starts strictly below n_chars, minimum 1 for empty docs
    n_chunks = (
        F.floor(F.greatest(n_chars - F.lit(1), F.lit(0)) / F.lit(stride)) + 1
    )
    start: Column = F.col("chunk_id") * stride
    return (
        df.select(
            F.col(id_col),
            F.col(text_col),
            F.explode(
                F.sequence(F.lit(0).cast("long"), n_chunks - 1)
            ).alias("chunk_id"),
        )
        .select(
            id_col,
            "chunk_id",
            start.alias("chunk_start"),
            F.substring(
                F.col(text_col), (start + 1).cast("int"), F.lit(size)
            ).alias("chunk_text"),
        )
        .withColumn("chunk_len", F.length("chunk_text").cast("long"))
    )
