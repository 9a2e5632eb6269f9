"""Sequence packing: group documents into fixed-token-budget packs.

Beyond-reference surface — the pretraining step that turns a deduped,
quality-filtered corpus into training sequences: concatenate documents
until a context-window budget is reached, start the next pack. Two
strategies with different determinism/efficiency trade-offs:

- :func:`pack_by_cumsum` — streaming chunk packing: documents in a fixed
  global order, pack boundary every ``capacity`` cumulative tokens. The
  running token sum is computed two-phase (range-bucket the order key,
  cumsum within buckets in parallel, add broadcast per-bucket offsets) so
  NO single task ever sees the whole corpus — the naive ``sum() OVER
  (ORDER BY id)`` plan funnels every row through one partition. Same
  results as the ANSI-SQL global window, which is the DuckDB oracle form.
  A document straddling a boundary goes to the pack its *preceding*
  tokens filled into (packs may overflow by at most one document — the
  standard streaming-packer behavior).
- :func:`pack_greedy` — first-fit-decreasing bin packing within hash
  buckets via ``applyInPandas``: tighter packs (no overflow; fewer padding
  tokens), at the cost of a Python stage. Buckets pack independently, so
  the operator scales horizontally: quality of fit degrades only with
  bucket count, never correctness.

Scale notes: both forms shuffle only (id, n_tokens) longs — the document
*text* never moves; join the assignment back to the corpus on the id. At
100 TB the text stays columnar in parquet and only the ~16-byte
assignment rows shuffle, and no single task ever holds more than one
range bucket's worth of them.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def pack_by_cumsum(
    df: DataFrame,
    *,
    token_col: str,
    order_col: str,
    capacity: int,
    pack_col: str = "pack_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Assign ``pack_col`` = the pack index under streaming chunk packing.

    ``pack_id = floor(tokens_before / capacity)`` where ``tokens_before``
    is the exclusive running token sum in ``order_col`` order — document i
    starts in the pack its predecessors filled into. ``order_col`` must be
    a numeric, unique ordering key (e.g. a doc id).

    The equivalent SQL (the DuckDB oracle of ``pack_sequences``)::

        floor((sum(n) OVER (ORDER BY id) - n) / capacity)

    but the plan is NOT that global window (a SinglePartition sort that
    serializes the corpus onto one task). Instead, the same two-phase
    idiom as :func:`stupidb_spark.operators.ordering.seeded_positions`:

    1. ``percentile_approx`` sketches ≤ ``n_buckets - 1`` range boundaries
       of ``order_col`` — driver metadata bounded by contract (one slim
       aggregate job; boundary precision only affects load balance, never
       results, because the boundaries are baked in as literals).
    2. a monotone codegen'd CASE assigns each row its range bucket, so
       ordering by (bucket, order_col) equals ordering by order_col;
    3. an ``n_buckets``-row aggregate + tiny window gives each bucket its
       exclusive cumulative token offset (metadata-scale);
    4. per-bucket cumsum window + broadcast offset join = exact global
       running sum, each bucket processed in parallel.

    >>> out = pack_by_cumsum(seqs, token_col="n", order_col="id", capacity=100)
    >>> [(r.id, r.pack_id) for r in out.orderBy("id").collect()]
    [(1, 0), (2, 0), (3, 1), (4, 1)]
    """
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds_row = df.select(
        F.percentile_approx(
            F.col(order_col).cast("double"), probs, 1000
        ).alias("b")
    ).first()
    bounds = sorted(set(bounds_row["b"] or [])) if bounds_row else []

    # Monotone bucket id: number of boundaries strictly below the key.
    # A sum of WHENs stays in whole-stage codegen (array HOFs would not).
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(F.col(order_col) > F.lit(b), 1).otherwise(0)
    keyed = df.withColumn("__bucket", bucket.cast("int"))

    totals = keyed.groupBy("__bucket").agg(F.sum(token_col).alias("__t"))
    # ≤ n_buckets rows: the single-partition window here is metadata-scale
    off_w = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "__bucket",
        F.coalesce(F.sum("__t").over(off_w), F.lit(0)).alias("__offset"),
    )
    in_w = (
        Window.partitionBy("__bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tokens_before = (
        F.col("__offset") + F.sum(token_col).over(in_w) - F.col(token_col)
    )
    return (
        keyed.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            pack_col, F.floor(tokens_before / F.lit(capacity)).cast("long")
        )
        .drop("__bucket", "__offset")
    )


_PACK_OUT = StructType(
    [
        StructField("doc", LongType()),
        StructField("n_tokens", LongType()),
        StructField("pack_id", LongType()),
    ]
)


def pack_greedy(
    df: DataFrame,
    *,
    id_col: str,
    token_col: str,
    capacity: int,
    n_buckets: int = 64,
) -> DataFrame:
    """First-fit-decreasing bin packing, parallel over hash buckets.

    Returns ``(doc, n_tokens, pack_id)`` with every pack's token total
    <= ``capacity`` (a document larger than ``capacity`` gets a pack of
    its own). ``pack_id`` is globally unique: ``bucket * 2^32 + local``.

    Each bucket packs independently in one Arrow batch — deterministic
    (items sorted by (tokens desc, id)), no cross-bucket coordination, and
    the shuffle payload is two longs per document. FFD within a bucket
    wastes at most ~2/9 over optimal (classic bound); bucketing adds at
    most one underfull pack per bucket, so choose ``n_buckets`` ~ cluster
    parallelism, not higher.

    >>> out = pack_greedy(seqs, id_col="id", token_col="n",
    ...                   capacity=100, n_buckets=1)
    >>> out.groupBy("pack_id").sum("n_tokens").agg(
    ...     F.max("sum(n_tokens)").alias("m")).collect()[0].m <= 100
    True
    """

    def pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(key[0])
        items = pdf.sort_values(
            ["n_tokens", "doc"], ascending=[False, True]
        ).itertuples(index=False)
        packs: list[int] = []  # remaining capacity per local pack
        assign: dict[int, int] = {}
        for it in items:
            doc, n = int(it.doc), int(it.n_tokens)
            for p, rem in enumerate(packs):
                if rem >= n:
                    packs[p] = rem - n
                    assign[doc] = p
                    break
            else:
                packs.append(max(capacity - n, 0))
                assign[doc] = len(packs) - 1
        out = pdf[["doc", "n_tokens"]].copy()
        out["pack_id"] = out["doc"].map(
            lambda d: (bucket << 32) | assign[int(d)]
        ).astype("int64")
        return out

    slim = df.select(
        F.col(id_col).cast("long").alias("doc"),
        F.col(token_col).cast("long").alias("n_tokens"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).alias("bucket"),
    )
    return slim.groupBy("bucket").applyInPandas(pack, _PACK_OUT)


#: Power-of-two token-length bucket edges for :func:`bucketed_batches` —
#: explicit integer comparisons (a CASE ladder), never float log2, so both
#: engines bucket boundary lengths identically.
LENGTH_BUCKET_EDGES = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096)


def bucketed_batches(
    df: DataFrame,
    *,
    id_col: str,
    token_col: str,
    batch_size: int,
    seed: str,
    edges: tuple[int, ...] = LENGTH_BUCKET_EDGES,
    salt_chars: int = 2,
) -> DataFrame:
    """Length-bucketed, seeded, fixed-size training batches.

    The batch-shaping step of a pretraining data loader: documents are
    first bucketed by token length (so a batch's padding cost is bounded by
    its bucket's spread), then pseudorandomly ordered *within* each bucket
    by a seeded keyed hash (same discipline as
    :func:`stupidb_spark.operators.ordering.seeded_positions` — stable
    under any partitioning, reshufflable by seed), then cut into
    consecutive batches of exactly ``batch_size`` (the last batch per
    bucket may be short).

    Returns ``(id_col, token_col, len_bucket, batch)`` where the
    assignment equals the ANSI-SQL form::

        batch = (row_number() OVER (PARTITION BY len_bucket
                                    ORDER BY md5(seed||':'||id), id) - 1)
                / batch_size

    but the plan never materializes a per-bucket mega-partition window:
    the md5 key's leading ``salt_chars`` hex chars are an ORDER-PRESERVING
    salt (the salt is a prefix of the order key, so (len_bucket, salt, key)
    order equals (len_bucket, key) order). Row numbers are computed per
    (len_bucket, salt) — each window sees ~1/16^salt_chars of a length
    bucket — and a (n_buckets x 16^salt_chars)-row count aggregate supplies
    each salt's exclusive offset within its bucket. At 100 TB only
    (id, tokens) longs shuffle; widen ``salt_chars`` as the corpus grows
    (2 → 256 sub-partitions per bucket, 3 → 4096, ...).

    >>> from stupidb_spark.session import get_session
    >>> spark = get_session()
    >>> docs = spark.range(1, 201).select(
    ...     F.col("id"), (F.col("id") % 50 + 1).alias("n_tok"))
    >>> out = bucketed_batches(docs, id_col="id", token_col="n_tok",
    ...                        batch_size=8, seed="s")
    >>> sizes = [r["count"] for r in out.groupBy("len_bucket", "batch")
    ...          .count().collect()]
    >>> sorted(set(sizes))[-1] <= 8
    True
    """
    bucket = F.lit(0)
    for e in edges:
        bucket = bucket + F.when(F.col(token_col) > F.lit(e), 1).otherwise(0)
    key = F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    keyed = df.select(
        F.col(id_col),
        F.col(token_col),
        bucket.cast("int").alias("len_bucket"),
        key.alias("__key"),
    ).withColumn("__salt", F.substring("__key", 1, salt_chars))

    counts = keyed.groupBy("len_bucket", "__salt").agg(
        F.count(F.lit(1)).alias("__n")
    )
    # <= n_len_buckets * 256 rows: metadata-scale running offset per bucket
    off_w = (
        W.partitionBy("len_bucket")
        .orderBy("__salt")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "len_bucket",
        "__salt",
        F.coalesce(F.sum("__n").over(off_w), F.lit(0)).alias("__offset"),
    )
    rn_w = W.partitionBy("len_bucket", "__salt").orderBy("__key", id_col)
    pos = F.col("__offset") + F.row_number().over(rn_w)
    return (
        keyed.join(F.broadcast(offsets), ["len_bucket", "__salt"])
        .select(
            F.col(id_col),
            F.col(token_col),
            "len_bucket",
            F.floor((pos - F.lit(1)) / F.lit(batch_size))
            .cast("long")
            .alias("batch"),
        )
    )
