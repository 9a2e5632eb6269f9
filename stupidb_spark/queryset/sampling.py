"""Corpus sampling / mixture queries over ``documents``.

Training-data pipelines rarely train on the raw corpus: overrepresented
sources get downsampled (stratified sampling) and high-value sources get
repeated (epoch mixture weighting). Both are expressed here as
deterministic Column arithmetic — no RNG — so results are reproducible
under any partitioning and hash-comparable against the DuckDB oracle.

Determinism discipline: the sampling decision is a multiplicative-hash of
the row id (``(doc_id * a + c) mod m``), NOT ``rand()`` — the same row is
kept or dropped on every engine, every rerun, every partitioning. At
100 TB this also means a resumed/replayed job samples identically, which
``rand()``-based sampling does not guarantee under retry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stupidb_spark.functions import exact as X
from stupidb_spark.queryset import q
from stupidb_spark.sources import load_table

# LCG-style mixing constants (glibc's); doc_id fits comfortably in int64
# at any realistic corpus size (hash stays < 2^63 for doc_id < ~8.3e9 —
# for larger corpora swap in xxhash64 on the Spark side and a matching
# 128-bit-safe form in the oracle).
_A, _C, _M = 1103515245, 12345, 1000

# per-source keep-rate in permille: "src0".."src9" keep 30%, rest 10%
_RATE = "CASE WHEN CAST(substr(source, 4) AS BIGINT) < 10 THEN 300 ELSE 100 END"

# per-source epochs: first 5 sources ×3, next 5 ×2, rest ×1
_EPOCHS = (
    "CASE WHEN CAST(substr(source, 4) AS BIGINT) < 5 THEN 3 "
    "WHEN CAST(substr(source, 4) AS BIGINT) < 10 THEN 2 ELSE 1 END"
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


@q(
    "sample_stratified",
    f"""
    WITH d AS (
        SELECT source,
               {_RATE} AS rate,
               ((doc_id * {_A} + {_C}) % {_M}) < {_RATE} AS keep
        FROM documents
    )
    SELECT source,
           count(*)                          AS n_total,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           {X.sql_dround('CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / count(*)', 4)} AS kept_ratio
    FROM d GROUP BY source
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum downsampling: each source keeps a
    configured fraction of its documents, decided by id-hash arithmetic.

    The keep decision is a scan-fused Column expression — at 100 TB this
    is a zero-shuffle filter (the rollup here exists to oracle the rates);
    the sampled corpus itself is ``df.filter(keep)``.
    """
    src_num = F.substring("source", 4, 10).cast("long")
    rate = F.when(src_num < 10, F.lit(300)).otherwise(F.lit(100))
    keep = F.pmod(F.col("doc_id") * _A + _C, F.lit(_M)) < rate
    d = _docs(spark, sf_dir).select("source", keep.alias("keep"))
    kept = F.sum(F.when(F.col("keep"), 1).otherwise(0))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        kept.cast("long").alias("n_kept"),
        X.dround(kept.cast("double") / F.count(F.lit(1)), 4).alias("kept_ratio"),
    )


@q(
    "mixture_epochs",
    f"""
    WITH d AS (SELECT doc_id, source, {_EPOCHS} AS epochs FROM documents)
    SELECT doc_id, source,
           unnest(generate_series(1, epochs)) AS epoch
    FROM d
    """,
)
def mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch mixture weighting: repeat each document ``epochs(source)``
    times, tagged with its epoch index — the materialized form of a
    training mixture where high-value sources are seen multiple times.

    ``explode(sequence(...))`` is a generator, not a join: rows fan out
    inside the scan stage with no shuffle. The downstream trainer usually
    follows with ``pack_sequences``-style packing keyed on (epoch, pack).
    """
    src_num = F.substring("source", 4, 10).cast("long")
    epochs = (
        F.when(src_num < 5, F.lit(3)).when(src_num < 10, F.lit(2)).otherwise(F.lit(1))
    )
    return (
        _docs(spark, sf_dir)
        .select("doc_id", "source", epochs.alias("epochs"))
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1), F.col("epochs"))).alias("epoch"),
        )
    )


# weighted-sampling mixing constants: Knuth multiplicative + LCG increment,
# all intermediates < 2^63 for doc_id < ~4e9. Production swaps xxhash64 for
# better mixing (Spark-side only — then the check degrades to rows-only).
_WA, _WB, _WC, _WM = 1103515245, 2654435761, 12345, 2147483647

# per-source integer weights: the mixture knob (first 5 sources 3 tickets,
# next 5 two, the rest one)
_W = (
    "CASE WHEN CAST(substr(source, 4) AS BIGINT) < 5 THEN 3 "
    "WHEN CAST(substr(source, 4) AS BIGINT) < 10 THEN 2 ELSE 1 END"
)


@q(
    "sample_weighted",
    f"""
    -- Weighted sampling WITHOUT replacement via best-of-w tickets: doc d
    -- with weight w holds w lottery tickets; rank docs by their best
    -- (minimum) ticket and keep the top 100. Winning probability is
    -- proportional to ticket count, successive ranks sample without
    -- replacement — the classic lottery scheme, in exact integer
    -- arithmetic (same LCG on both engines), so the selected SET is
    -- bit-reproducible under any partitioning.
    WITH t AS (
        SELECT doc_id, source, {_W} AS w,
               min((doc_id * {_WA} + ticket.t * {_WB} + {_WC}) % {_WM})
                   AS best_ticket
        FROM documents
        CROSS JOIN generate_series(1, 3) AS ticket(t)
        WHERE ticket.t <= {_W}
        GROUP BY doc_id, source, w
    )
    SELECT doc_id, source, w, best_ticket
    FROM t
    ORDER BY best_ticket, doc_id
    LIMIT 100
    """,
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mixture-weighted corpus selection: explode each doc into its w
    # tickets inside the scan stage (sequence + explode — no join), take the
    # per-doc min ticket in one hash agg, then a global top-100 that fuses
    # to TakeOrderedAndProject (per-partition top-k + driver merge, no
    # global sort). The deterministic tickets make a retried/resumed job
    # select the identical sample — rand()-based sampling does not.
    w = (
        F.when(F.substring("source", 4, 10).cast("long") < 5, F.lit(3))
        .when(F.substring("source", 4, 10).cast("long") < 10, F.lit(2))
        .otherwise(F.lit(1))
    )
    docs = _docs(spark, sf_dir).select("doc_id", "source", w.alias("w"))
    ticket = (
        F.col("doc_id") * _WA + F.col("t") * _WB + _WC
    ) % _WM
    return (
        docs.select(
            "doc_id", "source", "w", F.explode(F.sequence(F.lit(1), F.col("w"))).alias("t")
        )
        .select("doc_id", "source", "w", ticket.alias("ticket"))
        .groupBy("doc_id", "source", "w")
        .agg(F.min("ticket").alias("best_ticket"))
        .orderBy("best_ticket", "doc_id")
        .limit(100)
    )


@q(
    "sample_group_topk",
    """
    -- Deterministic exactly-k-per-group sampling: each source keeps its 3
    -- documents with the smallest md5(doc_id) — a fixed-size, seedless,
    -- reproducible group sample (the hash is the shuffle; the order is a
    -- total order, so both engines select the identical rows).
    SELECT source, rk, doc_id FROM (
        SELECT source, doc_id,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents
    ) WHERE rk <= 3
    """,
)
def sample_group_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-group deterministic sample, skew-safe.

    The naive single window (the oracle's form) buffers a WHOLE group in
    one WindowExec task — at 100 TB a hot source is the mega-document
    problem again. Spark side therefore runs the salted two-phase top-k:
    phase 1 ranks within (source, salt) and keeps k per salt bucket
    (bounding every task at group/n_salts rows), phase 2 re-ranks the
    ≤ k·n_salts survivors per source — the true top-k survive phase 1 by
    construction (each ranks ≤ k inside its own bucket). Same rows, same
    ranks as the single window; n_salts scales with expected group size.
    """
    from pyspark.sql.window import Window

    k, n_salts = 3, 8
    d = _docs(spark, sf_dir).select(
        "source",
        "doc_id",
        F.md5(F.col("doc_id").cast("string").cast("binary")).alias("__h"),
    )
    salt = F.pmod(F.xxhash64("doc_id"), F.lit(n_salts))
    w1 = Window.partitionBy("source", salt).orderBy("__h", "doc_id")
    survivors = d.withColumn("__rn", F.row_number().over(w1)).where(
        F.col("__rn") <= k
    )
    w2 = Window.partitionBy("source").orderBy("__h", "doc_id")
    return (
        survivors.withColumn("rk", F.row_number().over(w2))
        .where(F.col("rk") <= k)
        .select("source", "rk", "doc_id")
    )


# group-split mixing constants: same portable-LCG discipline as the
# sampling hashes above (engine-identical integer arithmetic; production
# swaps operators/splits.py's xxhash64 form — then the check is rows-only)
_SA, _SC, _SM = 2654435761, 40503, 1000


@q(
    "sample_split_leakproof",
    f"""
    -- Leakage-safe train/val/test split: the split is a hash of the GROUP
    -- (source), not the row, so every document of a source lands in the
    -- same split — no near-duplicate pair from one site can straddle the
    -- train/eval fence. 80/10/10 by group hash.
    SELECT doc_id, source,
           CASE WHEN (CAST(substr(source, 4) AS BIGINT) * {_SA} + {_SC}) % {_SM} < 800 THEN 'train'
                WHEN (CAST(substr(source, 4) AS BIGINT) * {_SA} + {_SC}) % {_SM} < 900 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def sample_split_leakproof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-cohesive dataset split (operators/splits.py semantics): the
    assignment hashes ``source`` — the leakage group — so same-source
    documents can never straddle train/eval. Zero shuffles: the tag is a
    scan-fused Column expression; at 100 TB the split is free.

    This registered form uses the portable LCG hash on the numeric source
    id so DuckDB replays it bit-identically; production callers use
    :func:`stupidb_spark.operators.splits.leakproof_split` (xxhash64 on
    the raw group string — better mixing, Spark-side only)."""
    src_num = F.substring("source", 4, 10).cast("long")
    h = F.pmod(src_num * _SA + _SC, F.lit(_SM))
    split = (
        F.when(h < 800, F.lit("train"))
        .when(h < 900, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return _docs(spark, sf_dir).select("doc_id", "source", split.alias("split"))
