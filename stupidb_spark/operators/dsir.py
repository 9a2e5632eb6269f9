"""DSIR-style importance weighting — hashed n-gram likelihood-ratio
scores for data selection.

Public technique (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling"): featurize every document as hashed word
n-grams, estimate bucketed feature distributions for a TARGET corpus
(what you want more of) and the RAW corpus, and score each raw document
by the log likelihood ratio Σ_grams log(p_target(bucket)/p_raw(bucket)).
Sampling raw data with these weights shifts the selected distribution
toward the target. This module computes the per-document log-weights;
compose with the existing sampling operators
(``queryset/sampling.py``) for the resampling step.

Spark-first shape (100 TB):

- featurize = the shared shingle machinery (``doc_shingles``, distinct
  word n-grams per doc — the distinct-feature variant of DSIR; exploded
  (doc, shingle) rows, whole-stage codegen, no Python);
- bucket = md5-based hash to ``buckets`` buckets — JVM-side
  ``conv(substr(md5(s),1,15),16,10)`` (15 hex chars = 60 bits, exact in
  BIGINT), chosen over xxhash64/crc32 because DuckDB can replay it
  exactly from the same hex text, which is what makes the registered
  query oracle-able;
- the two distributions are ONE ``buckets``-bounded aggregate over the
  exploded rows (map-side combine; the hot-bucket key is the skew guard
  itself — counts, never lists);
- per-bucket log-ratios are computed on that bounded table and
  QUANTIZED to the 2^-20 grid (``floor(x·2^20 + 0.5)`` as BIGINT), so
  the per-document score is an exact int64 sum — order-independent and
  engine-identical, the ``functions/exact.py`` discipline (a raw double
  sum would depend on shingle iteration order and cross-engine ln()
  ulps);
- scoring joins the exploded rows to the ``buckets``-row table
  (broadcast by construction — bounded model state like PQ codebooks)
  and sums per doc: two corpus scans total, no corpus-keyed shuffle
  beyond the per-doc aggregation.

No reference parity: the reference has no text operators; this is part
of the beyond-reference LLM-pipeline surface (SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# log-ratio quantization grid: 2^-20 ≈ 1e-6 resolution, and a 1-ulp
# cross-engine ln() difference (~1e-16 relative) sits ~10 orders of
# magnitude under the grid step, so both engines floor to the same
# integer except with negligible probability.
DSIR_SCALE = float(1 << 20)


def bucket_hash(col: Column | str, buckets: int) -> Column:
    """Deterministic, engine-replayable bucket id in [0, buckets):
    the top 60 bits of md5 (15 hex chars → exact BIGINT) mod buckets.
    DuckDB mirror: :func:`sql_bucket_hash`."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint"),
        F.lit(buckets),
    )


def sql_bucket_hash(expr: str, buckets: int) -> str:
    """DuckDB text form of :func:`bucket_hash` (hex fold, 15 chars)."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"[CAST(strpos('0123456789abcdef', md5({expr})[i:i]) - 1 AS BIGINT) "
        "for i in range(1, 16)]), (acc, c) -> acc * 16 + c) "
        f"% {buckets}"
    )


def dsir_logweights(
    docs: DataFrame,
    target: Column,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 2,
    buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document DSIR log-weights against a target subset.

    ``target`` is a boolean Column over ``docs`` marking the target
    corpus (e.g. ``F.col("lang") == "en"``); the RAW distribution is the
    whole input. Returns one row per document that has at least one
    word ``k``-gram: ``(id_col, n_grams, log_weight)`` where

        log_weight = Σ_grams [ ln((ct(b)+α)/(Ct+α·B))
                             − ln((cr(b)+α)/(Cr+α·B)) ]

    with per-bucket target/raw distinct-gram counts ct/cr, totals Ct/Cr,
    and add-α smoothing (unseen buckets get a finite ratio). Each
    bucket's log-ratio is quantized to the 2^-20 grid before the sum,
    so the result is an exact integer sum rescaled once — identical on
    any engine and under any row order.
    """
    from pyspark.sql import Window

    from stupidb_spark.operators.dedup import doc_shingles
    from stupidb_spark.operators.lineage import cut_lineage

    flagged = docs.select(
        F.col(id_col).alias("doc"), F.col(text_col), target.alias("__t")
    )
    # The target flag rides THROUGH the shingle explode (carry_cols —
    # one boolean per gram row in the shuffle the explode already pays)
    # instead of being re-attached with a gram-scale corpus join; and the
    # exploded relation feeds TWO consumers (the bucket distributions and
    # the scoring join), so the lazy localCheckpoint serves the second
    # from local blocks. Before (r14 profile): every exchange in the
    # query materialized twice — the shingle pipeline, the flag join AND
    # the bucket aggregate each ran 2×.
    ex = cut_lineage(
        doc_shingles(
            flagged, id_col="doc", text_col=text_col, k=k,
            carry_cols=("__t",),
        ).withColumn("bucket", bucket_hash("shingle", buckets)),
        eager=False,
    )
    dist = ex.groupBy("bucket").agg(
        F.count(F.when(F.col("__t"), 1)).alias("ct"),
        F.count(F.lit(1)).alias("cr"),
    )
    a = float(alpha)
    # Totals as whole-table window sums over the ≤ buckets-row dist —
    # one pass, instead of a separate agg job + crossJoin that re-executed
    # the dist subtree (identical doubles: same long sums, same lr
    # expression, same quantization).
    wall = Window.partitionBy()
    tot_t = F.sum("ct").over(wall)
    tot_r = F.sum("cr").over(wall)
    lr = F.log(
        (F.col("ct") + F.lit(a)) / (tot_t + F.lit(a * buckets))
    ) - F.log(
        (F.col("cr") + F.lit(a)) / (tot_r + F.lit(a * buckets))
    )
    ratios = dist.select(
        "bucket",
        F.floor(lr * F.lit(DSIR_SCALE) + F.lit(0.5))
        .cast("bigint")
        .alias("lr_q"),
    )
    scored = ex.join(F.broadcast(ratios), "bucket")  # ≤ buckets rows
    return (
        scored.groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            (F.sum("lr_q") / F.lit(DSIR_SCALE)).alias("log_weight"),
        )
        .select(F.col("doc").alias(id_col), "n_grams", "log_weight")
    )
