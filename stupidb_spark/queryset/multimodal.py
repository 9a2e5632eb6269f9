"""Multimodal pipeline queries over the ``documents`` table.

No SQL oracles: binary payload synthesis/decoding is not SQL-expressible, so
the driver records the weaker rows-only check; determinism and value-level
behavior are pinned by tests/test_multimodal.py instead (every payload byte
is a pure function of doc_id, so results are reproducible across runs and
partitionings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stupidb_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    extract_features,
    frame_sample,
    synthesize_media,
)
from stupidb_spark.queryset import q
from stupidb_spark.sources import load_table


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return synthesize_media(load_table(spark, sf_dir, "documents"))


@q("multimodal_decode")
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode BMP image payloads (real 24-bit BI_RGB byte parsing) and
    aggregate pixel statistics per size class."""
    return (
        decode_image(_media(spark, sf_dir))
        .groupBy("width", "height")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.round(F.avg("mean_pixel"), 4).alias("avg_mean_pixel"),
        )
    )


@q("multimodal_frames")
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample every 2nd video frame; count sampled frames per document."""
    return (
        frame_sample(_media(spark, sf_dir), every_k=2)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(F.length("frame_bytes")).alias("sampled_bytes"),
        )
    )


@q("multimodal_audio")
def multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode PCM WAV payloads (real RIFF chunk walk) and roll up duration
    and RMS loudness per duration class."""
    return (
        decode_audio(_media(spark, sf_dir))
        .groupBy("sample_rate_hz", "duration_ms")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum("n_samples").alias("total_samples"),
            F.round(F.avg("rms"), 4).alias("avg_rms"),
        )
    )


@q("multimodal_features")
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-projection feature vectors; return per-modality norm stats
    (vectors are L2-normalized, so every norm must be 1)."""
    # modality is a pure function of doc_id (synthesize_media indexes
    # MODALITIES by doc_id % 3), so derive it from the SAME tuple as an
    # expression — a join back onto the media relation would re-run the
    # whole synthesis subtree a second time
    from stupidb_spark.operators.multimodal import MODALITIES

    feats = extract_features(_media(spark, sf_dir)).withColumn(
        "modality",
        # pmod, not %: Spark's % follows the sign of the dividend, so a
        # negative doc_id would yield index <= 0 here while Python's % in
        # synthesize_media maps negatives to a valid modality.
        F.element_at(
            F.array(*[F.lit(m) for m in MODALITIES]),
            (F.pmod(F.col("doc_id"), F.lit(len(MODALITIES))) + 1).cast("int"),
        ),
    )
    norm = F.sqrt(F.aggregate("features", F.lit(0.0), lambda a, x: a + x * x))
    return (
        feats.select("modality", norm.alias("norm"))
        .groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.min("norm"), 6).alias("min_norm"),
            F.round(F.max("norm"), 6).alias("max_norm"),
        )
    )
