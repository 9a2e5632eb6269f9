"""Multimodal pipeline queries over the ``documents`` table.

The decode-family queries (``multimodal_decode``/``frames``/``audio``/
``features``) carry no SQL oracles — binary payload synthesis/decoding is
not SQL-expressible — so the driver records the weaker rows-only check
there; determinism and value-level behavior are pinned by
tests/test_multimodal.py instead (every payload byte is a pure function of
doc_id, so results are reproducible across runs and partitionings).

The ``*_exact`` lanes close that gap with hash signals: the synthetic
payloads are sha256-seeded in closed form, so DuckDB re-derives every
DECODED scalar without parsing a container byte while Spark round-trips
the real BMP/WAV/y4m bytes — a hash match certifies the whole
encode+decode path. ``multimodal_features_exact`` covers per-doc scalars
across all three modalities; ``multimodal_audio_exact`` and
``multimodal_frames_exact`` extend the pattern to the sample-level
decoders (WAV sample folds, per-frame luma folds) with pure-integer
signals — no float appears anywhere, so the comparison has zero
rounding surface.
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


_AUD_EXACT_SQL_TEMPLATE = """
    -- Exact-integer re-derivation of the decoded WAV sample folds: one
    -- 32-byte sha256 digest cycle holds 16 little-endian int16 samples;
    -- the payload repeats it cyclically, so per-doc sums are
    -- (full cycles) * (cycle fold) + (tail fold). All BIGINT arithmetic —
    -- no float anywhere on either engine.
    WITH aud AS (
        SELECT doc_id,
               160 + (doc_id % 7) * 40 AS n,
               {digest} AS d
        FROM documents WHERE doc_id % 3 = 1
    ),
    samp AS (
        SELECT doc_id, n,
               list_transform(range(0, 16), k ->
                   CAST(d[2*k+1] + 256 * d[2*k+2]
                        - CASE WHEN d[2*k+2] >= 128 THEN 65536 ELSE 0 END
                        AS BIGINT)) AS s
        FROM aud
    )
    SELECT doc_id,
           CAST(8000 AS INTEGER) AS sample_rate_hz,
           CAST(n AS INTEGER) AS n_samples,
           CAST(n * 1000 // 8000 AS INTEGER) AS duration_ms,
           CAST((n // 16) * list_sum(s)
                + coalesce(list_sum(s[1:n % 16]), 0) AS BIGINT) AS sum_samples,
           CAST((n // 16) * list_sum(list_transform(s, x -> x * x))
                + coalesce(list_sum(list_transform(s[1:n % 16], x -> x * x)), 0)
                AS BIGINT) AS sum_sq,
           -- n >= 160 > 16: every cycle position occurs in a full cycle,
           -- so the peak is the max |sample| over one cycle
           CAST(list_max(list_transform(s, x -> abs(x))) AS INTEGER) AS peak
    FROM samp
"""


_FRAMES_EXACT_SQL_TEMPLATE = """
    -- Exact-integer re-derivation of every-2nd-frame sampling: each y4m
    -- frame is 64 luma bytes = one 32-byte sha256 digest twice, so a
    -- sampled frame's byte sum is 2 * digest sum — recomputed per sampled
    -- frame index in closed form, never touching a container byte.
    WITH vid AS (
        SELECT doc_id, 4 + doc_id % 13 AS nf
        FROM documents WHERE doc_id % 3 = 2
    ),
    fl AS (
        SELECT doc_id, nf,
               list_transform(range(0, nf, 2), i ->
                   2 * list_sum({digest})) AS fs
        FROM vid
    )
    SELECT doc_id,
           CAST(len(fs) AS BIGINT) AS n_sampled,
           CAST(len(fs) * 64 AS BIGINT) AS sampled_bytes,
           CAST(list_sum(fs) AS BIGINT) AS luma_sum,
           CAST(list_max(fs) AS BIGINT) AS max_frame_luma,
           CAST(2 * ((nf - 1) // 2) AS INTEGER) AS last_sampled_index
    FROM fl
"""


def _sql_digest_bytes(key_expr: str) -> str:
    """DuckDB fragment: the 32 bytes of ``sha256(key_expr)`` as an int
    list, parsed from the hex text two chars at a time (DuckDB exposes no
    blob byte indexing). Mirrors ``operators.multimodal._rand_bytes``'s
    seed; cyclic repetition is handled by the callers' modular sums."""
    # lambda variable deliberately NOT `i`/`k`: the video branch nests this
    # inside a frame-index lambda, and DuckDB scoping would let an inner
    # `i` shadow the outer frame index inside key_expr (observed: every
    # video signal silently wrong before the rename)
    return (
        "list_transform(range(1, 33), bi ->"
        f" (strpos('0123456789abcdef', sha256({key_expr})[2*bi-1:2*bi-1]) - 1) * 16"
        f" + (strpos('0123456789abcdef', sha256({key_expr})[2*bi:2*bi]) - 1))"
    )


_MM_EXACT_SQL = f"""
    -- Independent re-derivation of every decoded multimodal scalar: the
    -- synthetic payloads are pure functions of doc_id (sha256-seeded bytes
    -- in closed form), so DuckDB recomputes the DECODED values without
    -- parsing a single container byte, while the Spark side round-trips
    -- real BMP/WAV/y4m bytes (synthesize -> encode -> decode). A hash
    -- match therefore certifies the whole encode+decode byte path.
    WITH img AS (
        SELECT doc_id,
               8 + doc_id % 9          AS w,
               8 + (doc_id // 9) % 9   AS h,
               {_sql_digest_bytes("'img:' || doc_id")} AS d
        FROM documents WHERE doc_id % 3 = 0
    ),
    img_out AS (
        SELECT doc_id, 'image' AS modality,
               CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
               CAST(w * h * 3 AS BIGINT) AS n_units,
               CAST(NULL AS BIGINT) AS duration_ms,
               -- mean over the first w*h*3 bytes of the cyclically
               -- repeated 32-byte digest: exact int sum -> one divide
               CAST((w * h * 3 // 32) * list_sum(d)
                    + coalesce(list_sum(d[1:(w * h * 3) % 32]), 0)
                    AS DOUBLE) / (w * h * 3) AS signal
        FROM img
    ),
    aud AS (
        SELECT doc_id,
               160 + (doc_id % 7) * 40 AS n,
               {_sql_digest_bytes("'aud:' || doc_id")} AS d
        FROM documents WHERE doc_id % 3 = 1
    ),
    aud_sq AS (
        -- the 16 int16 LE samples one 32-byte digest cycle holds, squared
        SELECT doc_id, n,
               list_transform(range(0, 16), k ->
                   CAST(d[2*k+1] + 256 * d[2*k+2]
                        - CASE WHEN d[2*k+2] >= 128 THEN 65536 ELSE 0 END
                        AS BIGINT)
                   * CAST(d[2*k+1] + 256 * d[2*k+2]
                        - CASE WHEN d[2*k+2] >= 128 THEN 65536 ELSE 0 END
                        AS BIGINT)) AS sq
        FROM aud
    ),
    aud_out AS (
        SELECT doc_id, 'audio' AS modality,
               CAST(NULL AS INTEGER) AS width, CAST(NULL AS INTEGER) AS height,
               CAST(n AS BIGINT) AS n_units,
               CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
               sqrt(CAST((n // 16) * list_sum(sq)
                         + coalesce(list_sum(sq[1:n % 16]), 0)
                         AS DOUBLE) / n) AS signal
        FROM aud_sq
    ),
    vid AS (
        SELECT doc_id, 4 + doc_id % 13 AS nf FROM documents WHERE doc_id % 3 = 2
    ),
    vid_out AS (
        SELECT doc_id, 'video' AS modality,
               CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
               CAST((nf + 1) // 2 AS BIGINT) AS n_units,
               CAST(nf * 40 AS BIGINT) AS duration_ms,
               -- every 2nd frame is 64 bytes = the 32-byte digest twice
               CAST(list_sum(list_transform(range(0, nf, 2), i ->
                        2 * list_sum({_sql_digest_bytes(
                            "'vid:' || doc_id || ':' || i")})))
                    AS DOUBLE) / (((nf + 1) // 2) * 64) AS signal
        FROM vid
    )
    SELECT doc_id, modality, width, height, n_units, duration_ms,
           {{dround}} AS signal
    FROM (SELECT * FROM img_out UNION ALL SELECT * FROM aud_out
          UNION ALL SELECT * FROM vid_out)
"""


@q(
    "multimodal_features_exact",
    _MM_EXACT_SQL.format(dround=__import__(
        "stupidb_spark.functions.exact", fromlist=["sql_dround"]
    ).sql_dround("signal", 6)),
)
def multimodal_features_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal family's hash-comparable lane (round-12 verdict
    stretch): one row per document with its DECODED scalar features —
    image (width, height, mean_pixel), audio (n_samples, duration, rms),
    video (frames sampled every 2nd, duration, mean luma) — produced by
    the real byte round-trip (synthesize -> BMP/WAV/y4m encode -> Arrow
    mapInPandas decode), hash-compared against DuckDB's independent
    sha256 closed-form re-derivation of the same values. Exact integer
    sums and correctly-rounded sqrt keep every double engine-identical."""
    from stupidb_spark.functions import exact as X
    from stupidb_spark.operators.multimodal import (
        decode_audio,
        decode_image,
        video_stats,
    )

    media = _media(spark, sf_dir)
    img = decode_image(media).select(
        "doc_id",
        F.lit("image").alias("modality"),
        "width",
        "height",
        (F.col("width") * F.col("height") * 3).cast("long").alias("n_units"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.col("mean_pixel").alias("signal"),
    )
    aud = decode_audio(media).select(
        "doc_id",
        F.lit("audio").alias("modality"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.col("n_samples").cast("long").alias("n_units"),
        F.col("duration_ms").cast("long").alias("duration_ms"),
        F.col("rms").alias("signal"),
    )
    vid = video_stats(media, every_k=2).select(
        "doc_id",
        F.lit("video").alias("modality"),
        "width",
        "height",
        F.col("n_sampled").cast("long").alias("n_units"),
        (F.col("n_frames") * 40).cast("long").alias("duration_ms"),
        F.col("mean_luma").alias("signal"),
    )
    out = img.unionByName(aud).unionByName(vid)
    return out.withColumn("signal", X.dround(F.col("signal"), 6))


@q(
    "multimodal_audio_exact",
    _AUD_EXACT_SQL_TEMPLATE.format(
        digest=_sql_digest_bytes("'aud:' || doc_id")
    ),
)
def multimodal_audio_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio hash lane: per-clip exact integer folds of the DECODED
    samples — sum, sum of squares, peak |amplitude| — from the real WAV
    byte round-trip (synthesize → RIFF encode → Arrow mapInPandas RIFF
    walk → int16 LE parse), hash-compared against DuckDB's sha256
    closed-form cycle arithmetic. Pure-integer signals: unlike the rms
    lane there is no sqrt or divide, so a mismatch can only mean a byte
    was decoded differently."""
    from stupidb_spark.operators.multimodal import audio_stats

    return audio_stats(_media(spark, sf_dir))


@q(
    "multimodal_frames_exact",
    _FRAMES_EXACT_SQL_TEMPLATE.format(
        digest=_sql_digest_bytes("'vid:' || doc_id || ':' || i")
    ),
)
def multimodal_frames_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling hash lane: every-2nd-frame flat-map
    (:func:`frame_sample`, one output row per kept frame) → per-frame
    luma byte sums via the Arrow ``byte_sum`` fold → JVM-side exact
    integer aggregates per document. Certifies the y4m container walk,
    the stride-sampling indices, AND the per-frame byte payloads against
    DuckDB's closed-form digest sums — all BIGINT, zero rounding
    surface."""
    from stupidb_spark.operators.multimodal import byte_sum, frame_sample

    frames = frame_sample(_media(spark, sf_dir), every_k=2)
    per = frames.withColumn("fl", byte_sum("frame_bytes"))
    return per.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(F.length("frame_bytes")).alias("sampled_bytes"),
        F.sum("fl").alias("luma_sum"),
        F.max("fl").alias("max_frame_luma"),
        F.max("frame_index").alias("last_sampled_index"),
    )
