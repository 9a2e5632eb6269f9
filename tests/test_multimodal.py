"""Multimodal plumbing tests: schema, determinism under repartitioning,
real-codec decode goldens (BMP / WAV / y4m), flat-map frame sampling, and
feature-vector invariants."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from stupidb_spark.operators.multimodal import (
    AUDIO_RATE_HZ,
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_audio,
    decode_bmp,
    decode_image,
    decode_wav,
    decode_y4m,
    encode_bmp,
    encode_wav,
    encode_y4m,
    extract_features,
    frame_sample,
    synthesize_media,
)
from stupidb_spark.sources import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").limit(200).cache()


# --------------------------------------------------------------------------
# codec goldens (pure functions, no Spark)
# --------------------------------------------------------------------------


def test_bmp_golden_bytes_and_roundtrip():
    # 2x2 image with known pixels; mean over the 12 channel bytes is exact
    rgb = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    buf = encode_bmp(2, 2, rgb)
    # container invariants of the 24-bit BI_RGB form
    assert buf[:2] == b"BM"
    assert struct.unpack_from("<I", buf, 10)[0] == 54  # pixel offset
    assert struct.unpack_from("<Iii", buf, 14) == (40, 2, 2)  # header, w, h
    assert struct.unpack_from("<HHI", buf, 26) == (1, 24, 0)  # planes/bpp/BI_RGB
    # rows are padded to 4 bytes (2 px * 3 = 6 -> 8) and stored bottom-up BGR
    assert len(buf) == 54 + 2 * 8
    assert buf[54:60] == bytes([255, 0, 0, 30, 20, 10])  # bottom row: BGR
    w, h, mean = decode_bmp(buf)
    assert (w, h) == (2, 2)
    assert mean == sum(rgb) / 12


def test_bmp_rejects_foreign_magic():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"\x89PNG\r\n\x1a\n....")


def test_wav_golden_roundtrip_and_chunk_walk():
    samples = [0, 1000, -1000, 32767, -32768, 0, 0, 0]
    buf = encode_wav(8000, samples)
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE"
    rate, n, dur_ms, rms = decode_wav(buf)
    assert (rate, n, dur_ms) == (8000, 8, 1)
    import math

    # math.sqrt, not ** 0.5: decode_wav uses the correctly-rounded sqrt
    # (libm pow(x, 0.5) measured 1-ulp off on some inputs)
    expect = math.sqrt(sum(s * s for s in samples) / len(samples))
    assert rms == expect
    # chunk walk must tolerate an extra chunk before data (real encoders
    # emit LIST/INFO chunks there)
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = buf[:12] + extra + buf[12:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    assert decode_wav(patched) == (8000, 8, 1, rms)


def test_y4m_golden_roundtrip():
    frames = [bytes(range(64)), bytes(reversed(range(64)))]
    buf = encode_y4m(8, 8, frames)
    assert buf.startswith(b"YUV4MPEG2 W8 H8 ")
    w, h, out = decode_y4m(buf)
    assert (w, h) == (8, 8)
    assert out == frames
    with pytest.raises(ValueError, match="colorspace"):
        decode_y4m(b"YUV4MPEG2 W8 H8 C420\n" + b"FRAME\n" + bytes(64))


# --------------------------------------------------------------------------
# Spark pipeline
# --------------------------------------------------------------------------


def test_media_schema_and_metadata(spark, docs):
    media = synthesize_media(docs)
    assert media.schema == MEDIA_SCHEMA
    img = media.filter(F.col("doc_id") % 3 == 0).first()
    assert img.meta.modality == "image"
    assert bytes(img.payload)[:2] == b"BM"
    # metadata dims must match the real BMP header
    w, h = struct.unpack_from("<ii", bytes(img.payload), 18)
    assert (img.meta.width, img.meta.height) == (w, h)
    aud = media.filter(F.col("doc_id") % 3 == 1).first()
    assert aud.meta.modality == "audio"
    assert bytes(aud.payload)[:4] == b"RIFF"
    vid = media.filter(F.col("doc_id") % 3 == 2).first()
    assert vid.meta.modality == "video"
    assert bytes(vid.payload)[:9] == b"YUV4MPEG2"


def test_synthesis_deterministic_under_partitioning(spark, docs):
    a = synthesize_media(docs).select("doc_id", F.sha2("payload", 256).alias("h"))
    b = synthesize_media(docs.repartition(7)).select(
        "doc_id", F.sha2("payload", 256).alias("h")
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_decode_image_parses_real_bmp(spark, docs):
    media = synthesize_media(docs)
    decoded = decode_image(media)
    n_images = media.filter(F.col("meta.modality") == "image").count()
    assert decoded.count() == n_images > 0
    mismatched = (
        decoded.join(
            media.select(
                "doc_id",
                F.col("meta.width").alias("mw"),
                F.col("meta.height").alias("mh"),
            ),
            "doc_id",
        )
        .filter((F.col("width") != F.col("mw")) | (F.col("height") != F.col("mh")))
        .count()
    )
    assert mismatched == 0
    # channel bytes repeat one 32-byte sha256 digest, so a doc's mean is the
    # mean of ~32 uniform bytes: 127.5 ± ~13 (1σ) — bound at ~5σ
    assert decoded.filter(F.col("mean_pixel").isNull()).count() == 0
    bad = decoded.filter(
        (F.col("mean_pixel") < 60) | (F.col("mean_pixel") > 195)
    )
    assert bad.count() == 0


def test_decode_audio_duration_matches_metadata(spark, docs):
    media = synthesize_media(docs)
    out = decode_audio(media)
    n_audio = media.filter(F.col("meta.modality") == "audio").count()
    assert out.count() == n_audio > 0
    joined = out.join(
        media.select("doc_id", F.col("meta.duration_ms").alias("md")), "doc_id"
    )
    assert joined.filter(F.col("duration_ms") != F.col("md")).count() == 0
    assert out.filter(F.col("sample_rate_hz") != AUDIO_RATE_HZ).count() == 0
    assert out.filter(F.col("rms") <= 0).count() == 0


def test_frame_sample_counts(spark, docs):
    media = synthesize_media(docs)
    frames = frame_sample(media, every_k=2)
    per_doc = frames.groupBy("doc_id").count()
    # every video has 4..16 frames; sampling every 2nd keeps ceil(n/2) = 2..8
    bad = per_doc.filter((F.col("count") < 2) | (F.col("count") > 8)).count()
    assert bad == 0
    # frame bytes are fixed 8x8 mono planes
    assert frames.filter(F.length("frame_bytes") != 64).count() == 0


def test_feature_vectors(spark, docs):
    feats = extract_features(synthesize_media(docs))
    assert feats.filter(F.size("features") != FEATURE_DIM).count() == 0
    norm = F.sqrt(F.aggregate("features", F.lit(0.0), lambda a, x: a + x * x))
    off = feats.select(norm.alias("n")).filter(F.abs(F.col("n") - 1.0) > 1e-5)
    assert off.count() == 0


def test_codecs_fail_loudly_on_truncated_payloads():
    rgb = bytes(range(12))
    bmp = encode_bmp(2, 2, rgb)
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(bmp[:-5])
    wav = encode_wav(8000, [1, 2, 3, 4])
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(wav[:20])
    y4m = encode_y4m(8, 8, [bytes(64)])
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(y4m[:-10])


def test_audio_stats_exact_integer_folds(spark, docs):
    """audio_stats' integer folds agree with decode_wav's float lane:
    rms == sqrt(sum_sq / n) exactly (same exact-int -> one-divide ->
    correctly-rounded-sqrt recipe), and the closed-form sample synthesis
    is reproduced byte-for-byte."""
    import math

    from stupidb_spark.operators.multimodal import audio_stats, decode_audio

    media = synthesize_media(docs).cache()
    stats = {
        r["doc_id"]: r
        for r in audio_stats(media).collect()
    }
    assert stats, "fixture slice contains no audio docs"
    for r in decode_audio(media).collect():
        s = stats[r["doc_id"]]
        assert s["n_samples"] == r["n_samples"]
        want = math.sqrt(s["sum_sq"] / s["n_samples"])
        assert r["rms"].hex() == want.hex()  # bit-identical doubles
        assert 0 <= s["peak"] <= 32768
    # closed-form check against the synthesizer for one doc
    row = audio_stats(media).orderBy("doc_id").first()
    from stupidb_spark.operators.multimodal import _rand_bytes
    n = row["n_samples"]
    samples = struct.unpack(f"<{n}h", _rand_bytes(f"aud:{row['doc_id']}", n * 2))
    assert row["sum_samples"] == sum(samples)
    assert row["sum_sq"] == sum(x * x for x in samples)
    assert row["peak"] == max(abs(x) for x in samples)
    media.unpersist()


def test_byte_sum_matches_python_fold(spark):
    from stupidb_spark.operators.multimodal import byte_sum

    payloads = [bytes([1, 2, 250]), b"", bytes(range(256)), None]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "i long, b binary"
    )
    got = {r["i"]: r["s"] for r in df.select("i", byte_sum("b").alias("s")).collect()}
    assert got == {0: 253, 1: 0, 2: sum(range(256)), 3: None}
