"""Multimodal plumbing tests: schema, determinism under repartitioning,
decode correctness on the fake container, flat-map frame sampling, and
feature-vector invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stupidb_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_image,
    extract_features,
    frame_sample,
    synthesize_media,
)
from stupidb_spark.sources import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").limit(200).cache()


def test_media_schema_and_metadata(spark, docs):
    media = synthesize_media(docs)
    assert media.schema == MEDIA_SCHEMA
    row = media.filter(F.col("doc_id") % 2 == 0).first()
    assert row.meta.modality == "image"
    assert bytes(row.payload).startswith(b"FAKEIMG1")
    # metadata dims must match the payload header
    import struct

    w, h = struct.unpack(">II", bytes(row.payload)[8:16])
    assert (row.meta.width, row.meta.height) == (w, h)


def test_synthesis_deterministic_under_partitioning(spark, docs):
    a = synthesize_media(docs).select("doc_id", F.sha2("payload", 256).alias("h"))
    b = synthesize_media(docs.repartition(7)).select(
        "doc_id", F.sha2("payload", 256).alias("h")
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_decode_image_parses_header(spark, docs):
    media = synthesize_media(docs)
    decoded = decode_image(media)
    # decode output must equal the metadata dims for every image
    n_images = media.filter(F.col("meta.modality") == "image").count()
    assert decoded.count() == n_images
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
    assert decoded.filter(F.col("mean_pixel").isNull()).count() == 0


def test_frame_sample_counts(spark, docs):
    media = synthesize_media(docs)
    frames = frame_sample(media, every_k=2)
    per_doc = frames.groupBy("doc_id").count()
    # every video has 4..16 frames; sampling every 2nd keeps ceil(n/2) = 2..8
    bad = per_doc.filter((F.col("count") < 2) | (F.col("count") > 8)).count()
    assert bad == 0
    # frame bytes are fixed 8x8
    assert frames.filter(F.length("frame_bytes") != 64).count() == 0


def test_feature_vectors(spark, docs):
    feats = extract_features(synthesize_media(docs))
    assert feats.filter(F.size("features") != FEATURE_DIM).count() == 0
    norm = F.sqrt(F.aggregate("features", F.lit(0.0), lambda a, x: a + x * x))
    off = feats.select(norm.alias("n")).filter(F.abs(F.col("n") - 1.0) > 1e-5)
    assert off.count() == 0
