"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Beyond-reference surface (the reference is text/number-only). The pattern a
100 TB training-data pipeline needs: media rides as a ``binary`` payload
column with a typed metadata struct; decode / resize / frame-sample /
feature-extract run as Arrow-batched ``mapInPandas`` stages (pandas gets the
whole batch of payloads at once — never row-at-a-time Python).

The real image/audio codecs are NOT in this container, so the codec call is
stubbed exactly as flagged in the build brief: ``decode_image`` first tries
PIL and raises a clearly-marked ``NotImplementedError`` for real formats
without it; the deterministic fake codec (`FAKEIMG`/`FAKEVID` container
formats below, which the synthesizer emits) keeps every piece of Spark-side
plumbing — schema, partition sizing, UDF signature, Arrow batch shape —
real and tested.

Scale notes:
- Payload columns dominate scan bytes → media ops select ONLY the payload +
  key columns (column pruning matters 100× more with binary columns).
- ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory:
  at ~1 MB payloads the default 10k rows/batch would be 10 GB — size it to
  payload bytes (`repartition_for_payloads` + the conf).
- Feature extraction emits small fixed-dim vectors → output is orders of
  magnitude smaller than input; the stage is map-only (no shuffle).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("modality", StringType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate_hz", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("meta", MEDIA_META),
    ]
)

_MAGIC_IMG = b"FAKEIMG1"
_MAGIC_VID = b"FAKEVID1"


# ---------------------------------------------------------------------------
# deterministic synthetic payloads (the container has no codecs; the fixture
# tables have no binary columns — this stands in for `spark.read` of a real
# media dataset, with payloads fully determined by doc_id)
# ---------------------------------------------------------------------------


def _fake_image_bytes(doc_id: int) -> tuple[bytes, int, int]:
    w = 8 + (doc_id % 9)  # 8..16
    h = 8 + ((doc_id // 9) % 9)
    seed = hashlib.sha256(f"img:{doc_id}".encode()).digest()
    body = (seed * ((w * h) // len(seed) + 1))[: w * h]
    return _MAGIC_IMG + struct.pack(">II", w, h) + body, w, h


def _fake_video_bytes(doc_id: int) -> tuple[bytes, int, int]:
    n_frames = 4 + (doc_id % 13)  # 4..16
    frame_w, frame_h = 8, 8
    frames = []
    for i in range(n_frames):
        seed = hashlib.sha256(f"vid:{doc_id}:{i}".encode()).digest()
        frames.append((seed * 2)[: frame_w * frame_h])
    payload = _MAGIC_VID + struct.pack(">III", n_frames, frame_w, frame_h) + b"".join(frames)
    return payload, n_frames, frame_w * frame_h


def synthesize_media(docs: DataFrame, *, modality_col: Column | None = None) -> DataFrame:
    """Attach deterministic fake media payloads to the ``documents`` table.

    Runs as one Arrow-batched ``mapInPandas`` pass; every byte is a pure
    function of ``doc_id`` so the result is identical under any partitioning
    (the same reproducibility contract as exact.py).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            rows = []
            for doc_id in ids:
                if doc_id % 2 == 0:
                    payload, w, h = _fake_image_bytes(doc_id)
                    meta = ("image", "image/x-fake", w, h, None, None)
                else:
                    payload, n_frames, _ = _fake_video_bytes(doc_id)
                    meta = ("video", "video/x-fake", 8, 8, None, n_frames * 40)
                rows.append((doc_id, payload, meta))
            yield pd.DataFrame(rows, columns=["doc_id", "payload", "meta"])

    return docs.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# decode / transform operators
# ---------------------------------------------------------------------------

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_pixel", DoubleType()),
    ]
)


def decode_image(media: DataFrame) -> DataFrame:
    """Decode image payloads → (width, height, mean_pixel).

    Real formats require PIL, which is NOT installed in this container — that
    path is the clearly-marked stub. The FAKEIMG1 container decodes for real:
    header parse + pixel statistics over the byte buffer.
    """

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                if buf.startswith(_MAGIC_IMG):
                    w, h = struct.unpack(">II", buf[8:16])
                    body = buf[16 : 16 + w * h]
                    mean = sum(body) / len(body) if body else None
                    out.append((doc_id, w, h, mean))
                else:
                    try:
                        import PIL.Image  # noqa: F401
                    except ImportError:
                        raise NotImplementedError(
                            "STUB: real image decode needs PIL, which is not "
                            "available in this environment; only the FAKEIMG1 "
                            "test container is decodable here"
                        )
                    raise NotImplementedError("real-codec path not wired yet")
            yield pd.DataFrame(out, columns=["doc_id", "width", "height", "mean_pixel"])

    return media.filter(F.col("meta.modality") == "image").mapInPandas(
        dec, DECODED_SCHEMA
    )


def frame_sample(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Sample every k-th frame of video payloads → one row per kept frame.

    A flat-map shape (rows out > rows in): ``mapInPandas`` handles it
    natively since the output frame length is unconstrained.
    """
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_index", IntegerType()),
            StructField("frame_bytes", BinaryType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                if not buf.startswith(_MAGIC_VID):
                    continue
                n_frames, fw, fh = struct.unpack(">III", buf[8:20])
                frame_len = fw * fh
                for i in range(0, n_frames, every_k):
                    start = 20 + i * frame_len
                    out.append((doc_id, i, buf[start : start + frame_len]))
            yield pd.DataFrame(out, columns=["doc_id", "frame_index", "frame_bytes"])

    return media.filter(F.col("meta.modality") == "video").mapInPandas(
        sample, out_schema
    )


FEATURE_DIM = 16

_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Deterministic feature vector per payload (hash-projection sketch).

    Stands in for a real embedding model (not in this container); the
    Spark-side shape — binary in, small fixed-dim ``array<float>`` out,
    map-only, Arrow-batched — is exactly the production pipeline's.
    """

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                vec = [0.0] * dim
                for i in range(0, len(buf), 8):
                    chunk = buf[i : i + 8]
                    hv = int.from_bytes(
                        hashlib.blake2b(chunk, digest_size=8).digest(), "big"
                    )
                    vec[hv % dim] += ((hv >> 8) % 1000) / 1000.0
                norm = sum(v * v for v in vec) ** 0.5 or 1.0
                out.append((doc_id, [float(v / norm) for v in vec]))
            yield pd.DataFrame(out, columns=["doc_id", "features"])

    return media.mapInPandas(feat, _FEATURES_SCHEMA)


def repartition_for_payloads(
    media: DataFrame,
    est_rows: int,
    *,
    avg_payload_bytes: int = 1 << 20,
    target_partition_bytes: int = 256 << 20,
) -> DataFrame:
    """Size partitions by payload bytes, not row count.

    ``maxPartitionBytes`` governs the scan, but post-shuffle stages need this
    when payloads are MBs: with 1 MB payloads a default 10k-row Arrow batch
    is 10 GB. Partitions = est_rows × payload_bytes / target_bytes.
    """
    parts = max(1, -(-est_rows * avg_payload_bytes // target_partition_bytes))
    return media.repartition(parts)
