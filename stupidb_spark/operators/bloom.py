"""Bloom-filter n-gram contamination — the corpus-scale variant of the
exact broadcast-set check.

``queryset/prep.py::contamination_ngram`` broadcasts the benchmark's exact
distinct-gram relation to a map-side join. That is the right plan while the
benchmark gram set fits a broadcast comfortably; with a large eval suite at
100 TB (hundreds of millions of grams) the exact relation is GBs per
executor. A Bloom filter over the gram *hashes* is MBs at the same
coverage, with a one-sided error: **no false negatives** — every document
the exact check flags is flagged here too — and a tunable false-positive
rate that only ever over-counts hits.

Plan shape: gram hashing stays JVM-side (``xxhash64`` in the scan stage);
the driver collects only the benchmark's distinct 64-bit hashes (8 bytes
per gram — bounded by the benchmark-suite contract, the same bound the
exact broadcast already relies on), packs them into a numpy bit array, and
ships the bits to executors inside a vectorized pandas UDF closure (one
broadcast). Membership tests run k double-hash probes per gram as fused
numpy ops over each Arrow batch. One groupBy(doc) shuffle, nothing else.

No reference parity (the reference has no set-membership operators) and no
SQL oracle (the filter is approximate by construction); the zero-false-
negative contract is pinned differentially against the exact operator.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mix64(z: np.ndarray) -> np.ndarray:
    """Deterministic uint64 avalanche (splitmix64-style add/mul/xor-shift);
    derives the second double-hashing stream from the first."""
    z = (z + np.uint64(0x9E3779B97F4A7C15)) ^ (
        (z + np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(30)
    )
    z = (z * np.uint64(0xBF58476D1CE4E5B9)) ^ (
        (z * np.uint64(0xBF58476D1CE4E5B9)) >> np.uint64(27)
    )
    return (z * np.uint64(0x94D049BB133111EB)) ^ (
        (z * np.uint64(0x94D049BB133111EB)) >> np.uint64(31)
    )


class NumpyBloom:
    """Bit-array Bloom filter over 64-bit hashes, fully vectorized.

    Double hashing (Kirsch & Mitzenmacher): probe i uses h1 + i·h2, which
    preserves the classic false-positive bound with only two base hashes.
    The object is a plain (bits, m, k) triple — picklable, so closing a
    pandas UDF over it broadcasts the bits once per executor.
    """

    __slots__ = ("bits", "m", "k")

    def __init__(self, m_bits: int, k: int) -> None:
        self.m = int(m_bits)
        self.k = int(k)
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)

    @classmethod
    def build(cls, hashes: np.ndarray, *, fpp: float = 1e-4) -> "NumpyBloom":
        """Size for ``fpp`` at ``len(hashes)`` items and insert them all."""
        n = max(len(hashes), 1)
        m = int(-n * math.log(fpp) / (math.log(2) ** 2)) + 64
        k = max(1, round(m / n * math.log(2)))
        bloom = cls(m, k)
        bloom.add(np.asarray(hashes).astype(np.uint64))
        return bloom

    def _positions(self, h: np.ndarray) -> np.ndarray:
        h1 = h
        h2 = _mix64(h) | np.uint64(1)  # odd → full-period stride
        i = np.arange(self.k, dtype=np.uint64)
        return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.m)

    def add(self, h: np.ndarray) -> None:
        pos = self._positions(h).ravel()
        np.bitwise_or.at(
            self.bits,
            (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def contains(self, h: np.ndarray) -> np.ndarray:
        """Vectorized membership: True iff all k probe bits are set."""
        pos = self._positions(h)
        words = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        return (
            ((words >> (pos & np.uint64(63))) & np.uint64(1)).all(axis=1)
        )

    @property
    def n_bytes(self) -> int:
        return self.bits.nbytes


def bloom_contamination(
    corpus: DataFrame,
    bench: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    fpp: float = 1e-4,
) -> DataFrame:
    """Per corpus document: distinct k-gram count and how many grams *may*
    appear in the benchmark (Bloom membership over gram hashes).

    Returns (doc_id, n_grams, n_hits, contaminated) — same schema as the
    exact ``contamination_ngram``; ``n_hits``/``contaminated`` are upper
    bounds with false-positive rate ``fpp`` and never miss a true hit.
    """
    from stupidb_spark.operators.dedup import doc_shingles

    # Arrow columnar transfer → a true 8-bytes-per-gram driver footprint
    # (a Row-object collect would cost ~100 bytes/gram of transient Python
    # objects, defeating the module's driver-memory contract)
    bench_hashes = (
        doc_shingles(bench, id_col=id_col, text_col=text_col, k=k)
        .select(F.xxhash64("shingle").alias("h"))
        .distinct()
        .toPandas()["h"]
        .to_numpy(dtype=np.int64)
        .astype(np.uint64)
    )
    bloom = NumpyBloom.build(bench_hashes, fpp=fpp)

    @F.pandas_udf("boolean")
    def bloom_hit(h: pd.Series) -> pd.Series:
        return pd.Series(bloom.contains(h.to_numpy().astype(np.uint64)))

    grams = doc_shingles(
        corpus, id_col=id_col, text_col=text_col, k=k
    ).withColumn("__hit", bloom_hit(F.xxhash64("shingle")))
    return (
        grams.groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.col("__hit").cast("long")).alias("n_hits"),
        )
        .select(
            F.col("doc").alias("doc_id"),
            "n_grams",
            "n_hits",
            (F.col("n_hits") > 0).alias("contaminated"),
        )
    )
