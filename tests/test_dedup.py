"""Approximate-dedup validation against exact ground truth (the check the
queryset docstring promises): MinHash-LSH must recover the exact-Jaccard
pair set on the fixtures (near-identical dups ⇒ S-curve recall ~1), and the
banded SimHash pipeline must agree with the reference column-fold
implementation of the fingerprint."""

from __future__ import annotations

from pyspark.sql import functions as F

from stupidb_spark.functions.text import words
from stupidb_spark.operators.dedup import (
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash64,
    simhash_pairs,
    spread_small_scan,
    word_shingles,
)
from stupidb_spark.sources import load_table
from tests.conftest import SF_DIR


def _docs(spark):
    return load_table(spark, SF_DIR, "documents")


def test_minhash_recovers_exact_jaccard_pairs(spark):
    docs = _docs(spark)
    exact = {
        (r.id_a, r.id_b)
        for r in jaccard_pairs(
            docs, id_col="doc_id", text_col="text", threshold=0.5
        ).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            docs, id_col="doc_id", text_col="text", threshold=0.5
        ).collect()
    }
    # verification filters candidates with exact jaccard ⇒ no false positives;
    # fixture dups are near-identical ⇒ LSH recall is 1 here (deterministic)
    assert approx == exact
    assert len(exact) > 0


def test_pair_orientation_and_threshold(spark):
    out = minhash_lsh_pairs(
        _docs(spark), id_col="doc_id", text_col="text", threshold=0.5
    )
    bad = out.filter((F.col("id_a") >= F.col("id_b")) | (F.col("jaccard") < 0.5))
    assert bad.count() == 0


def test_simhash_pipeline_matches_column_fold(spark):
    """The banded (explode → 64 SUM votes) pipeline and the single-column
    HOF fold must produce identical fingerprints — two implementations, one
    definition."""
    docs = _docs(spark).limit(100)
    fold = docs.select(
        F.col("doc_id").alias("doc"), simhash64(F.col("text")).alias("fp_fold")
    )
    toks = spread_small_scan(docs.select(F.col("doc_id").alias("doc"), "text")).select(
        "doc", F.explode(words(F.col("text"))).alias("t")
    )
    h = F.xxhash64("t")
    votes = toks.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(64)
        ]
    )
    fp_col = F.lit(0).cast("long")
    for b in range(64):
        bit_val = F.lit(-(2**63) if b == 63 else (1 << b)).cast("long")
        fp_col = fp_col.bitwiseOR(
            F.when(F.col(f"v{b}") > 0, bit_val).otherwise(F.lit(0).cast("long"))
        )
    agg = votes.select("doc", fp_col.alias("fp_agg"))
    diff = fold.join(agg, "doc").filter(F.col("fp_fold") != F.col("fp_agg"))
    assert diff.count() == 0


def test_simhash_pairs_sane(spark):
    out = simhash_pairs(_docs(spark), id_col="doc_id", text_col="text", max_hamming=8)
    assert out.filter((F.col("id_a") >= F.col("id_b")) | (F.col("hamming") > 8)).count() == 0
    # exact duplicates (jaccard 1.0) have identical fingerprints → hamming 0,
    # so every exact-dup pair must be present
    exact_dups = {
        (r.id_a, r.id_b)
        for r in jaccard_pairs(
            _docs(spark), id_col="doc_id", text_col="text", threshold=0.999
        ).collect()
    }
    found = {(r.id_a, r.id_b) for r in out.collect()}
    assert exact_dups <= found


def test_word_shingles_short_doc_guard(spark):
    df = spark.createDataFrame(
        [(1, "one two"), (2, "one two three four"), (3, "")], "id long, t string"
    )
    out = df.withColumn("_w", words(F.col("t"))).select(
        "id", word_shingles(F.col("_w"), 3).alias("sh")
    )
    rows = {r.id: r.sh for r in out.collect()}
    assert rows[1] == []  # < k words ⇒ no shingles (not garbage slices)
    assert rows[2] == ["one two three", "two three four"]
    assert rows[3] == []
