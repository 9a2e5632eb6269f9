"""Tokenizer-construction queries over ``documents`` — the BPE train /
encode surface (``operators/bpe.py``).

Both queries are rows-only in the driver gate: BPE training is an
iterative algorithm (a driver loop of vocabulary-sized aggregates) with no
single-statement SQL equivalent. Correctness is pinned the strong way
instead: ``tests/test_bpe.py`` compares the Spark trainer's full merge
sequence — and the encoder's token streams — for EXACT equality against a
pure-Python mirror of the algorithm, at both ``batch_size=1`` (classic
sequential BPE) and the batched form, plus the replay invariant (encoding
the training corpus reproduces the trainer's final symbol state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stupidb_spark.functions import exact as X
from stupidb_spark.queryset import q
from stupidb_spark.sources import load_table

# One tokenizer spec shared by both queries so the encode query scores
# documents under exactly the merge table the merges query reports.
# batch_size=8 with adaptive growth (round 11: the measured deep-run
# posture, scripts/bpe_scale_probe.py) → 48 merges in 3 rounds (caps
# 8→16→32) vs 6 fixed; the merge table changes accordingly — both queries
# are rows-only in the gate and the trainer↔mirror differentials pin the
# adaptive sequence exactly (tests/test_bpe.py).
_N_MERGES = 48
_BATCH = 8


def _train(spark: SparkSession, sf_dir: str):
    from stupidb_spark.operators.bpe import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    return docs, bpe_train(
        docs, id_col="doc_id", text_col="text",
        n_merges=_N_MERGES, batch_size=_BATCH, adaptive_batch=True,
    )


@q("tok_bpe_merges")  # rows-only: iterative trainer; exact differential
# vs the pure-Python mirror in tests/test_bpe.py
def tok_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The learned tokenizer itself, as a relation: rank-ordered merge
    # rules with their selection-time pair counts — the durable artifact
    # a pipeline persists next to its corpus snapshot. One corpus pass
    # (word counts), then 6 vocabulary-sized rounds; the driver holds only
    # the 48 rules.
    from stupidb_spark.operators.bpe import bpe_merges_df

    _, merges = _train(spark, sf_dir)
    return bpe_merges_df(spark, merges).orderBy("rank")


@q("tok_bpe_encode")  # rows-only: tokenization depends on the trained
# rules; token-stream equality vs the mirror is pinned in tests/test_bpe.py
def tok_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-document subword statistics under the trained tokenizer — the
    # budget numbers a pretraining pipeline actually consumes (real token
    # counts, not the whitespace proxy): token count, distinct-token
    # count, and compression (alphabetic chars per token). Encoding is
    # map-only: the 48-rule model rides inside the Arrow-vectorized UDF.
    from stupidb_spark.operators.bpe import bpe_encode

    docs, merges = _train(spark, sf_dir)
    enc = bpe_encode(docs, merges, id_col="doc_id", text_col="text")
    n_alpha = F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z]", ""))
    return (
        enc.select(
            "doc_id",
            F.size("tokens").alias("n_tokens"),
            F.size(F.array_distinct("tokens")).alias("n_token_types"),
            n_alpha.alias("n_alpha"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_token_types",
            X.dround(
                F.when(F.col("n_tokens") > 0, F.col("n_alpha").cast("double") / F.col("n_tokens")).otherwise(F.lit(0.0)),
                6,
            ).alias("chars_per_token"),
        )
    )
