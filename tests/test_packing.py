"""Sequence-packing invariants: capacity respected, every doc assigned
exactly once, determinism, and the cumsum form's overflow bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from stupidb_spark.functions import text as T
from stupidb_spark.operators.packing import pack_by_cumsum, pack_greedy
from stupidb_spark.sources import load_table
from tests.conftest import SF_DIR

CAPACITY = 2048


def _tokens(spark):
    return load_table(spark, SF_DIR, "documents").select(
        "doc_id", T.token_count("text").alias("n_tokens")
    )


def test_greedy_packs_respect_capacity(spark):
    t = _tokens(spark)
    out = pack_greedy(
        t, id_col="doc_id", token_col="n_tokens", capacity=CAPACITY, n_buckets=8
    )
    packs = out.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("total"), F.count(F.lit(1)).alias("n")
    )
    # a pack over capacity must be a single oversized document
    bad = packs.filter((F.col("total") > CAPACITY) & (F.col("n") > 1)).count()
    assert bad == 0
    # every doc assigned exactly once
    assert out.count() == t.count()
    assert out.select("doc").distinct().count() == t.count()


def test_greedy_is_deterministic(spark):
    t = _tokens(spark)
    kw = dict(id_col="doc_id", token_col="n_tokens", capacity=CAPACITY, n_buckets=8)
    a = sorted(map(tuple, pack_greedy(t, **kw).collect()))
    b = sorted(map(tuple, pack_greedy(t, **kw).collect()))
    assert a == b


def test_greedy_tighter_than_cumsum(spark):
    """FFD should never need more packs than the streaming chunker."""
    t = _tokens(spark)
    greedy = pack_greedy(
        t, id_col="doc_id", token_col="n_tokens", capacity=CAPACITY, n_buckets=1
    )
    chunked = pack_by_cumsum(
        t, token_col="n_tokens", order_col="doc_id", capacity=CAPACITY
    )
    n_greedy = greedy.select("pack_id").distinct().count()
    n_chunk = chunked.select("pack_id").distinct().count()
    assert n_greedy <= n_chunk


def test_cumsum_overflow_bounded(spark):
    """Chunk packing may overflow a pack only by its last (straddling)
    document: total - last_doc_tokens < capacity."""
    t = _tokens(spark)
    p = pack_by_cumsum(
        t, token_col="n_tokens", order_col="doc_id", capacity=CAPACITY
    )
    stats = p.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("total"),
        F.max_by("n_tokens", "doc_id").alias("last_tokens"),
    )
    bad = stats.filter(F.col("total") - F.col("last_tokens") >= CAPACITY).count()
    assert bad == 0


def test_bucketed_batches_full_except_last(spark):
    from stupidb_spark.operators.packing import bucketed_batches

    out = bucketed_batches(
        _tokens(spark).withColumnRenamed("n_tokens", "n_tok"),
        id_col="doc_id",
        token_col="n_tok",
        batch_size=32,
        seed="t",
    )
    sizes = out.groupBy("len_bucket", "batch").count().collect()
    per_bucket = {}
    for r in sizes:
        per_bucket.setdefault(r.len_bucket, []).append((r.batch, r["count"]))
    for bucket, batches in per_bucket.items():
        batches.sort()
        # consecutive ids from 0, every batch exactly full except the last
        assert [b for b, _ in batches] == list(range(len(batches)))
        assert all(n == 32 for _, n in batches[:-1])
        assert 1 <= batches[-1][1] <= 32


def test_bucketed_batches_partitioning_independent_and_seeded(spark):
    from stupidb_spark.operators.packing import bucketed_batches

    toks = _tokens(spark).withColumnRenamed("n_tokens", "n_tok")
    kw = dict(id_col="doc_id", token_col="n_tok", batch_size=16)
    a = sorted(map(tuple, bucketed_batches(toks, seed="s1", **kw).collect()))
    b = sorted(
        map(
            tuple,
            bucketed_batches(
                toks.repartition(13, F.col("doc_id")), seed="s1", **kw
            ).collect(),
        )
    )
    assert a == b  # adversarial repartition: identical assignment
    c = sorted(map(tuple, bucketed_batches(toks, seed="s2", **kw).collect()))
    assert a != c  # new seed = new within-bucket order
    # but bucket membership is seed-independent (it's a pure length function)
    key = lambda rows: sorted((r[0], r[2]) for r in rows)  # noqa: E731
    assert key(a) == key(c)
