"""Property tests for the prep operators: chunking invariants, seeded
shuffle permutation laws, PII redaction completeness, contamination
sensitivity. The oracle-parity suite checks engine agreement; these check
the *semantics* are the ones a pipeline needs."""

from __future__ import annotations

from pyspark.sql import functions as F

from stupidb_spark.functions.text import EMAIL_RE, IPV4_RE, redact_pii
from stupidb_spark.operators.chunking import chunk_text
from stupidb_spark.operators.ordering import seeded_positions
from stupidb_spark.sources import load_table
from tests.conftest import SF_DIR


def test_chunks_reconstruct_document(spark):
    """Dropping each chunk's overlap prefix and concatenating in chunk_id
    order must reproduce the original text exactly — no byte lost or
    duplicated at any boundary."""
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    size, stride = 200, 150
    chunks = chunk_text(docs, id_col="doc_id", text_col="text", size=size, stride=stride)
    rebuilt = (
        chunks.withColumn(
            "piece",
            F.when(F.col("chunk_id") == 0, F.col("chunk_text")).otherwise(
                # chars [stride, size) repeat the previous chunk's tail
                F.substring("chunk_text", size - stride + 1, stride)
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("chunk_id", "piece"))).piece
            ).alias("rebuilt")
        )
    )
    joined = docs.join(rebuilt, "doc_id")
    assert joined.filter(F.col("text") != F.col("rebuilt")).count() == 0


def test_chunk_bounds(spark):
    docs = load_table(spark, SF_DIR, "documents")
    chunks = chunk_text(docs, id_col="doc_id", text_col="text", size=200, stride=150)
    bad = chunks.filter(
        (F.length("chunk_text") == 0)
        | (F.length("chunk_text") > 200)
        | (F.col("chunk_start") % 150 != 0)
    )
    assert bad.count() == 0
    # every document yields at least one chunk
    assert chunks.select("doc_id").distinct().count() == docs.count()


def test_seeded_positions_is_permutation(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    n = docs.count()
    out = seeded_positions(docs, id_col="doc_id", seed="s1")
    assert out.count() == n
    assert out.select("pos").distinct().count() == n
    mm = out.agg(F.min("pos").alias("lo"), F.max("pos").alias("hi")).first()
    assert (mm.lo, mm.hi) == (1, n)


def test_seeded_positions_seed_sensitivity_and_stability(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    a = seeded_positions(docs, id_col="doc_id", seed="s1")
    b = seeded_positions(docs, id_col="doc_id", seed="s2")
    a2 = seeded_positions(docs.repartition(7), id_col="doc_id", seed="s1")
    # same seed is identical under any partitioning; different seed is a
    # genuinely different permutation
    assert (
        a.join(a2.withColumnRenamed("pos", "pos2"), "doc_id")
        .filter("pos != pos2")
        .count()
        == 0
    )
    moved = (
        a.withColumnRenamed("pos", "pa")
        .join(b.withColumnRenamed("pos", "pb"), "doc_id")
        .filter("pa != pb")
        .count()
    )
    assert moved > docs.count() * 0.9


def test_redaction_is_complete(spark):
    planted = load_table(spark, SF_DIR, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" a@b.io and 1.2.3.4 plus "),
            F.col("doc_id").cast("string"),
            F.lit("@x.org at 10.0.0."),
            (F.col("doc_id") % 256).cast("string"),
        ).alias("t"),
    )
    red = planted.select(redact_pii(F.col("t")).alias("r"))
    leftovers = red.filter(
        (F.regexp_count("r", F.lit(EMAIL_RE)) > 0)
        | (F.regexp_count("r", F.lit(IPV4_RE)) > 0)
    )
    assert leftovers.count() == 0


def test_contamination_flags_planted_copy(spark):
    """A corpus doc that IS a benchmark doc's text must be fully
    contaminated (n_hits == n_grams)."""
    from stupidb_spark.operators.dedup import doc_shingles

    docs = load_table(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    bench_grams = (
        doc_shingles(bench, id_col="doc_id", text_col="text", k=5)
        .select("shingle")
        .distinct()
    )
    # plant: corpus doc 900001 carries the text of the first benchmark doc
    first_bench = bench.orderBy("doc_id").limit(1).select(
        F.lit(900001).cast("long").alias("doc_id"), "text"
    )
    planted_grams = doc_shingles(
        first_bench, id_col="doc_id", text_col="text", k=5
    )
    n_total = planted_grams.count()
    n_hit = planted_grams.join(F.broadcast(bench_grams), "shingle").count()
    assert n_total > 0 and n_hit == n_total


def test_weighted_sample_overrepresents_heavy_sources(spark):
    """Best-of-w-tickets sampling must tilt selection toward higher-weight
    sources: the weight-3 group's selection rate (selected/corpus share)
    must exceed the weight-1 group's, and the selected set must be exactly
    reproducible run-to-run (deterministic tickets)."""
    from pyspark.sql import functions as F

    from stupidb_spark.queryset import QUERIES
    from stupidb_spark.sources import load_table
    from tests.conftest import SF_DIR

    sel = QUERIES["sample_weighted"](spark, SF_DIR)
    rows = sel.collect()
    assert len(rows) == 100
    again = QUERIES["sample_weighted"](spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    corpus = (
        load_table(spark, SF_DIR, "documents")
        .groupBy("source")
        .count()
        .collect()
    )
    corpus_n = {r.source: r["count"] for r in corpus}
    picked = {}
    for r in rows:
        picked[r.source] = picked.get(r.source, 0) + 1

    def w_of(src):
        i = int(src[3:])
        return 3 if i < 5 else (2 if i < 10 else 1)

    def rate(w):
        group = [src for src in corpus_n if w_of(src) == w]
        total = sum(corpus_n[src] for src in group)
        hits = sum(picked.get(src, 0) for src in group)
        return hits / total

    assert rate(3) > rate(1), (rate(3), rate(1))


def test_bloom_contamination_never_misses_exact_hits(spark):
    # one-sided error contract: every exact hit is a bloom hit (no false
    # negatives), bloom counts only ever over-count, and at fpp=1e-4 the
    # fixture-sized gram universe should see (almost) no over-count at all
    from stupidb_spark.queryset.prep import contamination_bloom, contamination_ngram

    exact = {
        r.doc_id: (r.n_grams, r.n_hits, r.contaminated)
        for r in contamination_ngram(spark, SF_DIR).collect()
    }
    bloom = {
        r.doc_id: (r.n_grams, r.n_hits, r.contaminated)
        for r in contamination_bloom(spark, SF_DIR).collect()
    }
    assert set(exact) == set(bloom)
    over = 0
    for doc_id, (n_grams, n_hits, contaminated) in exact.items():
        bg, bh, bc = bloom[doc_id]
        assert bg == n_grams
        assert bh >= n_hits, f"false negative on doc {doc_id}"
        assert bc or not contaminated
        over += bh - n_hits
    total_grams = sum(v[0] for v in exact.values())
    assert over <= max(5, total_grams * 1e-3)  # fpp=1e-4 with slack


def test_numpy_bloom_basics():
    import numpy as np

    from stupidb_spark.operators.bloom import NumpyBloom

    items = np.arange(10_000, dtype=np.uint64) * np.uint64(2654435761)
    bloom = NumpyBloom.build(items, fpp=1e-3)
    assert bloom.contains(items).all()  # zero false negatives by definition
    probe = np.arange(1, 50_001, dtype=np.uint64) * np.uint64(0x9E3779B9) + np.uint64(7)
    fp = bloom.contains(probe).sum() / len(probe)
    assert fp < 0.01  # ~1e-3 nominal; order-of-magnitude slack
    assert bloom.n_bytes < 64 * 1024  # 10k items at 1e-3 ≈ 18 KB of bits


def test_heavy_hitters_match_exact_topk(spark):
    # two-pass SpaceSaving contract: candidate recall covers every term the
    # exact plan ranks into the top-k (their shares far exceed 1/capacity
    # on the fixture), and recounted counts are EXACT — so the approximate
    # plan's top-k rows equal the exact plan's rows outright
    from stupidb_spark.queryset.prep import terms_heavy_hitters, terms_topk

    exact = sorted(
        (r.lang, r.term, r.n, r.rnk) for r in terms_topk(spark, SF_DIR).collect()
    )
    approx = sorted(
        (r.lang, r.term, r.n, r.rnk)
        for r in terms_heavy_hitters(spark, SF_DIR).collect()
    )
    assert len(exact) > 0
    assert approx == exact


def test_heavy_hitters_null_rows_excluded_explicitly(spark):
    # null contract: a None group or term must neither TypeError inside
    # the SpaceSaving heap nor silently desync the two passes — both
    # passes exclude null rows up front, so the result equals the exact
    # plan over the non-null subset
    from pyspark.sql import Window

    from stupidb_spark.operators.heavyhitters import top_terms_approx

    rows = (
        [("en", t) for t in "a a a b b c".split()]
        + [(None, "a"), ("en", None), (None, None)]
        + [("fr", t) for t in "x x y".split()]
    )
    df = spark.createDataFrame(rows, "lang string, term string")
    got = sorted(
        (r.lang, r.term, r.n, r.rnk)
        for r in top_terms_approx(
            df, group_col="lang", term_col="term", k=2
        ).collect()
    )
    nn = df.filter(F.col("lang").isNotNull() & F.col("term").isNotNull())
    exact = (
        nn.groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "rnk",
            F.row_number()
            .over(Window.partitionBy("lang").orderBy(F.desc("n"), "term"))
            .cast("long"),
        )
        .filter(F.col("rnk") <= 2)
    )
    assert got == sorted((r.lang, r.term, r.n, r.rnk) for r in exact.collect())
