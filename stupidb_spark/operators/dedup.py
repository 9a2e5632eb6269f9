"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Beyond-reference surface (SURVEY.md §7) — the reference has no dedup at all.
Everything is expression-level (no Python UDFs): shingling, hashing and
signatures are Catalyst folds over arrays; only the candidate-pair stage
shuffles, and it shuffles *buckets*, never the O(n²) pair space.

Scale design:
- Exact dedup = hash groupBy on the fingerprint → one shuffle keyed evenly.
- MinHash LSH: signature is computed per-row (narrow); candidate generation
  explodes to n_bands rows per doc and self-joins per (band, band_hash)
  bucket — at 100 TB the join key space is wide, buckets are small, and AQE
  handles the occasional hot bucket. Verification joins shingle sets back
  only for candidates.
- SimHash: 64-bit signature per row (narrow fold), banded the same way.
- Embedding near-dup: blocked (label/LSH bucket) pairwise cosine so the
  cross product never materializes globally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stupidb_spark.functions.text import words


def word_shingles(w: Column, k: int = 3) -> Column:
    """Distinct k-word shingles over a **materialized** words-array column.

    Pure Catalyst: transform over a sequence of start offsets → dedupe
    (``slice`` is 1-based). ``w`` MUST be a materialized column (e.g. via
    ``withColumn("_w", words(text))``), not an inline ``words(text)``
    expression: higher-order lambdas have no common-subexpression
    elimination, so an inline expression re-runs the regex split once per
    offset — measured ~50× slower on real documents.
    """
    n = F.size(w)
    # guard n < k: sequence(1, 0) would count DOWN ([1, 0]) and emit garbage
    starts = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    sh = F.transform(starts, lambda i: F.concat_ws(" ", F.slice(w, i, k)))
    return F.array_distinct(sh)


def exact_dedup(
    df: DataFrame, key: Column, id_col: str, *, keep: str = "min"
) -> DataFrame:
    """Exact duplicate grouping on ``key``: one output row per distinct key
    with the kept representative id and the duplicate count.

    The canonical hash-groupBy dedup: one shuffle on the (fingerprint) key.
    """
    keep_expr = F.min(F.col(id_col)) if keep == "min" else F.max(F.col(id_col))
    # No spread here: md5+normalize is cheap enough that an extra
    # repartition costs more than it parallelizes (measured 2×); the groupBy
    # shuffle is the only exchange.
    return (
        df.select(key.alias("__dedup_key"), id_col)
        .groupBy("__dedup_key")
        .agg(keep_expr.alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram-Jaccard near-duplicate pairs (i < j, jaccard ≥ threshold).

    Inverted-index plan: explode distinct shingles, self-join per shingle
    bucket (so only docs sharing ≥1 shingle ever meet — never the full n²),
    count common shingles per pair, then jaccard = common / (|A|+|B|-common).

    Returns columns: id_a, id_b, jaccard.
    """
    # Filter short docs on the *words* column, NOT on size(shingles): a
    # filter referencing the shingle expression gets re-inlined by the
    # optimizer (no CSE through Filter/Generate), re-running the regex split
    # per shingle offset — measured ~10× slower.
    sh = (
        spread_small_scan(df.select(F.col(id_col).alias("doc"), F.col(text_col)))
        .withColumn("_w", words(F.col(text_col)))
        .filter(F.size("_w") >= k)
        .select("doc", word_shingles(F.col("_w"), k).alias("shingles"))
        .withColumn("n_sh", F.size("shingles"))
    )

    exploded = sh.select("doc", "n_sh", F.explode("shingles").alias("shingle"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return common.select(
        "id_a", "id_b", jac.alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def spread_small_scan(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Re-spread a small scan across the cluster before compute-heavy
    per-row work.

    A small parquet file arrives as one partition, which would serialize the
    expensive shingle/signature expressions onto a single core. At 100 TB the
    scan already yields thousands of partitions and this is a no-op; the
    repartition only fires when the scan came back narrower than the
    available parallelism.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def minhash_signature(shingles: Column, n_hashes: int = 32) -> Column:
    """MinHash signature: per permutation i, min over shingles of
    xxhash64(i, shingle). Deterministic, JVM-side, no UDF.

    Single fold over the shingle array (acc = running elementwise min),
    instead of materializing one transformed array per permutation."""
    init = F.array_repeat(F.lit(2**63 - 1).cast("long"), n_hashes)
    return F.aggregate(
        shingles,
        init,
        lambda acc, s: F.zip_with(
            acc,
            F.array(*[F.xxhash64(F.lit(i), s) for i in range(n_hashes)]),
            lambda a, h: F.least(a, h),
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    k: int = 3,
    n_hashes: int = 32,
    n_bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs, verified with exact Jaccard.

    shingle → 32-hash signature → 8 bands of 4 → band-bucket self-join for
    candidates → exact-Jaccard verification of candidates only. With r=4,
    b=8 the S-curve crosses ~(1/8)^(1/4) ≈ 0.59, a good match for a 0.5
    verification threshold.

    Returns: id_a, id_b, jaccard (exact, post-verification).
    """
    rows_per_band = n_hashes // n_bands
    # The shingle relation feeds three plan branches (signature + both
    # verification joins); persist it so the scan→split→shingle work runs
    # once. MEMORY_AND_DISK: at 100 TB this spills rather than OOMs, and is
    # exactly the deliberate materialization an LSH pipeline wants.
    # Short docs filtered on the words column — see jaccard_pairs for why
    # filtering on size(shingles) would re-inline the shingle expression.
    sh = (
        spread_small_scan(df.select(F.col(id_col).alias("doc"), F.col(text_col)))
        .withColumn("_w", words(F.col(text_col)))
        .filter(F.size("_w") >= k)
        .select("doc", word_shingles(F.col("_w"), k).alias("shingles"))
    ).persist()

    # Signature via explode → hash-agg min: every expression stays inside
    # whole-stage codegen with map-side partial aggregation. (A higher-order
    # `aggregate`/`zip_with` fold computes the same thing but runs in the
    # interpreted expression evaluator — measured ~10× slower.)
    sig = (
        sh.select("doc", F.explode("shingles").alias("s"))
        .groupBy("doc")
        .agg(
            *[
                F.min(F.xxhash64(F.lit(i), F.col("s"))).alias(f"h{i}")
                for i in range(n_hashes)
            ]
        )
    )

    # Bands carry ONLY (doc, band-bucket) longs — the shingle arrays would
    # otherwise be duplicated ×n_bands through the shuffle and dominate the
    # join payload; verification joins them back for candidates only.
    bands = sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b),
                        *[
                            F.col(f"h{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ],
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bucket"),
    )

    a = bands.alias("a")
    b = bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    verif = (
        candidates.join(sh.select(F.col("doc").alias("id_a"), F.col("shingles").alias("sh_a")), "id_a")
        .join(sh.select(F.col("doc").alias("id_b"), F.col("shingles").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.size("sh_a") + F.size("sh_b") - inter)
    return verif.select(
        "id_a", "id_b", jac.alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def simhash64(c: Column) -> Column:
    """64-bit SimHash of a text column as a pure Catalyst fold.

    Each token votes ±1 per bit of its xxhash64; the fingerprint sets bit b
    when the vote sum is positive. No explode, no shuffle — computed inline
    per row.
    """
    toks = words(c)
    zero64 = F.array_repeat(F.lit(0).cast("long"), 64)

    def token_bits(t: Column) -> Column:
        # ±1 vote per bit of the token's xxhash64; bit positions are Python
        # ints so every shift is a literal (shiftright requires literal bits).
        h = F.xxhash64(t)
        return F.array(
            *[
                F.when(
                    F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1).cast("long"),
                ).otherwise(F.lit(-1).cast("long"))
                for b in range(64)
            ]
        )

    bit_votes = F.aggregate(
        toks, zero64, lambda acc, t: F.zip_with(acc, token_bits(t), lambda x, y: x + y)
    )
    # Reassemble: set bit b when votes[b] > 0. Bit 63 is the sign bit of a
    # signed long (1 << 63 overflows), hence the negative literal.
    fp = F.lit(0).cast("long")
    for b in range(64):
        bit_val = F.lit(-(2**63) if b == 63 else (1 << b)).cast("long")
        fp = fp.bitwiseOR(
            F.when(F.element_at(bit_votes, b + 1) > 0, bit_val).otherwise(
                F.lit(0).cast("long")
            )
        )
    return fp


def simhash_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
    n_bands: int = 4,
) -> DataFrame:
    """SimHash near-duplicate pairs: fingerprint, band into 16-bit chunks
    (pigeonhole: hamming ≤ 8 pairs are likely to agree on ≥1 of 4 bands for
    clustered corruptions; raise n_bands for a strict guarantee), self-join
    per band bucket, verify with exact popcount(xor).

    Returns: id_a, id_b, hamming.
    """
    bits_per_band = 64 // n_bands
    # Fingerprint via explode → 64 codegen'd SUM votes (the one-row
    # `simhash64` fold is interpreted HOF evaluation — ~10× slower in bulk).
    toks = spread_small_scan(
        df.select(F.col(id_col).alias("doc"), F.col(text_col))
    ).select("doc", F.explode(words(F.col(text_col))).alias("t"))
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
    fp = votes.select("doc", fp_col.alias("fp"))
    bands = fp.select(
        "doc",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("fp"), b * bits_per_band)
                        .bitwiseAND(F.lit((1 << bits_per_band) - 1))
                        .alias("chunk"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "fp", F.col("bb.band").alias("band"), F.col("bb.chunk").alias("chunk"))

    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return pairs.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
