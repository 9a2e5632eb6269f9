"""Greedy k-center coreset selection over an embedding column.

The data-curation pass that picks a small, maximally DIVERSE subset of a
corpus: farthest-point sampling (Gonzalez 1985; the coreset construction
of Sener & Savarese, ICLR 2018, used for training-data selection) —
start from a deterministic seed, then repeatedly add the point whose
distance to the nearest already-selected center is LARGEST. The selected
set 2-approximates the optimal k-center cover, so it is the standard
"diversity subset" primitive a pretraining pipeline runs when it wants
coverage rather than redundancy (the complement of dedup: dedup removes
near-twins, a coreset KEEPS one representative per region of embedding
space).

No analogue in the reference (cpcloud/stupidb has no vector operators at
all — `/root/reference/stupidb/api.py` tops out at windowed aggregates);
this is part of the beyond-reference LLM-pipeline surface alongside
SemDeDup / IVF / DSIR.

Exactness contract (the `functions/exact.py` discipline, extended): all
distances are per-term-quantized squared L2 — each (x−y)² term is
floored onto the 2^-40 grid and summed as BIGINT, so the distance is an
exact integer on every engine and the argmax (ties broken by smallest
id) is engine- and partition-order-independent. The DuckDB oracle
replays the identical greedy chain as a generated non-recursive CTE
ladder (one incremental min-distance CTE per step — no recursive CTE, so
nothing is re-evaluated per iteration; cf. SCALE.md round 13 on DuckDB
recursive-CTE re-evaluation).

Scale shape (100 TB intent): the per-vector min distance is CARRIED as
a checkpointed column and updated incrementally against only the newest
center each step (the `connected_components` one-action-per-round
pattern: `cut_lineage` + the TakeOrdered(1) argmax is the step's single
action). Each step is one map over the carried relation — O(n·dim) work,
zero shuffle, with the newest center riding the plan as a literal array
(bounded model state, the IVF-centroid class). Total O(n·k·dim).

Why the carry and not a stateless least-over-all-centers rescan: the
stateless form was built first and MEASURED — its step-i plan embeds i
independent zip_with/aggregate folds over 64-element literal arrays, and
Catalyst analysis + whole-stage codegen on those growing mega-trees cost
~2.3 s/step flat (34.5 s for k=16 on 500 rows — pure plan-compilation
constant, invisible in the data). The carry's step plan is ONE fold —
small, constant, and the checkpoint that cuts its lineage is the same
bounded executor-storage contract every iterative operator here already
holds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from stupidb_spark.operators.similarity import QUANT_SCALE

# Greedy steps are driver-sequenced (k jobs); keep the default envelope
# honest — a caller asking for a huge coreset should know each extra
# center is a corpus scan.
MAX_DEFAULT_K = 4096


def qdist2(x: Column, y: Column) -> Column:
    """Exact quantized squared L2 between two array<numeric> columns:
    Σ_i floor((x_i − y_i)² · 2^40 + 0.5) as BIGINT. Per-term flooring
    makes the sum independent of accumulation order; doubles represent
    every term exactly (terms ≤ ~1.2e12 for unit-scale embeddings), so
    the fold is bit-stable on both engines.

    >>> import pyspark.sql.functions as F
    >>> df = spark.createDataFrame([([1.0, 2.0], [3.0, 4.0])], "a array<double>, b array<double>")
    >>> df.select(qdist2(F.col("a"), F.col("b")).alias("d")).collect()[0].d
    8796093022208
    """
    terms = F.zip_with(
        x.cast("array<double>"),
        y.cast("array<double>"),
        lambda a, b: F.floor((a - b) * (a - b) * F.lit(QUANT_SCALE) + F.lit(0.5)).cast(
            "long"
        ),
    )
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, t: acc + t)


def sql_qdist2(x: str, y: str) -> str:
    """DuckDB text twin of :func:`qdist2` (1-based list comprehension
    fold; pass DOUBLE[]-cast expressions)."""
    s = f"{QUANT_SCALE:.1f}"
    return (
        f"CAST(list_sum([CAST(floor((({x})[i] - ({y})[i]) * (({x})[i] - ({y})[i])"
        f" * {s} + 0.5) AS BIGINT) for i in range(1, len({x}) + 1)]) AS BIGINT)"
    )


def _center_literal(vec: list[float]) -> Column:
    # ONE array Literal node, not F.array(*64 lits): a non-primitive
    # Literal lands in the codegen `references` array, so the analyzed
    # tree is ~130 nodes smaller per carried fold AND the generated code
    # is identical across greedy steps (codegen cache hits instead of a
    # fresh janino compile per step). Measured at sf0.1/k=16: the
    # driver-side gap between step jobs — which profiling showed was
    # ~3.4 s of the 4.6 s warm runtime — drops ~1.8 s; results are
    # bit-identical (same doubles, same fold).
    return F.lit([float(v) for v in vec]).cast("array<double>")


def kcenter_coreset(
    emb: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center selection: returns a k-row DataFrame
    ``(rank INT, <id_col> , dist BIGINT)`` where rank 1 is the seed (the
    smallest id; dist NULL) and each later row is the point maximizing
    the quantized squared L2 distance to its nearest already-selected
    center (ties → smallest id), with that max-min distance recorded.

    ``dist`` is monotonically non-increasing in rank (the greedy cover
    radius) — pinned by tests; the k-row result is bounded model state
    (the IVF-centroid class), returned as a local relation.
    """
    if k < 1:
        raise ValueError(f"kcenter_coreset: k must be >= 1, got {k}")
    if k > MAX_DEFAULT_K:
        raise ValueError(
            f"kcenter_coreset: k={k} exceeds MAX_DEFAULT_K={MAX_DEFAULT_K};"
            " each center is one corpus scan — for coresets this large use"
            " the checkpointed min-distance carry described in the module"
            " docstring"
        )
    from stupidb_spark.operators.lineage import cut_lineage

    base = emb.select(F.col(id_col), F.col(vec_col).alias("__v"))

    seed = base.orderBy(F.asc(id_col)).limit(1).collect()
    if not seed:
        raise ValueError("kcenter_coreset: empty input")
    center: list[float] = list(seed[0]["__v"])
    out_rows: list[tuple[int, int, int | None]] = [(1, seed[0][id_col], None)]

    # Carried relation: (id, vector, min distance to any selected center)
    # over the NOT-YET-SELECTED points — each pick is filtered out, so
    # under distance ties (duplicate vectors: every remaining distance 0)
    # the argmax cannot re-pick a selected id and falls back to
    # smallest-id order. Updated against ONLY the newest center each
    # step; the lazy lineage cut is materialized by the step's single
    # TakeOrdered(1) action (one-action-per-round — the
    # connected_components idiom), and checkpointAllMarkedAncestors keeps
    # the chain flat across steps.
    cur = base.filter(F.col(id_col) != F.lit(out_rows[0][1])).withColumn(
        "__d", qdist2(F.col("__v"), _center_literal(center))
    )
    for rank in range(2, k + 1):
        # Amortized cut: between cuts the plan grows by one fold per
        # step, so a stride-4 cut keeps plans small while paying the
        # checkpoint bookkeeping 4x less often (measured 10.4 -> 4.1 s
        # warm at k=16; every-step cutting was the next-biggest fixed
        # cost after the stateless form's codegen).
        if rank % 4 == 2:
            cur = cut_lineage(cur, eager=False)
        top = cur.orderBy(F.desc("__d"), F.asc(id_col)).limit(1).collect()
        if not top:
            break  # k exceeds the number of distinct points; return fewer
        picked = top[0]
        out_rows.append((rank, picked[id_col], picked["__d"]))
        if rank < k:
            center = list(picked["__v"])
            cur = cur.filter(F.col(id_col) != F.lit(picked[id_col])).withColumn(
                "__d",
                F.least(
                    F.col("__d"), qdist2(F.col("__v"), _center_literal(center))
                ),
            )

    spark = emb.sparkSession
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("rank", IntegerType(), False),
            StructField(id_col, emb.schema[id_col].dataType, False),
            StructField("dist", LongType(), True),
        ]
    )
    # Arrow local relation, not createDataFrame(list): the pickled-RDD
    # path executes the k-row result as defaultParallelism Python-worker
    # tasks (profiled: 32 tasks, 40 s of cold task time for 16 rows); the
    # Arrow path is a driver-side conversion with no Python workers.
    import pandas as pd

    pdf = pd.DataFrame(out_rows, columns=["rank", id_col, "dist"])
    pdf["dist"] = pdf["dist"].astype("Int64")  # NULL seed dist, exact longs
    return spark.createDataFrame(pdf, schema)


def sql_kcenter_coreset(k: int, *, table: str = "embeddings") -> str:
    """Generated DuckDB oracle: the identical greedy chain as a ladder of
    non-recursive CTEs — ``m_i`` carries the incremental min distance
    (least of the previous column and the distance to the newest center),
    ``p_i`` takes the deterministic argmax. O(n) work per step, nothing
    re-evaluated (no recursive CTE — SCALE.md round 13)."""
    # Every chained CTE is AS MATERIALIZED: each m_i is referenced twice
    # (its argmax p_{i+1} AND the next m_{i+1}), so plain CTEs would
    # inline the whole ladder recursively — a 2^k expression blow-up that
    # re-opens the parquet per duplicated scan (observed as "Too many
    # open files" before any work). Same DuckDB inlining hazard as the
    # recursive-closure oracles (SCALE.md round 13).
    parts = [
        "ev AS MATERIALIZED"
        f" (SELECT vec_id, embedding::DOUBLE[] AS v FROM {table})",
        "s1 AS (SELECT min(vec_id) AS vec_id FROM ev)",
        "c1 AS MATERIALIZED (SELECT v FROM ev JOIN s1 USING (vec_id))",
    ]
    d_new = sql_qdist2("ev.v", "c1.v")
    # m_i holds the NOT-YET-SELECTED points only (the seed is excluded in
    # m1, each pick in the next m) — mirrors the engine: under distance
    # ties the argmax must fall back to smallest UNSELECTED id, never
    # re-pick a center.
    parts.append(
        f"m1 AS MATERIALIZED (SELECT ev.vec_id, {d_new} AS d FROM ev, c1"
        f" WHERE ev.vec_id NOT IN (SELECT vec_id FROM s1))"
    )
    for i in range(2, k + 1):
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT vec_id, d FROM m{i - 1}"
            f" ORDER BY d DESC, vec_id LIMIT 1)"
        )
        if i < k:
            parts.append(
                f"c{i} AS MATERIALIZED"
                f" (SELECT v FROM ev JOIN p{i} USING (vec_id))"
            )
            d_new = sql_qdist2("m.v", f"c{i}.v")
            parts.append(
                f"m{i} AS MATERIALIZED (SELECT m.vec_id, least(m.d, {d_new}) AS d"
                f" FROM (SELECT mm.vec_id, mm.d, ev.v FROM m{i - 1} mm"
                f" JOIN ev USING (vec_id)"
                f" WHERE mm.vec_id NOT IN (SELECT vec_id FROM p{i})) m, c{i})"
            )
    selects = [
        "SELECT CAST(1 AS INTEGER) AS rank, vec_id,"
        " CAST(NULL AS BIGINT) AS dist FROM s1"
    ]
    for i in range(2, k + 1):
        selects.append(
            f"SELECT CAST({i} AS INTEGER) AS rank, vec_id,"
            f" CAST(d AS BIGINT) AS dist FROM p{i}"
        )
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects)
