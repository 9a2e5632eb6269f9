#!/usr/bin/env python
"""Deterministic 10x scale-up fixture generator (sf0.1 -> sf1).

The driver's testdata tops out at sf0.1 and is read-only, so the scaling
rehearsal (VERDICT r6 item 1) builds its own sf1 under the repo's gitignored
`.scratch/` directory. Two generation strategies, chosen per table to keep
the *workload* scaling linear and interpretable:

- Dimension tables (region, nation): copied verbatim. Dims don't scale with
  fact data in a star schema; keeping them fixed matches how a real corpus
  grows.
- Keyed fact/entity tables (customer, supplier, part, orders, lineitem,
  events): FACTOR copies with disjoint key ranges. All foreign keys are
  offset by the same per-copy delta as their parent's primary key, so join
  cardinalities scale exactly linearly (each copy is a self-contained
  sub-universe over the shared dims). Entity names that embed the key
  (Customer#%09d, Supplier#%09d) are regenerated from the new key.
- documents / embeddings: regenerated FRESH from the same generative process
  observed in the driver fixtures (measured in this script's constants), not
  replicated — replication would create pathological cross-copy exact-dup
  groups of size FACTOR and distort every dedup operator. Near-dup structure
  (1-token 'dup' substitutions at ~5% of rows; ~8 exact-dup groups per 5k
  docs) is injected at the same per-row rate, so near-dup pair counts scale
  linearly. Embeddings are per-label Gaussians fit on sf0.1; note the driver
  embeddings are nearly isotropic (label means ~0.07 vs vector norm ~1), so
  cosine-threshold pair counts are dominated by random tail collisions and
  scale O(n^2) BY CONSTRUCTION of the data — that is a property of the
  corpus, not of any operator (see SCALE.md scaling-rehearsal notes).

Output schemas are cast to the source parquet schemas exactly (int32 vs
int64, float32 lists, timestamp[us]) so every query and oracle runs
unmodified against the new directory.

Usage: python scripts/make_sf1.py [--factor 10] [--src /root/testdata/sf0.1]
                                  [--out /root/repo/.scratch/sf1]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SEED = 20260814

# (table, primary-key span at sf0.1). Foreign keys are offset by the span of
# the table they reference.
SPANS = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "events": 100_000,  # event_id span
}
USER_SPAN = 1_500  # events.user_id


def _read(src: str, name: str) -> pa.Table:
    return pq.read_table(os.path.join(src, f"{name}.parquet"))


def _write(out: str, name: str, table: pa.Table, schema: pa.Schema) -> None:
    table = table.select(schema.names).cast(schema)
    pq.write_table(
        table,
        os.path.join(out, f"{name}.parquet"),
        row_group_size=256_000,
        compression="snappy",
    )
    print(f"  {name}: {table.num_rows} rows")


def _replicate(
    table: pa.Table, factor: int, offsets: dict[str, int], names: dict[str, str] | None = None
) -> pa.Table:
    """Concatenate `factor` copies, adding i*offset to each listed key column
    and regenerating printf-style name columns from their key column."""
    copies = []
    for i in range(factor):
        cols = {}
        for field in table.schema.names:
            col = table.column(field)
            if field in offsets and i > 0:
                col = pc.add(col, pa.scalar(i * offsets[field], type=col.type))
            cols[field] = col
        if names:
            for name_col, (fmt, key_col) in names.items():
                keys = cols[key_col].to_numpy(zero_copy_only=False)
                cols[name_col] = pa.array([fmt % k for k in keys])
        copies.append(pa.table(cols))
    return pa.concat_tables(copies)


def gen_relational(src: str, out: str, factor: int) -> None:
    for name in ("region", "nation"):
        t = _read(src, name)
        _write(out, name, t, t.schema)

    cust = _read(src, "customer")
    _write(
        out,
        "customer",
        _replicate(
            cust,
            factor,
            {"c_custkey": SPANS["customer"]},
            {"c_name": ("Customer#%09d", "c_custkey")},
        ),
        cust.schema,
    )

    supp = _read(src, "supplier")
    _write(
        out,
        "supplier",
        _replicate(
            supp,
            factor,
            {"s_suppkey": SPANS["supplier"]},
            {"s_name": ("Supplier#%09d", "s_suppkey")},
        ),
        supp.schema,
    )

    part = _read(src, "part")
    _write(
        out, "part", _replicate(part, factor, {"p_partkey": SPANS["part"]}), part.schema
    )

    orders = _read(src, "orders")
    _write(
        out,
        "orders",
        _replicate(
            orders,
            factor,
            {"o_orderkey": SPANS["orders"], "o_custkey": SPANS["customer"]},
        ),
        orders.schema,
    )

    li = _read(src, "lineitem")
    _write(
        out,
        "lineitem",
        _replicate(
            li,
            factor,
            {
                "l_orderkey": SPANS["orders"],
                "l_partkey": SPANS["part"],
                "l_suppkey": SPANS["supplier"],
            },
        ),
        li.schema,
    )

    ev = _read(src, "events")
    _write(
        out,
        "events",
        _replicate(
            ev, factor, {"event_id": SPANS["events"], "user_id": USER_SPAN}
        ),
        ev.schema,
    )


# Measured on /root/testdata/sf0.1/documents.parquet: 31-word vocab where
# 'dup' only appears as the near-dup substitution marker; token counts
# uniform 10..100; ~5% of rows are 1-token-substituted near-copies; 8
# exact-dup groups per 5000 rows; lang en 41% / others ~15%; 20 sources.
VOCAB = (
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast the row "
    "agg key query a scan batch"
).split()
LANGS = ["en", "zh", "fr", "es", "de"]
LANG_P = [0.412, 0.151, 0.148, 0.149, 0.140]


def gen_documents(src: str, out: str, factor: int) -> None:
    schema = _read(src, "documents").schema
    rng = np.random.default_rng(SEED)
    n_total = 5_000 * factor
    n_near = int(0.05 * n_total)
    n_exact = 8 * factor  # exact-dup groups, one extra copy each
    n_base = n_total - n_near - n_exact

    base = [
        " ".join(rng.choice(VOCAB, size=rng.integers(10, 101)))
        for _ in range(n_base)
    ]
    texts = list(base)
    for idx in rng.choice(n_base, size=n_near, replace=False):
        toks = base[idx].split(" ")
        toks[rng.integers(0, len(toks))] = "dup"
        texts.append(" ".join(toks))
    for idx in rng.choice(n_base, size=n_exact, replace=False):
        texts.append(base[idx])

    order = rng.permutation(len(texts))
    texts = [texts[i] for i in order]
    langs = rng.choice(LANGS, size=n_total, p=LANG_P)
    sources = [f"src{i}" for i in rng.integers(0, 20, size=n_total)]
    table = pa.table(
        {
            "doc_id": np.arange(n_total, dtype=np.int64),
            "text": texts,
            "lang": langs,
            "source": sources,
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    _write(out, "documents", table, schema)


def gen_embeddings(src: str, out: str, factor: int) -> None:
    ref = _read(src, "embeddings")
    schema = ref.schema
    labels_ref = ref.column("label").to_numpy()
    X = np.array(ref.column("embedding").to_pylist(), dtype=np.float64)
    rng = np.random.default_rng(SEED + 1)
    n_total = X.shape[0] * factor
    dim = X.shape[1]

    # fit per-label diagonal Gaussian on the reference vectors, then sample
    # labels at the reference frequencies
    uniq, counts = np.unique(labels_ref, return_counts=True)
    new_labels = rng.choice(uniq, size=n_total, p=counts / counts.sum())
    vecs = np.empty((n_total, dim), dtype=np.float64)
    for lab in uniq:
        sub = X[labels_ref == lab]
        mask = new_labels == lab
        vecs[mask] = rng.normal(
            sub.mean(axis=0), sub.std(axis=0), size=(mask.sum(), dim)
        )

    table = pa.table(
        {
            "vec_id": np.arange(n_total, dtype=np.int64),
            "embedding": pa.array(
                [v for v in vecs.astype(np.float32)],
                type=pa.list_(pa.float32()),
            ),
            "label": new_labels.astype(np.int32),
        }
    )
    _write(out, "embeddings", table, schema)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scratch",
            "sf1",
        ),
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    print(f"generating factor={args.factor} from {args.src} -> {args.out}")
    gen_relational(args.src, args.out, args.factor)
    gen_documents(args.src, args.out, args.factor)
    gen_embeddings(args.src, args.out, args.factor)
    print("done")


if __name__ == "__main__":
    main()
