"""Connected components over an edge set — the cluster-resolution step of a
dedup pipeline.

Pair emitters (``jaccard_pairs``, ``minhash_lsh_pairs``, ``simhash_pairs``,
``embedding_near_dup_pairs``) return near-duplicate *pairs*; resolving which
documents to keep needs the transitive closure — A~B and B~C put all three in
one cluster even if A and C never paired. This module computes that closure
as iterative min-label propagation in pure DataFrame ops:

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated until no label changes. Each iteration is one shuffle join plus one
hash aggregate over the (node, label) relation — state is two longs per node,
never the payload. Iteration count is the graph diameter; duplicate clusters
are small and dense (diameter 2-4 in practice), so propagation converges in a
handful of rounds. For adversarial long-chain graphs,
:func:`connected_components_star` implements the alternating
large-star/small-star contraction (O(log n) rounds regardless of diameter),
differentially pinned to produce identical components — and the default
entry point auto-escalates to it: if propagation hasn't converged within
``propagation_rounds`` (default 5, comfortably past any real dup-cluster
diameter), :func:`connected_components` hands the ORIGINAL edge set to the
star engine rather than ever returning half-propagated labels. The pipeline
operator is therefore adversarial-graph-safe by default: worst-case total
rounds = 5 cheap propagation rounds + O(log n) contraction rounds.

Scale notes (100 TB): the symmetrized edge set is checkpointed *eagerly*
(it is read by two branches of the very first job, so materializing it up
front is a measured win), while per-round label state is cut with a *lazy*
``localCheckpoint`` — without the cuts the plan doubles per round and
Catalyst analysis time, not the data, becomes the bottleneck. Both cuts go
through :func:`stupidb_spark.operators.lineage.cut_lineage`: on a real
cluster set ``SPARK_GRAFT_CHECKPOINT_DIR`` to a durable path and every cut
becomes a reliable ``checkpoint()``, so executor loss mid-loop re-reads
checkpoint files instead of cascading recomputation (mode parity pinned in
``tests/test_components.py``). Each round issues exactly ONE driver
action: the changed-label ``count`` scans every partition, which materializes
the lazy checkpoint and decides convergence in the same job (an eager
checkpoint plus a separate emptiness probe would pay two jobs of fixed driver
latency per round — the dominant cost once per-round data is small).

No reference parity: the reference has no graph operators; this is part of
the beyond-reference dedup surface (SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stupidb_spark.operators.lineage import cut_lineage

# Driver fast-path bound for connected_components: a thresholded dedup
# pair graph is usually FAR smaller than the corpus that produced it, and
# below this many (symmetrized) edge rows the transitive closure is a
# bounded model-state computation, not a distributed one — flat int64
# numpy arrays only, worst-case ~0.5 GB of transient driver heap at the
# bound (edge index pair 64 MB + unique-id table ≤64 MB + 3 node-sized
# label vectors ≤192 MB + 3 edge-sized gather buffers 96 MB), the same
# boundedness class as the IVF centroid stats or the BPE merge table —
# NO per-element Python objects (a dict/int-boxing implementation would
# cost >1 GB here). Above the bound the iterative engines run unchanged
# (a boilerplate-heavy 100 TB crawl can emit billions of pairs).
# Why it exists: each distributed label round costs 1-2 shuffle jobs of
# FIXED latency, so a 20k-edge graph paid 8-11 s of pure round overhead at
# sf1 (measured round 13) vs ~0.1 s of driver union-find.
DRIVER_MAX_EDGE_ROWS = 4_000_000


def _driver_components(u, v):
    """Vectorized connected components over edge arrays: returns
    ``(ids, comp)`` numpy arrays mapping each distinct node id to the
    minimum id reachable from it.

    Min-label hooking + full pointer-jumping compression per round
    (Shiloach–Vishkin shape), entirely in numpy — no Python-object graph
    state, so driver heap stays proportional to the flat arrays. Node ids
    are remapped to dense indices via ``np.unique`` (sorted, so index
    order == id order and min-by-index IS min-by-id). Each round labels
    strictly decrease somewhere or the loop exits; with full compression
    a path graph converges in one round and round count is O(log n)
    worst-case. Equality with the distributed engines is pinned by the
    differentials in tests/test_components.py."""
    import numpy as np

    ids, idx = np.unique(np.concatenate([u, v]), return_inverse=True)
    e = len(u)
    ui, vi = idx[:e].astype(np.int64), idx[e:].astype(np.int64)
    label = np.arange(ids.shape[0], dtype=np.int64)
    while True:
        # hook: every edge endpoint takes the min of the two current labels
        m = np.minimum(label[ui], label[vi])
        new = label.copy()
        np.minimum.at(new, ui, m)
        np.minimum.at(new, vi, m)
        # compress: new[i] <= i always, so iterating new∘new reaches the
        # forest roots (label[root] == root) in O(log depth) passes
        while True:
            nxt = new[new]
            if np.array_equal(nxt, new):
                break
            new = nxt
        if np.array_equal(new, label):
            break
        label = new
    return ids, ids[label]


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    max_iterations: int = 25,
    propagation_rounds: int = 5,
    driver_max_edge_rows: int | None = None,
) -> DataFrame:
    """Resolve ``edges`` (undirected, any orientation) into components.

    Returns one row per node: ``(node, component)`` where ``component`` is
    the smallest node id reachable from ``node``. Nodes only appear if they
    occur in ``edges`` — pass ``nodes`` (a one-column DataFrame) to include
    isolated nodes, which keep their own id as the component.

    Engine auto-selection, smallest-cost first:

    1. **Driver union-find** when the symmetrized edge set is within
       ``driver_max_edge_rows`` (default :data:`DRIVER_MAX_EDGE_ROWS`;
       0 disables) — a thresholded dup graph is bounded model state at
       that size, and the distributed rounds' fixed job latency dominated
       small graphs (measured 8-11 s for 20k edges at sf1 → ~0.3 s).
    2. **Min-label propagation** otherwise — advances one hop per round,
       wins on dense little dup clusters.
    3. **Star contraction** (:func:`connected_components_star`, O(log n)
       rounds regardless of diameter) if propagation hasn't converged
       within ``propagation_rounds`` — adversarial long chains.

    Identical results from all three, pinned by the differential tests in
    ``tests/test_components.py``.

    >>> e = spark.createDataFrame([(2, 1), (2, 3), (9, 8)], "src long, dst long")
    >>> connected_components(e).orderBy("node").show()
    +----+---------+
    |node|component|
    +----+---------+
    |   1|        1|
    |   2|        1|
    |   3|        1|
    |   8|        8|
    |   9|        8|
    +----+---------+
    <BLANKLINE>
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = sym.union(
        sym.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    # Reused every iteration, and consumed by TWO branches of round 1's
    # first job (label initialization below and the round-1 join): an eager
    # checkpoint here pays one small up-front job but both branches then read
    # materialized partitions. The lazy form measured *slower* (both branches
    # recompute sym before its partitions land) — only the per-round `labels`
    # checkpoint stays lazy, where the single count() action materializes it.
    sym = cut_lineage(sym)

    # Bounded driver fast path (see DRIVER_MAX_EDGE_ROWS): sym is already
    # materialized by the eager checkpoint above, so the count reads local
    # partitions — the pair pipeline is never recomputed for the probe.
    # None defers to the module constant at CALL time (0 disables), so
    # tests can pin a specific engine by monkeypatching it.
    if driver_max_edge_rows is None:
        driver_max_edge_rows = DRIVER_MAX_EDGE_ROWS
    if driver_max_edge_rows > 0 and sym.count() <= driver_max_edge_rows:
        import pandas as pd

        pdf = sym.toPandas()  # bounded: ≤ driver_max_edge_rows rows × 2 longs
        node_ids, comp_ids = _driver_components(
            pdf["u"].to_numpy(), pdf["v"].to_numpy()
        )
        spark = edges.sparkSession
        from pyspark.sql.types import StructField, StructType

        id_type = sym.schema["u"].dataType  # caller's id type, verbatim
        labels = spark.createDataFrame(
            pd.DataFrame({"node": node_ids, "component": comp_ids}),
            StructType(
                [
                    StructField("node", id_type, False),
                    StructField("component", id_type, False),
                ]
            ),
        )
        if nodes is not None:
            all_nodes = nodes.select(
                F.col(nodes.columns[0]).alias("node")
            ).distinct()
            # The labels side is bounded MODEL STATE on this path — it has
            # ≤ 2·driver_max_edge_rows rows by the branch condition (it
            # just fit on the driver), the same boundedness class as the
            # IVF centroids or the collected kNN reference. Broadcast it
            # EXPLICITLY (contract, not Catalyst estimate): the other side
            # is the corpus-sized node relation, and shuffling billions of
            # ids to meet a ≤128 MB label map would be the wrong plan at
            # every scale the fast path can take.
            labels = all_nodes.join(F.broadcast(labels), "node", "left").select(
                "node", F.coalesce("component", F.col("node")).alias("component")
            )
        return labels

    # Propagate over edge-participating nodes ONLY. In a dedup graph almost
    # every document is a singleton — iterating over all of them would put
    # the full corpus through every join round; restricting to V(edges)
    # keeps per-iteration state proportional to the duplicate set, and
    # isolated nodes join back once at the end with their own id.
    #
    # Initial labels are min(self, neighbors) — the first propagation round
    # needs no join because each node's 1-hop neighborhood is already laid
    # out in `sym`, so one groupBy both enumerates V(edges) AND performs
    # hop 1. Dense dup clusters (diameter 2) then converge after a single
    # joined round; a plain identity initialization would pay one extra
    # join+agg+checkpoint round for the same labels.
    labels = (
        sym.groupBy("u")
        .agg(F.min("v").alias("__mv"))
        .select(
            F.col("u").alias("node"),
            F.least(F.col("u"), F.col("__mv")).alias("component"),
        )
    )

    converged = False
    for _ in range(min(propagation_rounds, max_iterations)):
        # One round = one join + ONE groupBy: neighbor label candidates
        # (sym has both orientations, so joining on u and emitting v covers
        # in- and out-edges) union'd with each node's own labeled row; the
        # per-node min is the new label, and since every node contributes
        # exactly one is_old row, max(old) recovers the previous label — so
        # the changed flag falls out of the same aggregation instead of a
        # separate old-vs-new join.
        candidates = sym.join(labels, sym["u"] == labels["node"]).select(
            F.col("v").alias("node"),
            "component",
            F.lit(False).alias("is_old"),
        )
        own = labels.select("node", "component", F.lit(True).alias("is_old"))
        new_labels = (
            own.unionByName(candidates)
            .groupBy("node")
            .agg(
                F.min("component").alias("component"),
                (
                    F.min("component")
                    < F.max(F.when(F.col("is_old"), F.col("component")))
                ).alias("_changed"),
            )
        )
        new_labels = cut_lineage(new_labels, eager=False)
        labels = new_labels.drop("_changed")
        # ONE driver action per round: count() scans every partition, which
        # both materializes the lazy checkpoint (cutting lineage exactly as
        # the eager form did) and yields the convergence signal — the
        # eager-checkpoint + separate isEmpty form paid two jobs per round.
        if new_labels.filter(F.col("_changed")).count() == 0:
            converged = True
            break

    if not converged:
        # Adversarial graph (diameter exceeds the propagation budget):
        # escalate to star contraction on the original edges instead of
        # returning half-propagated labels. Propagation state is discarded
        # — the star engine's rounds are the same join+agg shape and its
        # O(log n) bound doesn't compose with partial labels anyway.
        return connected_components_star(
            edges,
            src=src,
            dst=dst,
            nodes=nodes,
            max_iterations=max_iterations,
        )

    if nodes is not None:
        all_nodes = nodes.select(F.col(nodes.columns[0]).alias("node")).distinct()
        labels = all_nodes.join(labels, "node", "left").select(
            "node", F.coalesce("component", F.col("node")).alias("component")
        )
    return labels


def connected_components_star(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    max_iterations: int = 25,
) -> DataFrame:
    """Alternating large-star / small-star connected components — the
    long-chain upgrade over :func:`connected_components`.

    Min-label propagation advances one hop per round (rounds = graph
    diameter); the star operations (Kiveris et al., "Connected Components
    in MapReduce and Beyond", SoCC 2014) contract paths so the edge set
    converges to per-component stars in O(log n) rounds regardless of
    diameter:

    - large-star: every node links its strictly-larger neighbors to the
      minimum of its neighborhood (including itself);
    - small-star: every node links its smaller-or-equal neighbors (and
      itself) to that minimum.

    Both are one groupBy + one join over (node, neighbor) longs. Dedup
    clusters are small and dense, so the default propagation is usually
    fine; use this form when pair graphs may chain (e.g. near-dup chains
    A~B~C~... from overlapping shingles).

    Returns (node, component) like :func:`connected_components`; identical
    results, pinned by a differential property test.

    >>> e = spark.createDataFrame([(2, 1), (2, 3), (9, 8)], "src long, dst long")
    >>> connected_components_star(e).orderBy("node").show()
    +----+---------+
    |node|component|
    +----+---------+
    |   1|        1|
    |   2|        1|
    |   3|        1|
    |   8|        8|
    |   9|        8|
    +----+---------+
    <BLANKLINE>
    """
    cur = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
    )
    cur = cut_lineage(cur)

    for _ in range(max_iterations):
        # ---- large-star: link each node's LARGER neighbors to its local min
        sym = cur.unionByName(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
        m = F.least(F.col("u"), F.col("mv"))
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), m.alias("b"))
        )
        after_large = (
            large.filter(F.col("a") != F.col("b"))
            .select(
                F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
            )
            .distinct()
        )

        # ---- small-star: orient (larger → smaller); link the smaller
        # neighbors AND the node itself to the local min
        oriented = after_large  # already canonical (u > v)
        smins = oriented.groupBy("u").agg(F.min("v").alias("mv"))
        linked = oriented.join(smins, "u")
        small = linked.select(F.col("v").alias("a"), F.col("mv").alias("b")).unionByName(
            smins.select(F.col("u").alias("a"), F.col("mv").alias("b"))
        )
        new_edges = (
            small.filter(F.col("a") != F.col("b"))
            .select(
                F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
            )
            .distinct()
        )
        new_edges = cut_lineage(new_edges, eager=False)

        # One action: the symmetric-difference probe's except shuffles scan
        # every partition of new_edges, materializing the lazy checkpoint in
        # the same job that decides convergence (was: eager checkpoint plus
        # two isEmpty jobs).
        converged = (
            new_edges.exceptAll(cur)
            .unionByName(cur.exceptAll(new_edges))
            .isEmpty()
        )
        cur = new_edges
        if converged:
            break

    # converged edge set is a star per component: (member, root). Every node
    # of the ORIGINAL edge set gets a row — roots and nodes whose only edges
    # were self-loops (dropped by the canonicalization) label themselves.
    orig_nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    star = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    labels = (
        orig_nodes.join(star, "node", "left")
        .select(
            "node", F.coalesce("component", F.col("node")).alias("component")
        )
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )
    if nodes is not None:
        all_nodes = nodes.select(F.col(nodes.columns[0]).alias("node")).distinct()
        labels = all_nodes.join(labels, "node", "left").select(
            "node", F.coalesce("component", F.col("node")).alias("component")
        )
    return labels
