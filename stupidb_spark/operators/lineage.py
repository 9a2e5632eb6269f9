"""Lineage cuts for iterative operators, with a durability knob.

Every iterative operator in this engine (connected components, star
contraction, SemDeDup's shared index, BPE training, the kNN probe) cuts
plan lineage between rounds — without the cut the logical plan doubles per
round and Catalyst analysis time, not data, becomes the bottleneck. On a
laptop / single JVM, ``localCheckpoint`` is the right cut: executor-local
block writes, no distributed filesystem needed. On a real cluster it is a
durability hazard: localCheckpoint blocks are UNRECOVERABLE after executor
loss, so one lost container mid-loop fails the job (or, worse, cascades
recomputation through every round already run).

:func:`cut_lineage` is the one switch point. By default it is
``localCheckpoint``; when ``SPARK_GRAFT_CHECKPOINT_DIR`` is set (an HDFS /
object-store path on a cluster, any directory locally) it becomes a
RELIABLE ``checkpoint()`` into that directory — the checkpoint dir is
installed on the SparkContext on first use, and lost executors then
re-read checkpoint files instead of failing the loop. Both modes preserve
the operators' one-action-per-round contract: ``eager=False`` cuts
materialize inside the same job that runs the round's driver action.

The knob is an env var, not a parameter, for the same reason as
``SPARK_GRAFT_CORPUS_JOIN``: it is a deployment property of the cluster,
not of any one query, and the registered queries must not need editing to
run durably. Mode parity (identical results both ways) is pinned by
``tests/test_components.py``.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame

ENV_VAR = "SPARK_GRAFT_CHECKPOINT_DIR"

# The checkpoint root we last installed on a SparkContext, keyed by the
# context's applicationId. getCheckpointDir() returns a scheme-qualified URI
# with a per-app UUID subdir (``file:/tmp/ck/<uuid>``), so a plain
# string-prefix test against the configured path never matches — comparing
# against it would reinstall (and mint a fresh UUID root) on EVERY cut,
# churning directories across iterative loops. Remember what we installed
# instead, and fall back to comparing the URI's parsed path for contexts
# configured outside this module.
_installed: dict[str, str] = {}


def _already_installed(sc, ckdir: str) -> bool:
    app_id = sc.applicationId
    if _installed.get(app_id) == ckdir:
        return True
    current = sc.getCheckpointDir()
    if not current:
        return False
    # current = <scheme>://<netloc><root>/<uuid>; compare (scheme, netloc,
    # parent path) — path alone would conflate hdfs://nn/ck/<uuid> with a
    # configured local /ck (and vice versa), skipping setCheckpointDir and
    # leaving checkpoints on the wrong filesystem. An unqualified path means
    # the local filesystem, so empty scheme normalizes to 'file'.
    cur = urlparse(current)
    want = urlparse(ckdir)
    cur_parent = cur.path.rstrip("/").rsplit("/", 1)[0]
    return (
        (cur.scheme or "file") == (want.scheme or "file")
        and cur.netloc == want.netloc
        and cur_parent == want.path.rstrip("/")
    )


def checkpoint_dir() -> str | None:
    """The configured reliable-checkpoint directory, or None (local mode)."""
    return os.environ.get(ENV_VAR) or None


def cut_lineage(df: DataFrame, *, eager: bool = True) -> DataFrame:
    """Cut ``df``'s plan lineage: ``localCheckpoint`` by default, reliable
    ``checkpoint`` into ``$SPARK_GRAFT_CHECKPOINT_DIR`` when set.

    ``eager=False`` defers materialization to the caller's next action over
    every partition (the one-action-per-round idiom); ``eager=True``
    materializes now (for relations consumed by multiple branches of the
    FIRST job that touches them).

    Ancestor-truncation property (round 11, found the hard way): when a
    round chains SEVERAL lazy cuts and the round's one action runs on a
    DERIVED frame, ``RDD.doCheckpoint`` at job end stops descending at the
    FIRST checkpointed ancestor it meets — the cuts *behind* it cache
    their blocks but keep their dependency chains, so RDD lineage grows
    linearly with rounds (measured: BPE training's plan serialization died
    with a JVM ``StackOverflowError`` at ~100+ rounds; ``toDebugString``
    grew ~8 lines/round). Spark's fix is the job-local property
    ``spark.checkpoint.checkpointAllMarkedAncestors`` (see the constant of
    that name in ``core/src/main/scala/org/apache/spark/rdd/RDD.scala``),
    which makes job completion truncate EVERY marked ancestor; with it set
    the same run holds flat at ~39 debug lines through any round count.
    Set here — on the driver thread that will run the rounds' actions — so
    every iterative operator composing ``cut_lineage`` inherits it.
    """
    df.sparkSession.sparkContext.setLocalProperty(
        "spark.checkpoint.checkpointAllMarkedAncestors", "true"
    )
    ckdir = checkpoint_dir()
    if ckdir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    # setCheckpointDir appends a per-app UUID subdir; install once per
    # context (or when the knob changed between calls).
    if not _already_installed(sc, ckdir):
        sc.setCheckpointDir(ckdir)
        _installed[sc.applicationId] = ckdir
    return df.checkpoint(eager=eager)
