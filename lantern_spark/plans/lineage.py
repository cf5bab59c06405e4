"""Lineage-cut seam: one switch between local, reliable, and
storage-staged checkpointing for every iterative/multi-reference
operator in the package (r13, review r12 item 1).

Why this exists: the graph and dedup loops (``domain_link_graph``,
``domain_pagerank``, ``expand_seed_domains``,
``connected_components``, ``simhash_near_pairs``) must cut lineage —
an iterative DataFrame loop otherwise compounds the plan until
planning dominates, and multi-referenced subtrees re-execute per
reference. ``localCheckpoint`` is the right default on a single
machine: free of external storage, shared by RDD identity. But it
truncates lineage while storing blocks on executors WITHOUT
replication — on a real cluster one lost/preempted executor makes the
job unrecoverable (no lineage left to recompute the lost blocks).
The reference's analog is WAL-durable index pages
(lantern_hnsw/src/hnsw/external_index.c:240): durability by
construction. This module is the Spark-native equivalent seam:

- ``local`` (default): ``DataFrame.localCheckpoint`` — executor-local
  blocks, zero external I/O. Correct on local[*]; at cluster scale
  only when executor loss is acceptable (re-run the job).
- ``reliable``: ``DataFrame.checkpoint`` — blocks written to the
  SparkContext checkpoint directory (HDFS/object store on a real
  cluster). Survives executor loss; costs one write+read of the
  checkpointed relation per cut. Requires a checkpoint dir
  (``set_checkpoint_mode("reliable", dir=...)`` sets it on the
  context if unset). Note Spark only deletes reliable checkpoint
  files at shutdown when ``spark.cleaner.referenceTracking.
  cleanCheckpoints=true`` — on long-running clusters point ``dir`` at
  a TTL'd/scratch bucket.
- ``storage``: an explicit staged parquet write+read under ``dir`` —
  the most portable durable cut (plain files, readable by anything,
  columnar-compressed — usually SMALLER than the RDD-serialized
  reliable checkpoint). Always eager: a parquet write is an action,
  so ``eager=False`` is honored by the other two modes only (the
  semantics — results — are identical; laziness is a scheduling
  optimization that lets Spark share the first materialization
  across jobs).

The tradeoff table lives in SCALE.md §checkpointing. Results are
mode-invariant by contract — pinned in tests/test_lineage.py, which
runs the graph + pagerank + CC loops under all three modes and
asserts identical rows.
"""

from __future__ import annotations

import os
import uuid
from contextlib import contextmanager
from typing import Optional, Tuple

from pyspark.sql import DataFrame

__all__ = [
    "CHECKPOINT_MODES",
    "checkpoint_mode",
    "cut_lineage",
    "get_checkpoint_mode",
    "set_checkpoint_mode",
]

CHECKPOINT_MODES = ("local", "reliable", "storage")

# Process-global ON PURPOSE (not thread-local): streaming foreachBatch
# callbacks and py4j callback handlers run on their own driver threads
# — a thread-local would silently revert those to 'local' after the
# user opted into durability. One process = one durability policy.
_STATE = {"mode": "local", "dir": None}


def _state() -> dict:
    return _STATE


def set_checkpoint_mode(mode: str, dir: Optional[str] = None) -> None:
    """Set the package-wide lineage-cut strategy. ``dir`` is required
    for ``storage`` and for ``reliable`` when the SparkContext has no
    checkpoint directory yet (it is applied lazily, at the first cut,
    so this can run before the session exists)."""
    if mode not in CHECKPOINT_MODES:
        raise ValueError(
            f"checkpoint mode must be one of {CHECKPOINT_MODES}, got {mode!r}"
        )
    if mode == "storage" and not dir:
        raise ValueError("storage checkpoint mode requires dir=")
    st = _state()
    st["mode"] = mode
    st["dir"] = dir


def get_checkpoint_mode() -> Tuple[str, Optional[str]]:
    st = _state()
    return st["mode"], st["dir"]


@contextmanager
def checkpoint_mode(mode: str, dir: Optional[str] = None):
    """Scoped :func:`set_checkpoint_mode` — restores the previous
    strategy on exit, so one reliable-mode job can't silently leave
    the process in reliable mode."""
    prev = get_checkpoint_mode()
    set_checkpoint_mode(mode, dir)
    try:
        yield
    finally:
        set_checkpoint_mode(prev[0], prev[1])


def cut_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialization boundary under the configured strategy: returns
    a DataFrame with the SAME rows whose plan no longer references
    ``df``'s lineage. Drop-in for ``df.localCheckpoint(eager)`` at
    every site in the package; see the module docstring for the
    mode-by-mode durability contract."""
    mode, cdir = get_checkpoint_mode()
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    if mode == "reliable":
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            if not cdir:
                raise ValueError(
                    "reliable checkpoint mode needs a checkpoint dir: "
                    "set_checkpoint_mode('reliable', dir=...) or "
                    "SparkContext.setCheckpointDir first"
                )
            sc.setCheckpointDir(cdir)
        return df.checkpoint(eager=eager)
    # storage: staged parquet write + read-back. Unique leaf per cut —
    # pid + uuid, so concurrent jobs/threads never collide.
    leaf = os.path.join(
        cdir, f"cut-{os.getpid()}-{uuid.uuid4().hex[:12]}.parquet"
    )
    df.write.mode("error").parquet(leaf)
    return df.sparkSession.read.parquet(leaf)
