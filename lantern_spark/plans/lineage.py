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
  across jobs). Leaf growth is bounded by :class:`CutChain` (r14):
  the package's state-replacement loops thread a chain through their
  cuts, deleting each superseded leaf once the next materializes, so
  a 20-iteration loop holds ``keep`` (1-2) live copies, not 20;
  ``clear_storage_cuts(dir)`` sweeps finished jobs' final leaves.

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
    "CutChain",
    "checkpoint_mode",
    "clear_storage_cuts",
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


def _leaf_fs(path: str):
    """FS adapter for deleting a storage-cut leaf: the local default
    for plain paths, the pyarrow adapter for URI dirs (the Spark job
    wrote the leaf through its Hadoop connector; the driver-side
    delete needs the object-store API)."""
    from lantern_spark import _fsutil

    if "://" in path:
        return _fsutil.ArrowFS(path)
    return _fsutil.LOCAL_FS


class CutChain:
    """Garbage collection for storage-mode cut leaves in
    STATE-REPLACEMENT loops (r14, review r13 item 2).

    Storage-mode :func:`cut_lineage` writes one parquet leaf per cut
    and, alone, never removes any — a 20-iteration PageRank leaks 19
    dead copies of its state under ``dir``. A loop that REPLACES its
    state each iteration threads a chain through its cuts; once a new
    cut materializes, leaves beyond the newest ``keep`` are deleted
    (best-effort — a failed delete never fails the job).

    ``keep=1`` (default) retains only the live state: right for loops
    where nothing references the previous state once the next cut
    exists (``domain_pagerank``, ``domain_harmonic_centrality``).
    ``keep=2`` retains the previous leaf too: REQUIRED when the loop
    still reads the prior state after cutting the new one (a
    convergence check joining new against old —
    ``connected_components``). Growth is bounded at ``keep`` copies
    instead of one per iteration.

    NOT for accumulating shapes: ``expand_seed_domains`` unions EVERY
    hop's cut into its result, so all its leaves stay live until the
    result is consumed — it deliberately takes no chain (hops are 1-3;
    clean up with :func:`clear_storage_cuts` between jobs).

    Explicit cleanup: ``release()`` deletes ALL retained leaves,
    including the one backing the final DataFrame — call it (or use
    the chain as a context manager, which releases on exit) only after
    the loop's result has been consumed or persisted elsewhere. In
    ``local``/``reliable`` modes the chain is inert (no files of ours
    to collect; Spark's ContextCleaner owns reliable checkpoints —
    set ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` at
    session build, or point the dir at a TTL'd bucket)."""

    def __init__(self, keep: int = 1):
        self.keep = max(1, int(keep))
        self._leaves: list = []

    def _register(self, leaf: str) -> None:
        self._leaves.append(leaf)
        while len(self._leaves) > self.keep:
            self._drop(self._leaves.pop(0))

    @staticmethod
    def _drop(leaf: str) -> None:
        try:
            _leaf_fs(leaf).rmtree(leaf)
        except Exception:
            pass  # best-effort: a failed delete must never fail the job

    def release(self) -> None:
        while self._leaves:
            self._drop(self._leaves.pop())

    def __enter__(self) -> "CutChain":
        return self

    def __exit__(self, *exc) -> None:
        self.release()


def clear_storage_cuts(dir: str) -> None:
    """Delete every ``cut-*`` leaf under ``dir`` — the between-jobs
    sweep for storage-mode checkpoint dirs (chains bound growth DURING
    a loop; the final leaf of each loop backs its result DataFrame and
    outlives the call, so the dir still accumulates one leaf per
    completed job until swept)."""
    fs = _leaf_fs(dir)
    for name in fs.listdir(dir):
        if name.startswith("cut-"):
            fs.rmtree(fs.join(dir, name))


def cut_lineage(
    df: DataFrame,
    eager: bool = True,
    chain: Optional[CutChain] = None,
    scheduling_only: bool = False,
) -> DataFrame:
    """Materialization boundary under the configured strategy: returns
    a DataFrame with the SAME rows whose plan no longer references
    ``df``'s lineage. Drop-in for ``df.localCheckpoint(eager)`` at
    every site in the package; see the module docstring for the
    mode-by-mode durability contract. ``chain`` (storage mode only)
    garbage-collects superseded leaves — see :class:`CutChain`.

    ``scheduling_only=True`` (r15, r14 ADVICE): marks a cut that is a
    pure scheduling optimization on a per-call QUERY path (share a
    small multi-referenced relation by RDD identity instead of
    re-running its shuffle per reference). Under ``local`` mode it
    behaves normally; under the durability modes it returns ``df``
    unchanged — a reliable/storage cut there would stage a durable
    copy of the relation at query-construction time on EVERY call
    (and, in storage mode, leak the leaf until
    :func:`clear_storage_cuts`). Durability is for loop/build state,
    not transient query scheduling; results are identical either way,
    only per-reference recompute returns."""
    mode, cdir = get_checkpoint_mode()
    if scheduling_only and mode != "local":
        return df
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
    if chain is not None:
        chain._register(leaf)
    return df.sparkSession.read.parquet(leaf)
