"""Continuous BM25 maintenance: stream new documents into a persisted
postings table.

Daemon parity for the text-search family (the reference's
``create_bm25_table`` + incremental inserts + periodic
``consolidate_bm25_table``, bm25_api.sql:110-159): a readStream over
the document source feeds ``foreachBatch``; each micro-batch builds
its own postings/corpus stats (one explode + groupBy over ONLY the new
docs) and APPENDS them to a persisted stats layout. Append fragments
are exactly the reference's "duplicate term rows created by
incremental inserts"; a fragment-count-triggered consolidation re-sums
and rewrites them compacted — the streaming twin of
``consolidate_bm25_table``, with the same trigger shape as
``index_stream``'s size-triggered rebuild.

Layout (``stats_path/``):
- ``postings/`` — (term, doc_id, fq, doc_len), append-written per
  batch; scoring-correct at ANY fragmentation because BM25 math only
  needs per-(term, doc) sums and those rows never conflict across
  batches for distinct docs.
- ``corpus/`` — one (num_docs, total_len) row per batch; global
  num_docs / avg_doc_len are one tiny aggregate away.

Filesystem seam (r14, review r13 item 1): every path operation the
machinery performs itself — fragment counting, the epoch ledger, the
job marker, the consolidation publish — goes through an injectable
:class:`~lantern_spark._fsutil.FS` adapter (default
:data:`~lantern_spark._fsutil.LOCAL_FS`, unchanged local behavior).
On a rename-less object store the consolidation publish degrades from
the staged-dir swap to the generation-pointer commit (see
``_fsutil``'s module docstring); ``vd_live`` resolves where fragments
land and where Spark reads, so the two protocols share all the code
above the seam. Spark's own parquet I/O goes through its Hadoop
connectors and is untouched.

Scale: per-batch work is bounded by the batch (the corpus is never
rescanned); consolidation is one shuffle over the postings table,
amortized across ``consolidate_every_batches`` batches.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lantern_spark._fsutil import (
    FS,
    LOCAL_FS,
    vd_commit,
    vd_live,
    vd_recover,
    vd_stage,
)
from lantern_spark.operators.bm25 import BM25Stats, build_bm25_stats

__all__ = [
    "write_bm25_stats",
    "load_bm25_stats",
    "consolidate_bm25_path",
    "recover_bm25_path",
    "incremental_bm25_job",
]


def write_bm25_stats(
    stats: BM25Stats,
    path: str,
    mode: str = "append",
    epoch: Optional[int] = None,
    fs: FS = LOCAL_FS,
) -> None:
    """Persist a stats build. ``corpus/`` stores (num_docs, total_len)
    — totals, not averages, so appended rows fold exactly.

    ``epoch``: when given, the write goes to per-epoch subdirectories
    (``postings/batch_<epoch>``) in OVERWRITE mode — a replayed
    micro-batch rewrites the identical files instead of appending a
    second copy, the idempotence contract foreachBatch's at-least-once
    delivery requires."""
    pdir = vd_live(fs.join(path, "postings"), fs)
    cdir = vd_live(fs.join(path, "corpus"), fs)
    if epoch is not None:
        pdir = fs.join(pdir, f"batch_{epoch}")
        cdir = fs.join(cdir, f"batch_{epoch}")
        mode = "overwrite"
    stats.postings.write.mode(mode).parquet(pdir)
    stats.corpus.select(
        F.col("num_docs").cast("long"),
        (F.col("avg_doc_len") * F.col("num_docs")).alias("total_len"),
    ).write.mode(mode).parquet(cdir)


def load_bm25_stats(
    spark: SparkSession, path: str, fs: FS = LOCAL_FS
) -> BM25Stats:
    """Open a persisted layout as a live BM25Stats — correct at any
    fragmentation (per-(term, doc) rows are re-summed; corpus totals
    fold). ``recursiveFileLookup`` reads flat (consolidated) files and
    per-epoch subdirectories alike."""
    postings = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(vd_live(fs.join(path, "postings"), fs))
        .groupBy("term", "doc_id", "doc_len")
        .agg(F.sum("fq").cast("int").alias("fq"))
    )
    corpus = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(vd_live(fs.join(path, "corpus"), fs))
        .agg(
            F.sum("num_docs").cast("long").alias("num_docs"),
            F.sum("total_len").alias("total_len"),
        )
        .select(
            F.col("num_docs").cast("int").alias("num_docs"),
            F.try_divide(F.col("total_len"), F.col("num_docs")).alias(
                "avg_doc_len"
            ),
        )
    )
    return BM25Stats(postings=postings, corpus=corpus)


def _fragment_count(path: str, sub: str, fs: FS = LOCAL_FS) -> int:
    """Parquet files in PER-EPOCH fragment dirs (``batch_*``) only.

    The consolidated rewrite lands FLAT in the live dir and is excluded
    on purpose (r14, review r13 advice): counting its files would keep
    the trigger permanently over threshold whenever the consolidated
    write has >= ``consolidate_every_fragments`` partitions (shuffle
    partitions default 200 vs a trigger of 32), degenerating the
    amortized compaction into a full-table shuffle on EVERY micro-batch.
    Excluding it makes the trigger exactly "fragments appended since the
    last consolidation" — and lets the consolidated table keep its
    AQE-sized partitioning instead of being forced through a
    single-file ``repartition(1)`` that a billion-edge graph or
    full-corpus postings table could not afford."""
    d = vd_live(fs.join(path, sub), fs)
    if not fs.isdir(d):
        return 0
    return sum(
        1
        for p, _sz in fs.walk_files(d)
        if p.endswith(".parquet")
        and os.path.basename(os.path.dirname(p)).startswith("batch_")
    )


def _seen_epochs(path: str, fs: FS = LOCAL_FS) -> set:
    import json

    raw = fs.read_text(fs.join(path, "_epochs.json"))
    if raw is None:
        return set()
    return set(json.loads(raw))


def _mark_epoch(path: str, epoch: int, fs: FS = LOCAL_FS) -> None:
    """Atomic-publish ledger update (tmp+rename locally, single-object
    PUT on stores) — a reader never sees a torn ledger."""
    import json

    fs.makedirs(path)
    seen = _seen_epochs(path, fs) | {int(epoch)}
    fs.write_text(fs.join(path, "_epochs.json"), json.dumps(sorted(seen)))


def recover_bm25_path(path: str, fs: FS = LOCAL_FS) -> None:
    """Self-heal a layout whose last consolidation crashed mid-publish
    (shared machinery: ``_fsutil.vd_recover`` — the ``__old`` swap
    backup locally, orphan/superseded generations on stores); stale
    staging dirs are cleared. Idempotent; called at consolidation and
    job start."""
    for sub in ("postings", "corpus"):
        vd_recover(fs.join(path, sub), fs)
    if fs.supports_rename:
        # pre-r14 staging root name, cleared for old on-disk layouts
        fs.rmtree(path.rstrip("/") + "__consolidated")


def consolidate_bm25_path(
    spark: SparkSession, path: str, fs: FS = LOCAL_FS
) -> None:
    """Re-sum and rewrite the layout compacted (consolidate_bm25_table
    analog): one groupBy over postings, one corpus fold, staged write +
    per-subdir publish. Locally the publish is the recoverable
    ``__old`` swap; on a rename-less store it is the atomic
    generation-pointer PUT — either way :func:`recover_bm25_path` (run
    here and at job start) heals a crash on any side of the publish,
    so the worst post-crash state is an unconsolidated layout, never a
    missing or double-counted one."""
    recover_bm25_path(path, fs)
    stats = load_bm25_stats(spark, path, fs)
    proot = fs.join(path, "postings")
    croot = fs.join(path, "corpus")
    staged_p = vd_stage(proot, fs)
    staged_c = vd_stage(croot, fs)
    stats.postings.write.mode("overwrite").parquet(staged_p)
    stats.corpus.select(
        F.col("num_docs").cast("long"),
        (F.col("avg_doc_len") * F.col("num_docs")).alias("total_len"),
    ).repartition(1).write.mode("overwrite").parquet(staged_c)
    vd_commit(proot, staged_p, fs)
    vd_commit(croot, staged_c, fs)


def incremental_bm25_job(
    spark: SparkSession,
    stats_path: str,
    source_path: str,
    source_schema,
    id_col: str,
    text_col: str,
    checkpoint_path: str,
    stem: bool = False,
    consolidate_every_fragments: Optional[int] = 32,
    max_files_per_trigger: int = 4,
    fs: FS = LOCAL_FS,
):
    """Start the continuous job. Returns (query, state);
    ``state["consolidations"]`` counts compaction runs. Drain with
    ``query.processAllAvailable()`` in tests.

    Replay safety (foreachBatch is at-least-once): per-epoch writes go
    to ``batch_<epoch>`` subdirs in overwrite mode, and a persisted
    epoch ledger skips epochs already folded by a consolidation — a
    redelivered micro-batch can therefore never double-count docs or
    term frequencies, whichever side of a crash it lands on."""
    state = {"batches": 0, "consolidations": 0}
    recover_bm25_path(stats_path, fs)
    # epoch ids are only unique WITHIN one checkpoint lineage —
    # Structured Streaming restarts numbering at 0 for a fresh
    # checkpoint, so a stats layout is bound to the checkpoint that
    # feeds it. Reusing the layout with a different checkpoint would
    # either double-count (everything re-reads) or silently drop
    # batches (ledger collisions): refuse loudly instead.
    import hashlib
    import json as _json

    ckey = (
        checkpoint_path
        if "://" in checkpoint_path
        else os.path.realpath(checkpoint_path)
    )
    run_key = hashlib.md5(ckey.encode()).hexdigest()[:12]
    marker = fs.join(stats_path, "_job.json")
    raw = fs.read_text(marker)
    if raw is not None:
        stored = _json.loads(raw)
        if stored.get("checkpoint_key") != run_key:
            raise ValueError(
                f"stats layout {stats_path} is bound to a different "
                "checkpoint; a fresh checkpoint re-reads the whole "
                "source, so pair it with a fresh stats_path (or keep "
                "the original checkpoint to resume)"
            )
    else:
        fs.makedirs(stats_path)
        fs.write_text(marker, _json.dumps({"checkpoint_key": run_key}))

    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
    )

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        eid = int(epoch_id)
        if eid in _seen_epochs(stats_path, fs):
            return  # already written AND possibly consolidated away
        stats = build_bm25_stats(batch_df, id_col, text_col, stem=stem)
        write_bm25_stats(stats, stats_path, epoch=eid, fs=fs)
        _mark_epoch(stats_path, eid, fs)
        state["batches"] += 1
        if (
            consolidate_every_fragments
            and _fragment_count(stats_path, "corpus", fs)
            >= consolidate_every_fragments
        ):
            consolidate_bm25_path(spark, stats_path, fs)
            state["consolidations"] += 1

    query = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
    return query, state
