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

Scale: per-batch work is bounded by the batch (the corpus is never
rescanned); consolidation is one shuffle over the postings table,
amortized across ``consolidate_every_batches`` batches.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lantern_spark.operators.bm25 import BM25Stats, build_bm25_stats

__all__ = [
    "write_bm25_stats",
    "load_bm25_stats",
    "consolidate_bm25_path",
    "incremental_bm25_job",
]


def write_bm25_stats(stats: BM25Stats, path: str, mode: str = "append") -> None:
    """Persist a stats build. ``corpus/`` stores (num_docs, total_len)
    — totals, not averages, so appended rows fold exactly."""
    stats.postings.write.mode(mode).parquet(os.path.join(path, "postings"))
    stats.corpus.select(
        F.col("num_docs").cast("long"),
        (F.col("avg_doc_len") * F.col("num_docs")).alias("total_len"),
    ).write.mode(mode).parquet(os.path.join(path, "corpus"))


def load_bm25_stats(spark: SparkSession, path: str) -> BM25Stats:
    """Open a persisted layout as a live BM25Stats — correct at any
    fragmentation (per-(term, doc) rows are re-summed; corpus totals
    fold)."""
    postings = (
        spark.read.parquet(os.path.join(path, "postings"))
        .groupBy("term", "doc_id", "doc_len")
        .agg(F.sum("fq").cast("int").alias("fq"))
    )
    corpus = (
        spark.read.parquet(os.path.join(path, "corpus"))
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


def _fragment_count(path: str, sub: str) -> int:
    d = os.path.join(path, sub)
    if not os.path.isdir(d):
        return 0
    return sum(1 for f in os.listdir(d) if f.endswith(".parquet"))


def consolidate_bm25_path(spark: SparkSession, path: str) -> None:
    """Re-sum and rewrite the layout compacted (consolidate_bm25_table
    analog): one groupBy over postings, one corpus fold, staged write +
    swap so readers never see a half-written layout."""
    stats = load_bm25_stats(spark, path)
    staged = path.rstrip("/") + "__consolidated"
    stats.postings.write.mode("overwrite").parquet(
        os.path.join(staged, "postings")
    )
    stats.corpus.select(
        F.col("num_docs").cast("long"),
        (F.col("avg_doc_len") * F.col("num_docs")).alias("total_len"),
    ).repartition(1).write.mode("overwrite").parquet(
        os.path.join(staged, "corpus")
    )
    import shutil

    old = path.rstrip("/") + "__old"
    os.rename(path, old)
    os.rename(staged, path)
    shutil.rmtree(old)


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
):
    """Start the continuous job. Returns (query, state);
    ``state["consolidations"]`` counts compaction runs. Drain with
    ``query.processAllAvailable()`` in tests."""
    state = {"batches": 0, "consolidations": 0}

    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
    )

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        stats = build_bm25_stats(batch_df, id_col, text_col, stem=stem)
        write_bm25_stats(stats, stats_path, mode="append")
        state["batches"] += 1
        if (
            consolidate_every_fragments
            and _fragment_count(stats_path, "corpus")
            >= consolidate_every_fragments
        ):
            consolidate_bm25_path(spark, stats_path)
            state["consolidations"] += 1

    query = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
    return query, state
