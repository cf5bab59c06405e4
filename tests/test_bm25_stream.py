"""Streaming BM25 maintenance (streaming/bm25_stream.py): the
text-family daemon analog — incremental postings appends must score
identically to a one-shot batch build, and consolidation must compact
without changing scores (consolidate_bm25_table semantics)."""

import os

import pytest
from pyspark.sql import functions as F

from lantern_spark.operators.bm25 import build_bm25_stats, search_bm25
from lantern_spark.streaming.bm25_stream import (
    consolidate_bm25_path,
    incremental_bm25_job,
    load_bm25_stats,
    write_bm25_stats,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "a quick brown dog outpaces a quick fox"),
    (3, "lorem ipsum dolor sit amet consectetur"),
    (4, "the dog sat on the log near the fox den"),
    (5, "ipsum factum quick quick quick brown"),
    (6, "wholly unrelated text about spark shuffles"),
]
SCHEMA = "doc_id long, text string"


def _scores(spark, stats, query="quick brown fox"):
    return [
        (r["doc_id"], round(r["bm25_score"], 6))
        for r in search_bm25(stats, query, limit=10, stem=False).collect()
    ]


class TestPersistedStats:
    def test_split_writes_equal_full_build(self, spark, tmp_path):
        """Appending two half-corpus builds loads to the same scores as
        one full build — the merge invariant, through the on-disk
        layout."""
        full = build_bm25_stats(
            spark.createDataFrame(DOCS, SCHEMA), "doc_id", "text", stem=False
        )
        path = str(tmp_path / "stats")
        for half in (DOCS[:3], DOCS[3:]):
            write_bm25_stats(
                build_bm25_stats(
                    spark.createDataFrame(half, SCHEMA),
                    "doc_id", "text", stem=False,
                ),
                path,
            )
        streamed = load_bm25_stats(spark, path)
        assert _scores(spark, streamed) == _scores(spark, full)
        # corpus stats fold exactly
        c = streamed.corpus.collect()[0]
        cf = full.corpus.collect()[0]
        assert c["num_docs"] == cf["num_docs"] == len(DOCS)
        assert c["avg_doc_len"] == pytest.approx(cf["avg_doc_len"])

    def test_consolidation_compacts_and_preserves_scores(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "stats")
        for half in (DOCS[:3], DOCS[3:]):
            write_bm25_stats(
                build_bm25_stats(
                    spark.createDataFrame(half, SCHEMA),
                    "doc_id", "text", stem=False,
                ),
                path,
            )
        before = _scores(spark, load_bm25_stats(spark, path))
        n_before = len(
            [f for f in os.listdir(os.path.join(path, "corpus"))
             if f.endswith(".parquet")]
        )
        consolidate_bm25_path(spark, path)
        after = _scores(spark, load_bm25_stats(spark, path))
        n_after = len(
            [f for f in os.listdir(os.path.join(path, "corpus"))
             if f.endswith(".parquet")]
        )
        assert after == before
        assert n_after == 1 < n_before


class TestIncrementalJob:
    @pytest.mark.slow
    def test_file_stream_end_to_end(self, spark, tmp_path):
        """Docs arriving across micro-batches build the same scored
        corpus as a batch build; a fragment-triggered consolidation
        fires and compacts."""
        src = tmp_path / "src"
        src.mkdir()
        stats_path = str(tmp_path / "stats")
        chk = str(tmp_path / "chk")
        for i, chunk in enumerate([DOCS[:2], DOCS[2:4], DOCS[4:]]):
            spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(src / f"b{i}"))

        query, state = incremental_bm25_job(
            spark,
            stats_path,
            str(src) + "/*",
            SCHEMA,
            "doc_id",
            "text",
            chk,
            stem=False,
            consolidate_every_fragments=3,
            max_files_per_trigger=1,
        )
        try:
            query.processAllAvailable()
        finally:
            query.stop()
        assert state["batches"] == 3
        assert state["consolidations"] >= 1  # 3 fragments hit the trigger
        streamed = load_bm25_stats(spark, stats_path)
        full = build_bm25_stats(
            spark.createDataFrame(DOCS, SCHEMA), "doc_id", "text", stem=False
        )
        assert _scores(spark, streamed) == _scores(spark, full)
        # exactly-once: re-running over the same checkpoint adds nothing
        query2, state2 = incremental_bm25_job(
            spark, stats_path, str(src) + "/*", SCHEMA,
            "doc_id", "text", chk, stem=False,
        )
        try:
            query2.processAllAvailable()
        finally:
            query2.stop()
        assert state2["batches"] == 0
        assert load_bm25_stats(spark, stats_path).corpus.collect()[0][
            "num_docs"
        ] == len(DOCS)


class TestReplayIdempotence:
    @pytest.mark.slow
    def test_epoch_rewrite_does_not_double_count(self, spark, tmp_path):
        """A redelivered micro-batch (same epoch id) overwrites its own
        files instead of appending a second copy — scores and corpus
        counts are unchanged (the at-least-once contract)."""
        path = str(tmp_path / "stats")
        s1 = build_bm25_stats(
            spark.createDataFrame(DOCS[:3], SCHEMA), "doc_id", "text",
            stem=False,
        )
        s2 = build_bm25_stats(
            spark.createDataFrame(DOCS[3:], SCHEMA), "doc_id", "text",
            stem=False,
        )
        write_bm25_stats(s1, path, epoch=0)
        write_bm25_stats(s2, path, epoch=1)
        once = _scores(spark, load_bm25_stats(spark, path))
        write_bm25_stats(s2, path, epoch=1)  # replay epoch 1
        again = _scores(spark, load_bm25_stats(spark, path))
        assert again == once
        assert load_bm25_stats(spark, path).corpus.collect()[0][
            "num_docs"
        ] == len(DOCS)

    def test_crashed_swap_recovers(self, spark, tmp_path):
        """A consolidation that died between the two renames leaves
        postings at __old; recover restores it and a subsequent load
        sees every doc."""
        import os

        from lantern_spark.streaming.bm25_stream import recover_bm25_path

        path = str(tmp_path / "stats")
        write_bm25_stats(
            build_bm25_stats(
                spark.createDataFrame(DOCS, SCHEMA), "doc_id", "text",
                stem=False,
            ),
            path,
            epoch=0,
        )
        # simulate the crash window: live dir renamed away, new one
        # never arrived
        os.rename(
            os.path.join(path, "postings"),
            os.path.join(path, "postings__old"),
        )
        recover_bm25_path(path)
        assert load_bm25_stats(spark, path).corpus.collect()[0][
            "num_docs"
        ] == len(DOCS)
        assert len(_scores(spark, load_bm25_stats(spark, path))) > 0


class TestCheckpointBinding:
    def test_fresh_checkpoint_on_existing_layout_refused(
        self, spark, tmp_path
    ):
        """Epoch ids restart at 0 with a fresh checkpoint; reusing an
        existing stats layout with one would double-count or silently
        drop batches — the job must refuse loudly."""
        import pytest

        src = tmp_path / "src"
        src.mkdir()
        _write = spark.createDataFrame(DOCS[:2], SCHEMA)
        _write.coalesce(1).write.mode("overwrite").parquet(str(src / "b0"))
        stats_path = str(tmp_path / "stats")
        q, _ = incremental_bm25_job(
            spark, stats_path, str(src) + "/*", SCHEMA,
            "doc_id", "text", str(tmp_path / "chk1"), stem=False,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        with pytest.raises(ValueError, match="bound to a different"):
            incremental_bm25_job(
                spark, stats_path, str(src) + "/*", SCHEMA,
                "doc_id", "text", str(tmp_path / "chk2"), stem=False,
            )
