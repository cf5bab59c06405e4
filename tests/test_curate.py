"""Corpus curation pipeline: stage semantics, determinism, plan shape."""

import pytest
from pyspark.sql import functions as F

from lantern_spark.operators.curate import CurationConfig, curate_corpus


@pytest.fixture(scope="module")
def corpus(spark):
    long_doc = " ".join(f"w{i} token body text" for i in range(40))
    rows = [
        (1, long_doc + " the quick brown fox jumps over the lazy dog"),
        (2, long_doc + " the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, long_doc + " the quick brown fox jumps over a lazy dog"),  # near dup of 1
        (4, "tiny"),  # fails min_tokens
        (5, "!!! ??? ... ###"),  # punctuation junk → low quality
        (6, " ".join(f"spark cluster item{i} executor shuffle" for i in range(40))),
        (7, None),  # null text
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestCurate:
    def test_stage_semantics(self, corpus):
        out, report = curate_corpus(
            corpus, "text", "doc_id",
            CurationConfig(min_tokens=5, min_quality=0.2, near_threshold=0.7),
            report=True,
        )
        ids = sorted(r["doc_id"] for r in out.collect())
        # 4 (short), 5 (junk), 7 (null) drop at heuristics; 2 drops at
        # exact dedup (dup of 1); 3 drops at near dedup (near-dup of 1,
        # min-id survivor keeps 1)
        assert ids == [1, 6]
        assert report["input"] == 7
        assert report["heuristics"] == 4
        assert report["exact_dedup"] == 3
        assert report["near_dedup"] == 2

    def test_stages_toggle(self, corpus):
        cfg = CurationConfig(
            min_tokens=5, min_quality=0.2, exact_dedup=False, near_dedup=False
        )
        ids = sorted(
            r["doc_id"]
            for r in curate_corpus(corpus, "text", "doc_id", cfg).collect()
        )
        assert ids == [1, 2, 3, 6]  # dups survive with dedup off

    def test_deterministic(self, corpus):
        cfg = CurationConfig(min_tokens=5, min_quality=0.2, near_threshold=0.7)
        a = sorted(
            r["doc_id"]
            for r in curate_corpus(corpus, "text", "doc_id", cfg).collect()
        )
        b = sorted(
            r["doc_id"]
            for r in curate_corpus(corpus, "text", "doc_id", cfg).collect()
        )
        assert a == b

    def test_extra_predicates(self, corpus):
        cfg = CurationConfig(
            min_tokens=5, min_quality=0.2, exact_dedup=False,
            near_dedup=False,
            extra_predicates=[F.col("doc_id") % 2 == 0],
        )
        ids = sorted(
            r["doc_id"]
            for r in curate_corpus(corpus, "text", "doc_id", cfg).collect()
        )
        assert ids == [2, 6]

    def test_heuristics_fuse_into_one_scan(self, corpus):
        """Stages 1-3 are column expressions — no shuffle, no Python
        workers before the dedup stages."""
        cfg = CurationConfig(
            min_tokens=5, min_quality=0.2, exact_dedup=False, near_dedup=False
        )
        out = curate_corpus(corpus, "text", "doc_id", cfg)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "EvalPython" not in plan

    def test_corpus_scale_smoke(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = curate_corpus(
            docs, "text", "doc_id", CurationConfig(near_dedup=True)
        )
        n = out.count()
        assert 0 < n <= docs.count()
