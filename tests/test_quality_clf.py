"""fastText-style quality classifier (operators/quality_clf).

Separation is tested on synthetic clean-English vs gibberish corpora;
determinism, persistence, plan shape, and the weak-label helper round
out the pipeline contract.
"""

import pytest


def _corpus(spark, n=60):
    """n 'good' fluent-English docs (label 1) + n gibberish docs."""
    good_tpl = (
        "the quick brown fox jumps over the lazy dog and then the "
        "dog walks to the house with a friend number %d to read books"
    )
    bad_tpl = "zqx%d wkj vvv zzz qqq xkcd jjj %d zz qq xx kk jj ww vv"
    rows = [(i, good_tpl % i, 1.0) for i in range(n)] + [
        (1000 + i, bad_tpl % (i, i), 0.0) for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, label double"
    )


@pytest.fixture(scope="module")
def model(spark):
    from lantern_spark.operators.quality_clf import train_quality_classifier

    return train_quality_classifier(
        _corpus(spark), "text", "label", n_features=1 << 12, max_iter=100, reg_param=1e-6
    )


class TestQualityClassifier:
    def test_separates_good_from_gibberish(self, spark, model):
        holdout = spark.createDataFrame(
            [
                (1, "the dog and the fox read books in the house"),
                (2, "zzz qqq xxx wkj zqx99 vv jj kk"),
            ],
            "doc_id long, text string",
        )
        s = {r["doc_id"]: r["quality_prob"] for r in model.score(
            holdout, "text"
        ).collect()}
        assert s[1] > 0.9 and s[2] < 0.1

    def test_score_preserves_columns_and_filter(self, spark, model):
        df = _corpus(spark, n=10)
        scored = model.score(df, "text")
        assert set(scored.columns) == {"doc_id", "text", "label", "quality_prob"}
        kept = model.filter(df, "text", min_prob=0.5)
        ids = {r["doc_id"] for r in kept.collect()}
        assert ids == {r["doc_id"] for r in df.filter("label = 1.0").collect()}

    def test_training_deterministic(self, spark):
        from lantern_spark.operators.quality_clf import train_quality_classifier

        df = _corpus(spark, n=20)
        m1 = train_quality_classifier(df, "text", "label", n_features=1 << 10)
        m2 = train_quality_classifier(
            df.repartition(7), "text", "label", n_features=1 << 10
        )
        import numpy as np

        c1 = np.asarray(m1.pipeline_model.stages[-1].coefficients.toArray())
        c2 = np.asarray(m2.pipeline_model.stages[-1].coefficients.toArray())
        assert np.allclose(c1, c2, atol=1e-6)

    def test_save_load_roundtrip(self, spark, model, tmp_path):
        from lantern_spark.operators.quality_clf import QualityClassifier

        model.save(str(tmp_path / "qc"))
        back = QualityClassifier.load(str(tmp_path / "qc"))
        df = _corpus(spark, n=5)
        a = sorted(
            (r["doc_id"], round(r["quality_prob"], 9))
            for r in model.score(df, "text").collect()
        )
        b = sorted(
            (r["doc_id"], round(r["quality_prob"], 9))
            for r in back.score(df, "text").collect()
        )
        assert a == b

    def test_format_version_gate(self, spark, model, tmp_path):
        import json
        import os

        from lantern_spark.operators.quality_clf import QualityClassifier

        model.save(str(tmp_path / "qc"))
        meta = json.load(open(tmp_path / "qc" / "meta.json"))
        meta["format_version"] = "2.0"
        json.dump(meta, open(tmp_path / "qc" / "meta.json", "w"))
        with pytest.raises(ValueError, match="format_version"):
            QualityClassifier.load(str(tmp_path / "qc"))

    def test_featurization_no_python_udf(self, spark, model):
        """The whole scoring chain stays JVM-side: tokenize/bigrams are
        Catalyst expressions, HashingTF/LR are ML transformers — no
        EvalPython anywhere."""
        df = _corpus(spark, n=5)
        plan = (
            model.score(df, "text")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "EvalPython" not in plan

    def test_weak_labels_from_sources(self, spark, sf_dir):
        from lantern_spark.operators.quality_clf import (
            weak_labels_from_sources,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        lab = weak_labels_from_sources(docs, "source", ["src0"])
        got = lab.groupBy("source", "label").count().collect()
        for r in got:
            assert r["label"] == (1.0 if r["source"] == "src0" else 0.0)

    def test_end_to_end_on_testdata_sources(self, spark, sf_dir):
        """Pipeline shape on the real table: weak-label by source,
        train, score the corpus — scores are valid probabilities and
        the positive-source mean exceeds the negative mean."""
        from lantern_spark.operators.quality_clf import (
            train_quality_classifier,
            weak_labels_from_sources,
        )
        from pyspark.sql import functions as F

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        lab = weak_labels_from_sources(docs, "source", ["src0"])
        m = train_quality_classifier(
            lab, "text", "label", n_features=1 << 12, max_iter=20
        )
        agg = (
            m.score(lab, "text")
            .groupBy("label")
            .agg(F.avg("quality_prob").alias("p"))
            .collect()
        )
        by = {r["label"]: r["p"] for r in agg}
        assert 0.0 <= by[0.0] <= 1.0 and 0.0 <= by[1.0] <= 1.0
        assert by[1.0] > by[0.0]
