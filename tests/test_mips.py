"""MIPS → cosine reduction (Neyshabur & Srebro 2015): exactness,
constant augmented norm, index composition, pinned-M clamp."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lantern_spark.operators.mips import (
    max_norm,
    mips_augment,
    mips_knn,
    mips_query,
)


def _corpus(spark, n=400, dim=12, seed=2):
    rng = np.random.RandomState(seed)
    # deliberately mixed norms: MIPS and cosine DISAGREE on this data,
    # so the reduction has something to prove
    x = rng.randn(n, dim) * rng.gamma(2.0, 1.0, size=(n, 1))
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(x)],
        "vid long, v array<double>",
    )
    return x, df


class TestMipsReduction:
    def test_exact_equivalence_with_brute_force_ip(self, spark):
        x, df = _corpus(spark)
        rng = np.random.RandomState(7)
        for q in rng.randn(3, x.shape[1]):
            got = [
                r["vid"]
                for r in mips_knn(df, "v", "vid", q.tolist(), k=10).collect()
            ]
            scores = x @ q
            want = sorted(range(len(x)), key=lambda i: (-scores[i], i))[:10]
            assert got == want
            # and plain cosine top-k would have been WRONG on this data
            cosr = scores / np.linalg.norm(x, axis=1)
            cos_top = sorted(range(len(x)), key=lambda i: (-cosr[i], i))[:10]
            assert cos_top != want

    def test_ip_scores_reported_raw(self, spark):
        x, df = _corpus(spark, n=100)
        q = np.ones(x.shape[1])
        rows = mips_knn(df, "v", "vid", q.tolist(), k=5).collect()
        for r in rows:
            assert r["ip_score"] == pytest.approx(float(x[r["vid"]] @ q))

    def test_augmented_norm_is_constant_m(self, spark):
        x, df = _corpus(spark, n=200)
        m = max_norm(df, "v")
        assert m == pytest.approx(float(np.linalg.norm(x, axis=1).max()))
        norms = (
            mips_augment(df, "v")
            .select(
                F.sqrt(
                    F.aggregate(
                        "v_mips", F.lit(0.0), lambda a, b: a + b * b
                    )
                ).alias("n")
            )
            .collect()
        )
        for r in norms:
            assert r["n"] == pytest.approx(m, rel=1e-9)

    def test_pinned_m_clamps_oversized_rows(self, spark):
        df = spark.createDataFrame(
            [(0, [3.0, 4.0]), (1, [30.0, 40.0]), (2, None)],
            "vid long, v array<double>",
        )
        aug = {
            r["vid"]: r["v_mips"]
            for r in mips_augment(df, "v", m=10.0).collect()
        }
        assert aug[0][-1] == pytest.approx(np.sqrt(100.0 - 25.0))
        assert aug[1][-1] == 0.0  # norm 50 > pinned M=10: pad clamps
        assert aug[2] is None

    def test_composes_with_cos_ivf_index(self, spark, tmp_path):
        from lantern_spark.operators.index import IVFIndex

        x, df = _corpus(spark, n=300)
        aug = mips_augment(df, "v").where(F.col("v_mips").isNotNull())
        idx = IVFIndex.build(
            aug, "v_mips", "vid", str(tmp_path / "mips_ivf"), metric="cos"
        )
        rng = np.random.RandomState(5)
        q = rng.randn(x.shape[1])
        hits = [
            r["vid"]
            for r in idx.search(
                spark,
                mips_query(q.tolist()),
                k=10,
                nprobe=len(idx.manifest.centroids),  # full probe == exact
            ).collect()
        ]
        scores = x @ q
        want = sorted(range(len(x)), key=lambda i: (-scores[i], i))[:10]
        assert sorted(hits) == sorted(want)

    def test_augment_is_map_only(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        plan = (
            mips_augment(emb, "embedding", m=100.0)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "EvalPython" not in plan
