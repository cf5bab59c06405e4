"""Autotune tests (index_autotune/mod.rs semantics)."""

import pytest

from lantern_spark.operators.autotune import AutotuneResult, autotune_index, results_df


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_autotune_meets_target(spark, emb):
    """Autotune must find params meeting the BASELINE recall target
    (≥0.95) on the driver embeddings — full-probe variants guarantee a
    recall-1.0 candidate exists in the grid."""
    best, results, _ = autotune_index(
        emb, "embedding", "vec_id",
        target_recall=0.95, num_queries=5,
        grid=[(8, 2), (8, 8), (4, 4)],
    )
    assert best.recall >= 0.95
    assert len(results) >= 1
    # selection rule: among meeting variants, min(latency + build)
    meeting = [r for r in results if r.recall >= 0.95]
    assert best == min(meeting, key=lambda r: r.latency_s + r.build_s)


def test_autotune_early_exit(spark, emb):
    """A recall-1.0 variant early in the grid stops the search
    (mod.rs:465-467)."""
    _, results, _ = autotune_index(
        emb, "embedding", "vec_id",
        target_recall=0.9, num_queries=3,
        grid=[(4, 4), (8, 8), (16, 16)],
    )
    assert len(results) == 1  # (4,4) is full-probe → recall 1.0 → exit


def test_results_df(spark):
    df = results_df(spark, [AutotuneResult(8, 4, 0.9, 0.1, 1.0)])
    assert set(df.columns) == {"nlist", "nprobe", "recall", "latency_s", "build_s"}


class TestTuneNprobe:
    """Closed-form search-knob selection on a built index (round 6):
    the recall-vs-nprobe curve derived from true-neighbor list ranks
    must agree with the measured end-to-end recall_at_k."""

    @pytest.fixture(scope="class")
    def index(self, spark, emb, tmp_path_factory):
        from lantern_spark.operators.index import IVFIndex

        path = str(tmp_path_factory.mktemp("tune_ivf"))
        return IVFIndex.build(
            emb, "embedding", "vec_id", path, metric="l2sq",
            nlist=16, seed=42,
        )

    def test_matches_measured_recall(self, spark, emb, index):
        from lantern_spark.operators.autotune import tune_nprobe
        from lantern_spark.operators.index import recall_at_k

        qs = [r[0] for r in emb.select("embedding").limit(4).collect()]
        nprobe, predicted = tune_nprobe(
            index, spark, qs, k=10, target_recall=0.9
        )
        measured = recall_at_k(index, spark, qs, k=10, nprobe=nprobe)
        assert predicted == pytest.approx(measured, abs=1e-9)
        assert predicted >= 0.9
        # minimality: one fewer probe must miss the target (unless
        # already at the floor)
        if nprobe > 1:
            assert recall_at_k(index, spark, qs, k=10, nprobe=nprobe - 1) < 0.9

    def test_full_probe_fallback(self, spark, index):
        """An unreachable target returns (nlist, 1.0) — full probe is
        exact."""
        from lantern_spark.operators.autotune import tune_nprobe
        from lantern_spark.queries.common import Q64

        nprobe, rec = tune_nprobe(
            index, spark, [Q64], k=10, target_recall=1.1
        )
        assert nprobe == index.manifest.nlist
        assert rec == 1.0

    def test_auto_nlist_scales_sqrt_n(self, spark, emb, tmp_path):
        """nlist=None defaults to round(sqrt(n)) clamped [4, 4096]."""
        from lantern_spark.operators.index import IVFIndex

        idx = IVFIndex.build(
            emb, "embedding", "vec_id", str(tmp_path / "auto"),
            metric="l2sq", nlist=None, seed=42,
        )
        n = emb.count()
        assert idx.manifest.nlist == round(n ** 0.5)


class TestHnswAutotune:
    """(m, efc, ef) sweep — the reference's native autotune target
    (index_autotune/mod.rs:328-359)."""

    def test_meets_target_and_selects_cheapest(self, spark, emb):
        from lantern_spark.operators.autotune import autotune_hnsw_index

        best, results, _ = autotune_hnsw_index(
            emb, "embedding", "vec_id",
            target_recall=0.9, num_queries=4, shards=2,
            grid=[(8, 40, 64), (16, 60, 96)],
        )
        assert best.recall >= 0.9
        meeting = [r for r in results if r.recall >= 0.9]
        assert best == min(meeting, key=lambda r: r.latency_s + r.build_s)

    def test_early_exit(self, spark, emb):
        from lantern_spark.operators.autotune import autotune_hnsw_index

        # near-exhaustive first variant on a tiny corpus → recall 1.0 →
        # the remaining grid entries must not build (mod.rs:465-467)
        _, results, _ = autotune_hnsw_index(
            emb, "embedding", "vec_id",
            target_recall=0.9, num_queries=3, shards=2,
            test_data_size=200,
            grid=[(32, 200, 256), (8, 40, 64), (6, 32, 64)],
        )
        assert len(results) == 1

    def test_create_path_builds_winner(self, spark, emb, tmp_path):
        from lantern_spark.operators.autotune import autotune_hnsw_index

        best, _, idx = autotune_hnsw_index(
            emb, "embedding", "vec_id",
            target_recall=0.5, num_queries=2, shards=2,
            grid=[(8, 40, 64)],
            create_path=str(tmp_path / "win"),
        )
        assert idx is not None
        assert idx.manifest["m"] == best.m
        assert idx.manifest["ef_construction"] == best.ef_construction
        top = idx.search(spark, [0.5] * 64, k=3, ef=64).collect()
        assert len(top) == 3


class TestIvfGraphAutotune:
    """Joint (nlist, nprobe, ef) tuning for the hybrid (VERDICT r6
    item 8) — grid over the COMPOSED structure, the reference's
    mod.rs:328-359 shape."""

    @pytest.mark.slow
    def test_meets_target_and_reports_eval_fraction(self, spark, emb):
        from lantern_spark.operators.autotune import (
            autotune_ivf_graph_index,
        )

        best, results, hyb = autotune_ivf_graph_index(
            emb, "embedding", "vec_id", target_recall=0.9,
            num_queries=4,
        )
        assert hyb is None  # no create_path
        assert results, "empty grid results"
        assert best.recall >= 0.9 or best.recall == max(
            r.recall for r in results
        )
        for r in results:
            assert 0.0 <= r.eval_fraction
            assert r.nlist >= 1 and r.nprobe >= 1 and r.ef >= 1

    def test_shared_build_per_nlist(self, spark, emb):
        """Grid rows sharing nlist reuse ONE build: only the first row
        of each nlist pays build time."""
        from lantern_spark.operators.autotune import (
            autotune_ivf_graph_index,
        )

        grid = [(8, 2, 32), (8, 4, 48), (8, 8, 64)]
        _best, results, _ = autotune_ivf_graph_index(
            emb, "embedding", "vec_id", target_recall=1.1,  # no early exit
            num_queries=3, grid=grid,
        )
        assert len(results) == 3
        assert results[0].build_s > 0.0
        assert results[1].build_s == 0.0 and results[2].build_s == 0.0

    def test_create_path_builds_winner(self, spark, emb, tmp_path):
        from lantern_spark.operators.autotune import (
            autotune_ivf_graph_index,
        )

        best, _results, hyb = autotune_ivf_graph_index(
            emb, "embedding", "vec_id", target_recall=0.9,
            num_queries=3, grid=[(4, 2, 48), (8, 4, 64)],
            create_path=str(tmp_path / "win"),
        )
        assert hyb is not None
        assert hyb.ivf.manifest.nlist == best.nlist
        # the winning search knobs drive the persisted hybrid
        top = hyb.search(
            spark, [0.5] * 64, k=3, nprobe=best.nprobe, ef=best.ef
        ).collect()
        assert len(top) == 3


class TestFileGroundTruthAutotune:
    """r13 (review r12 item 7): the reference CLI's sift-style recall
    fixture end-to-end — base vectors as .fvecs, query vectors as
    .fvecs, true-neighbor ids as .ivecs (index_autotune/
    mod.rs:188-218) — parsed back with read_vecs and fed through
    autotune_index, which must score against THE FILE's ground truth
    and early-exit at recall >= 0.999."""

    def test_fvecs_ivecs_through_autotune(self, spark, tmp_path):
        import numpy as np

        from lantern_spark.operators.autotune import (
            EARLY_EXIT_RECALL,
            autotune_index,
        )
        from lantern_spark.sources.vecfiles import read_vecs, write_vecs

        rng = np.random.default_rng(42)
        dim, n, n_q, k = 16, 600, 8, 5
        base = rng.normal(size=(n, dim))
        qs = base[:n_q] + 0.001 * rng.normal(size=(n_q, dim))
        # exact l2 ground truth, computed independently in numpy
        d2 = ((base[None, :, :] - qs[:, None, :]) ** 2).sum(axis=2)
        gt = np.argsort(d2, axis=1)[:, :k].astype(np.int32)

        write_vecs(base, str(tmp_path / "base.fvecs"), "fvecs")
        write_vecs(qs, str(tmp_path / "query.fvecs"), "fvecs")
        write_vecs(gt, str(tmp_path / "gt.ivecs"), "ivecs")

        from pyspark.sql import functions as F

        base_df = (
            read_vecs(spark, str(tmp_path / "base.fvecs"), "fvecs")
            .select(
                F.col("row_id").alias("vec_id"),
                F.col("vec").cast("array<double>").alias("embedding"),
            )
        )
        q_rows = (
            read_vecs(spark, str(tmp_path / "query.fvecs"), "fvecs")
            .orderBy("row_id")
            .collect()
        )
        gt_rows = (
            read_vecs(spark, str(tmp_path / "gt.ivecs"), "ivecs")
            .orderBy("row_id")
            .collect()
        )
        queries = [[float(x) for x in r["vec"]] for r in q_rows]
        ground_truth = [[int(x) for x in r["vec"]] for r in gt_rows]

        # full-probe variants: recall 1.0 on the file's truth, so the
        # tuner must stop after the FIRST grid entry (mod.rs:465-467)
        grid = [(4, 4), (8, 8), (16, 16)]
        best, results, _ = autotune_index(
            base_df,
            "embedding",
            "vec_id",
            k=k,
            num_queries=len(queries),
            grid=grid,
            queries=queries,
            ground_truth=ground_truth,
        )
        assert best.recall >= EARLY_EXIT_RECALL
        assert len(results) == 1, [r.recall for r in results]

    def test_ground_truth_builds_on_full_base(self, spark):
        """r14 (review r13 advice): file-based truth ids refer to the
        WHOLE base — variants must be built on the full df, not the
        test_data_size sample, or truth ids outside the sample are
        unreachable and recall silently deflates for every variant.
        A full-probe variant over truth ids deliberately beyond
        test_data_size must still reach recall 1.0."""
        import numpy as np

        from lantern_spark.operators.autotune import autotune_index

        rng = np.random.default_rng(11)
        base = rng.normal(size=(300, 8))
        base_df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(base)],
            "vec_id long, embedding array<double>",
        )
        # probe sits on row 250 — outside a 50-row sample
        q = base[250]
        d2 = ((base - q) ** 2).sum(axis=1)
        gt = [[int(i) for i in np.argsort(d2)[:5]]]
        assert max(gt[0]) >= 50
        best, results, _ = autotune_index(
            base_df, "embedding", "vec_id", k=5,
            test_data_size=50,  # would exclude every truth id
            grid=[(4, 4)],  # full probe: exact within the index
            queries=[[float(x) for x in q]], ground_truth=gt,
        )
        assert best.recall == 1.0, best.recall

    def test_ground_truth_actually_drives_recall(self, spark, tmp_path):
        """Falsifiability: a WRONG ground-truth file must drag recall
        down — proving the tuner scored the file, not its own scan."""
        import numpy as np

        from lantern_spark.operators.autotune import autotune_index

        rng = np.random.default_rng(7)
        base = rng.normal(size=(300, 8))
        base_df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(base)],
            "vec_id long, embedding array<double>",
        )
        queries = [[float(x) for x in base[3]]]
        bogus = [[299, 298, 297, 296, 295]]  # far-away ids
        best, results, _ = autotune_index(
            base_df, "embedding", "vec_id", k=5,
            grid=[(4, 4)], queries=queries, ground_truth=bogus,
        )
        assert best.recall <= 0.4, best.recall
