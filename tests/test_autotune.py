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
