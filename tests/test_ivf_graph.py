"""IVF×graph hybrid: per-cell HNSW graphs over IVF list partitions
(the SPANN-style layout — coarse routing + sub-linear in-cell walks)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lantern_spark.functions.distances import l2sq_dist
from lantern_spark.functions.vectors import vec_lit
from lantern_spark.operators.index import IVFIndex
from lantern_spark.operators.ivf_graph import (
    IVFGraphIndex,
    ivf_graph_recall_and_scan_fraction,
)
from lantern_spark.types import load_table

Q = [0.3 + 0.004 * i for i in range(64)]


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = load_table(spark, sf_dir, "embeddings").persist()
    df.count()
    return df


@pytest.fixture(scope="module")
def hybrid(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfg"))
    ivf = IVFIndex.build(
        emb, "embedding", "vec_id", path, metric="l2sq", nlist=8, seed=42
    )
    return IVFGraphIndex.attach(
        ivf, spark, m=12, ef_construction=80, seed=42
    )


def _exact_topk(emb, q, k=10):
    return (
        emb.select(
            "vec_id", l2sq_dist("embedding", vec_lit(list(q))).alias("d")
        )
        .orderBy(F.col("d").asc(), F.col("vec_id").asc())
        .limit(k)
        .collect()
    )


class TestIvfGraph:
    def test_fullprobe_large_ef_equals_exact(self, spark, emb, hybrid):
        """nprobe = nlist and ef ≥ cell size: every cell is walked
        near-exhaustively, so the hybrid must recover the exact top-k
        ids (graph dists are f32, so values compare approximately)."""
        got = hybrid.search(
            spark, Q, k=10, nprobe=hybrid.ivf.manifest.nlist, ef=600
        ).collect()
        want = _exact_topk(emb, Q, 10)
        assert [r["vec_id"] for r in got] == [r["vec_id"] for r in want]
        for g, w in zip(got, want):
            assert g["dist"] == pytest.approx(w["d"], rel=1e-5)

    def test_pruned_probe_matches_flat_ivf(self, spark, hybrid):
        """Same probed cells + near-exhaustive ef ⇒ identical ids to
        the flat IVF pruned search (the hybrid changes HOW a cell is
        searched, never WHICH cells)."""
        flat = hybrid.ivf.search(spark, Q, k=10, nprobe=2).collect()
        got = hybrid.search(spark, Q, k=10, nprobe=2, ef=600).collect()
        assert [r["vec_id"] for r in got] == [r["vec_id"] for r in flat]

    def test_quality_instrument(self, spark, emb, hybrid):
        probes = [
            [float(x) for x in r["embedding"]]
            for r in emb.orderBy("vec_id").limit(3).collect()
        ]
        rec, frac = ivf_graph_recall_and_scan_fraction(
            hybrid, spark, probes, k=5,
            nprobe=hybrid.ivf.manifest.nlist, ef=600,
        )
        assert rec == 1.0
        assert 0.0 < frac  # evals recorded

    def test_with_stats_columns(self, spark, hybrid):
        rows = hybrid.search(
            spark, Q, k=5, nprobe=2, ef=64, with_stats=True
        ).collect()
        assert {"list_id", "n_dist"} <= set(rows[0].asDict())
        assert all(r["n_dist"] > 0 for r in rows)

    def test_delta_and_tombstone_visible(self, spark, hybrid):
        probe = [float(v) + 9.0 for v in Q]  # far corner: unique best
        hybrid.ivf.add_delta(
            spark.createDataFrame(
                [(777001, probe)], "vec_id long, embedding array<double>"
            )
        )
        rows = hybrid.search(spark, probe, k=2, nprobe=2, ef=64).collect()
        assert rows[0]["vec_id"] == 777001 and rows[0]["dist"] == 0.0
        hybrid.ivf.delete(
            spark.createDataFrame([(777001,)], "vec_id long")
        )
        rows = hybrid.search(spark, probe, k=2, nprobe=2, ef=64).collect()
        assert 777001 not in [r["vec_id"] for r in rows]

    def test_stale_guard_after_rebuild(self, spark, emb, hybrid, tmp_path):
        path = str(tmp_path / "ivfg2")
        ivf = IVFIndex.build(
            emb, "embedding", "vec_id", path, metric="l2sq", nlist=8,
            seed=42,
        )
        hy = IVFGraphIndex.attach(ivf, spark, m=8, ef_construction=40)
        ivf.add_delta(
            spark.createDataFrame(
                [(555001, [0.0] * 64)], "vec_id long, embedding array<double>"
            )
        )
        ivf2 = ivf.rebuild(spark)  # folds delta → num_vectors changes
        hy2 = IVFGraphIndex(ivf2, hy.meta)
        with pytest.raises(ValueError, match="stale"):
            hy2.search(spark, Q, k=3)
        # re-attach clears it
        hy3 = IVFGraphIndex.attach(ivf2, spark, m=8, ef_construction=40)
        assert hy3.search(spark, Q, k=3).count() == 3

    def test_load_roundtrip(self, spark, hybrid):
        re = IVFGraphIndex.load(hybrid.ivf.path)
        got = re.search(spark, Q, k=5, nprobe=2, ef=600).collect()
        want = hybrid.search(spark, Q, k=5, nprobe=2, ef=600).collect()
        assert [r["vec_id"] for r in got] == [r["vec_id"] for r in want]


class TestIvfGraphHamming:
    def test_hamming_cells(self, spark, tmp_path):
        rng = np.random.RandomState(23)
        from lantern_spark.functions.bitops import from_uint32_words

        rows = [
            (
                int(i),
                from_uint32_words(
                    rng.randint(0, 2**32, size=4, dtype=np.uint64)
                    .astype(np.uint32)[None, :]
                )[0].tolist(),
            )
            for i in range(300)
        ]
        df = spark.createDataFrame(rows, "vec_id long, code array<int>")
        ivf = IVFIndex.build(
            df, "code", "vec_id", str(tmp_path / "hivf"),
            metric="hamming", nlist=4, seed=42,
        )
        hy = IVFGraphIndex.attach(ivf, spark, m=8, ef_construction=60)
        probe = rows[7][1]
        got = hy.search(
            spark, probe, k=5, nprobe=ivf.manifest.nlist, ef=400
        ).collect()
        assert got[0]["vec_id"] == 7 and got[0]["dist"] == 0.0
        ds = [r["dist"] for r in got]
        assert ds == sorted(ds)
