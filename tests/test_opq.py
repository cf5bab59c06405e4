"""OPQ (Ge et al. 2013): learned-rotation PQ — distortion strictly
improves on plain PQ for cross-subspace-correlated data, rotation is
orthonormal, training is deterministic, artifacts round-trip."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lantern_spark.types import PQSpec
from lantern_spark.operators.opq import (
    OPQModel,
    opq_adc_dist,
    opq_encode,
    rotate_vectors,
    train_opq,
)

DIM, SPLITS, CLUSTERS = 16, 4, 8


def _correlated(n=2000, seed=7):
    """Data whose variance deliberately straddles the axis-aligned
    split boundaries: a random rotation of axis-concentrated
    clusters — the case plain PQ handles worst."""
    rng = np.random.RandomState(seed)
    base = rng.randn(n, DIM) * np.linspace(3.0, 0.05, DIM)[None, :]
    mix, _ = np.linalg.qr(rng.randn(DIM, DIM))
    return base @ mix


@pytest.fixture(scope="module")
def corr_df(spark):
    x = _correlated()
    return spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )


@pytest.fixture(scope="module")
def model(corr_df):
    return train_opq(
        corr_df, "embedding",
        PQSpec(dim=DIM, splits=SPLITS, clusters=CLUSTERS),
        iters=8, train_limit=None,
    )


class TestTrainOPQ:
    def test_beats_plain_pq_mse(self, spark, corr_df, model):
        """identity init: iteration 1 IS plain PQ, so train_mse must
        strictly beat the plain-PQ sample MSE (with real margin on
        this adversarial geometry)."""
        from lantern_spark.operators.opq import (
            _codebook_np,
            _encode_decode_local,
        )
        from lantern_spark.operators.pq import train_codebook_local

        spec = PQSpec(dim=DIM, splits=SPLITS, clusters=CLUSTERS)
        x = np.asarray(
            [r["embedding"] for r in corr_df.collect()], dtype=np.float64
        )
        x = x[np.lexsort(x.T[::-1])]
        plain_rows = train_codebook_local(x, spec)
        y = _encode_decode_local(x, _codebook_np(plain_rows, spec), spec)
        plain_mse = float(((x - y) ** 2).sum(axis=1).mean())
        assert model.train_mse < 0.9 * plain_mse, (
            model.train_mse, plain_mse,
        )

    def test_rotation_is_orthonormal(self, model):
        eye = model.rotation @ model.rotation.T
        assert np.allclose(eye, np.eye(DIM), atol=1e-10)

    def test_deterministic(self, corr_df):
        spec = PQSpec(dim=DIM, splits=SPLITS, clusters=CLUSTERS)
        a = train_opq(corr_df, "embedding", spec, iters=3, train_limit=None)
        b = train_opq(
            corr_df.repartition(7), "embedding", spec, iters=3,
            train_limit=None,
        )
        assert np.array_equal(a.rotation, b.rotation)
        assert a.codebook_rows == b.codebook_rows

    def test_random_init_also_orthonormal_and_reproducible(self, corr_df):
        spec = PQSpec(dim=DIM, splits=SPLITS, clusters=CLUSTERS)
        a = train_opq(
            corr_df, "embedding", spec, iters=2, train_limit=None,
            init="random",
        )
        assert np.allclose(
            a.rotation @ a.rotation.T, np.eye(DIM), atol=1e-10
        )

    def test_dim_mismatch_raises(self, spark):
        bad = spark.createDataFrame(
            [(1, [1.0, 2.0])], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="sample shape"):
            train_opq(
                bad, "embedding",
                PQSpec(dim=DIM, splits=SPLITS, clusters=CLUSTERS), iters=1,
            )


class TestOPQApply:
    def test_rotate_vectors_matches_numpy(self, spark, model):
        x = _correlated(n=50, seed=9)
        df = spark.createDataFrame(
            [(i, r.tolist()) for i, r in enumerate(x)],
            "vec_id long, embedding array<double>",
        )
        got = {
            r["vec_id"]: np.asarray(r["rot"])
            for r in df.withColumn(
                "rot", rotate_vectors("embedding", model.rotation)
            ).collect()
        }
        want = x @ model.rotation
        for i in range(len(x)):
            assert np.allclose(got[i], want[i], atol=1e-12)

    def test_rotation_preserves_l2(self, model):
        rng = np.random.RandomState(3)
        a, b = rng.randn(DIM), rng.randn(DIM)
        d0 = np.sum((a - b) ** 2)
        d1 = np.sum(((a @ model.rotation) - (b @ model.rotation)) ** 2)
        assert np.isclose(d0, d1, rtol=1e-12)

    def test_adc_recall_beats_plain_pq(self, spark, corr_df, model):
        """Top-10 by OPQ-ADC agrees with the exact top-10 at least as
        well as plain-PQ-ADC — the paper's operational win."""
        from lantern_spark.operators.pq import (
            encode_pq,
            pq_dist,
            train_codebook,
        )

        spec = PQSpec(dim=DIM, splits=SPLITS, clusters=CLUSTERS)
        x = np.asarray(
            [r["embedding"] for r in corr_df.collect()], dtype=np.float64
        )
        ids = [r["vec_id"] for r in corr_df.collect()]
        q = _correlated(n=1, seed=101)[0]
        exact = [
            ids[i]
            for i in np.argsort(((x - q) ** 2).sum(axis=1))[:10]
        ]

        def top10(scored):
            return [
                r["vec_id"]
                for r in scored.orderBy("pq_dist", "vec_id").limit(10).collect()
            ]

        plain_cb = train_codebook(corr_df, "embedding", spec, train_limit=None)
        plain_codes = encode_pq(corr_df, "embedding", plain_cb, spec)
        plain_top = top10(
            pq_dist(plain_codes, "embedding_pq", q.tolist(), plain_cb, spec)
        )

        opq_codes = opq_encode(corr_df, "embedding", model)
        opq_top = top10(opq_adc_dist(opq_codes, "pq_codes", q.tolist(), model))

        r_plain = len(set(plain_top) & set(exact)) / 10
        r_opq = len(set(opq_top) & set(exact)) / 10
        assert r_opq >= r_plain, (r_opq, r_plain)
        assert r_opq >= 0.5

    def test_null_vectors_pass_through(self, spark, model):
        df = spark.createDataFrame(
            [(1, None), (2, [0.0] * DIM)],
            "vec_id long, embedding array<double>",
        )
        out = {
            r["vec_id"]: r["pq_codes"]
            for r in opq_encode(df, "embedding", model).collect()
        }
        assert out[1] is None and out[2] is not None


class TestOPQPersistence:
    def test_save_load_roundtrip(self, tmp_path, model, spark, corr_df):
        p = str(tmp_path / "opq_model")
        model.save(p)
        back = OPQModel.load(p)
        assert np.array_equal(back.rotation, model.rotation)
        assert back.codebook_rows == model.codebook_rows
        assert back.spec == model.spec
        # loaded model encodes identically
        a = opq_encode(corr_df.limit(20), "embedding", model).collect()
        b = opq_encode(corr_df.limit(20), "embedding", back).collect()
        assert sorted(map(repr, a)) == sorted(map(repr, b))

    def test_format_version_gate(self, tmp_path, model):
        import json
        import os

        p = str(tmp_path / "opq_bad")
        model.save(p)
        fp = os.path.join(p, "opq.json")
        d = json.load(open(fp))
        d["format_version"] = 99
        json.dump(d, open(fp, "w"))
        with pytest.raises(ValueError, match="format_version"):
            OPQModel.load(p)


class TestIvfOpq:
    """opq=True through the IVF-PQ index family: codes stored rotated,
    query rotated in ADC, fold re-encodes in the same space, rebuild
    preserves the layout."""

    @pytest.fixture(scope="class")
    def corr_big(self, spark):
        x = _correlated(n=1200, seed=21)
        return spark.createDataFrame(
            [(i, row.tolist()) for i, row in enumerate(x)],
            "vec_id long, embedding array<double>",
        )

    def _build(self, corr_big, tmp, opq):
        from lantern_spark.operators.index import IVFIndex

        return IVFIndex.build(
            corr_big, "embedding", "vec_id", str(tmp),
            metric="l2sq", nlist=8, seed=42, train_limit=20000,
            pq=PQSpec(dim=DIM, splits=SPLITS, clusters=CLUSTERS),
            opq=opq,
        )

    @staticmethod
    def _stored_mse(spark, idx, x_by_id):
        """Corpus reconstruction MSE from the STORED codes: decode in
        the space the index stores codes in, rotate back if OPQ (the
        deterministic distortion witness — no query sampling noise)."""
        import os

        from lantern_spark.operators.opq import _codebook_np

        mf = idx.manifest
        spec = PQSpec(**mf.params["pq"])
        cb = _codebook_np(
            [
                (r["subvector_id"], r["centroid_id"], r["c"])
                for r in spark.read.parquet(
                    os.path.join(idx.path, "pq_codebook")
                ).collect()
            ],
            spec,
        )
        rot = mf.params.get("opq_rotation")
        err = n = 0.0
        for r in idx.lists(spark).select("vec_id", "__pq_codes").collect():
            codes = np.asarray(r["__pq_codes"], dtype=np.int64)
            recon = np.concatenate(
                [cb[s, codes[s]] for s in range(spec.splits)]
            )
            if rot is not None:  # decode lives in rotated space
                recon = recon @ np.asarray(rot).T
            err += float(((x_by_id[r["vec_id"]] - recon) ** 2).sum())
            n += 1
        return err / n

    def test_stored_codes_lower_distortion_than_plain(
        self, spark, corr_big, tmp_path
    ):
        """The OPQ index's stored codes must reconstruct the corpus
        with materially lower MSE than the plain-PQ index's — the
        deterministic form of the recall win (rotating back via Rᵀ
        puts both reconstructions in original space)."""
        idx_opq = self._build(corr_big, tmp_path / "opq", True)
        idx_pq = self._build(corr_big, tmp_path / "pq", False)
        assert idx_opq.manifest.params.get("opq_rotation")
        x_by_id = {
            r["vec_id"]: np.asarray(r["embedding"])
            for r in corr_big.collect()
        }
        mse_opq = self._stored_mse(spark, idx_opq, x_by_id)
        mse_pq = self._stored_mse(spark, idx_pq, x_by_id)
        assert mse_opq < 0.9 * mse_pq, (mse_opq, mse_pq)

    def test_fold_encodes_in_rotated_space(self, spark, corr_big, tmp_path):
        """The folded delta row's STORED code must equal the code of
        its ROTATED vector under the index codebook (byte-level pin —
        encoding unrotated would land on different codewords), and the
        exact re-rank must surface the planted row at distance 0."""
        from lantern_spark.operators.opq import (
            _codebook_np,
            _encode_decode_local,
        )

        idx = self._build(corr_big, tmp_path / "fold", True)
        q = _correlated(n=1, seed=777)[0]
        delta = spark.createDataFrame(
            [(99999, q.tolist())], "vec_id long, embedding array<double>"
        )
        idx.add_delta(delta)
        idx = idx.fold_delta(spark)
        stored = (
            idx.lists(spark).filter("vec_id = 99999").collect()
        )
        assert len(stored) == 1
        got_codes = list(stored[0]["__pq_codes"])
        mf = idx.manifest
        spec = PQSpec(**mf.params["pq"])
        rot = np.asarray(mf.params["opq_rotation"])
        import os

        cb = _codebook_np(
            [
                (r["subvector_id"], r["centroid_id"], r["c"])
                for r in spark.read.parquet(
                    os.path.join(idx.path, "pq_codebook")
                ).collect()
            ],
            spec,
        )
        qr = (q @ rot)[None, :]
        want = []
        for s in range(spec.splits):
            sub = qr[:, s * spec.subdim : (s + 1) * spec.subdim]
            d2 = ((sub[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
            want.append(int(np.argmin(d2, axis=1)[0]))
        assert got_codes == want
        # and the full ADC + exact-re-rank pipeline surfaces it
        top = idx.search_adc(
            spark, q.tolist(), k=1, nprobe=idx.manifest.nlist, oversample=8
        ).collect()
        assert top[0]["vec_id"] == 99999
        assert abs(top[0]["dist"]) < 1e-9

    def test_rebuild_preserves_opq_layout(self, spark, corr_big, tmp_path):
        idx = self._build(corr_big, tmp_path / "rb", True)
        rot_before = idx.manifest.params["opq_rotation"]
        idx2 = idx.rebuild(spark)
        assert idx2.manifest.params.get("opq_rotation") == rot_before
        q = _correlated(n=1, seed=888)[0]
        got = idx2.search_adc(
            spark, q.tolist(), k=5, nprobe=idx2.manifest.nlist
        ).collect()
        assert len(got) == 5

    def test_opq_without_pq_raises(self, spark, corr_big, tmp_path):
        from lantern_spark.operators.index import IVFIndex

        with pytest.raises(ValueError, match="requires pq"):
            IVFIndex.build(
                corr_big, "embedding", "vec_id", str(tmp_path / "bad"),
                nlist=8, opq=True,
            )


class TestDistributedOPQ:
    """r9 (review r8 item 5): the alternation can run its refits
    cluster-side — the sample never collects to the driver."""

    def test_distributed_equals_local_at_equal_sample(self, corr_df):
        spec = PQSpec(dim=DIM, splits=SPLITS, clusters=CLUSTERS)
        local = train_opq(
            corr_df, "embedding", spec, iters=6, train_limit=None
        )
        dist = train_opq(
            corr_df, "embedding", spec, iters=6, train_limit=None,
            distributed=True,
        )
        # same math, same seeds, same per-subvector lexsort — only
        # float summation order differs between the two paths
        assert np.allclose(dist.rotation, local.rotation, atol=1e-6)
        assert dist.train_mse == pytest.approx(local.train_mse, rel=1e-6)
        cb_l = {(s, c): tuple(v) for s, c, v in local.codebook_rows}
        cb_d = {(s, c): tuple(v) for s, c, v in dist.codebook_rows}
        assert set(cb_l) == set(cb_d)
        for key in cb_l:
            assert np.allclose(cb_l[key], cb_d[key], atol=1e-6), key

    def test_distributed_no_sample_collect(self, corr_df, monkeypatch):
        """The distributed path must never materialize the sample on
        the driver: collects are allowed only for the codebook
        (splits·clusters rows) and the per-batch partial stats."""
        spec = PQSpec(dim=DIM, splits=SPLITS, clusters=CLUSTERS)
        # patch the RUNTIME class (Spark 4: instances are
        # pyspark.sql.classic.dataframe.DataFrame; patching the
        # abstract pyspark.sql.DataFrame never intercepts)
        df_cls = type(corr_df)
        real_collect = df_cls.collect
        sizes = []

        def spy(self):
            rows = real_collect(self)
            sizes.append(len(rows))
            return rows

        monkeypatch.setattr(df_cls, "collect", spy)
        try:
            train_opq(
                corr_df, "embedding", spec, iters=2, train_limit=None,
                distributed=True,
            )
        finally:
            monkeypatch.undo()
        # 2000-row sample: every collect must be far smaller
        assert sizes and max(sizes) <= SPLITS * CLUSTERS + 64
