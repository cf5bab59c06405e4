"""Anisotropic PQ (ScaNN): degenerate-case pin, objective improvement,
ADC exactness, MIPS recall, determinism, persistence."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lantern_spark.operators.anisotropic import (
    APQModel,
    anisotropic_loss,
    apq_codes_local,
    apq_encode,
    default_eta,
    pq_ip_score,
    train_apq,
    train_apq_local,
)
from lantern_spark.types import PQSpec


def _sample(n=800, dim=16, seed=3):
    rng = np.random.RandomState(seed)
    # anisotropic data: a few dominant directions + noise (the shape
    # where score-aware quantization actually has something to win)
    basis = rng.randn(4, dim)
    w = rng.rand(n, 4) ** 2
    x = w @ basis + 0.1 * rng.randn(n, dim)
    return x


SPEC = PQSpec(dim=16, splits=4, clusters=16, seed=42)
ETA = 4.0


def _decode(codes: np.ndarray, cb: np.ndarray, spec: PQSpec) -> np.ndarray:
    cbz = np.where(np.isfinite(cb), cb, 0.0)
    out = np.empty((codes.shape[0], spec.dim))
    for s in range(spec.splits):
        out[:, s * spec.subdim : (s + 1) * spec.subdim] = cbz[s, codes[:, s]]
    return out


def _plain_model(x, eta=1.0):
    from lantern_spark.operators.pq import train_codebook_local

    return APQModel(
        spec=SPEC, eta=eta, codebook_rows=train_codebook_local(x, SPEC),
        train_loss=0.0,
    )


class TestApqTraining:
    def test_eta_one_is_exactly_plain_pq(self):
        """Falsifiability pin: the degenerate eta=1 case must reproduce
        the plain PQ codebook bit-for-bit."""
        from lantern_spark.operators.pq import train_codebook_local

        x = _sample()
        plain = train_codebook_local(x, SPEC)
        apq = train_apq_local(x, SPEC, eta=1.0)
        assert len(plain) == len(apq.codebook_rows)
        for (s1, c1, v1), (s2, c2, v2) in zip(plain, apq.codebook_rows):
            assert (s1, c1) == (s2, c2)
            assert v1 == pytest.approx(v2)

    def test_anisotropic_objective_beats_plain_pq(self):
        """The training objective must actually go down vs the plain-PQ
        codebook, measured with the SAME full-direction anisotropic
        loss and each codebook's own assignment rule — otherwise the
        alternation did nothing."""
        x = _sample()
        apq = train_apq_local(x, SPEC, eta=ETA)
        plain = _plain_model(x)

        dec_a = _decode(apq_codes_local(x, apq), apq.codebook_array(), SPEC)
        dec_p = _decode(
            apq_codes_local(x, plain), plain.codebook_array(), SPEC
        )
        loss_a = anisotropic_loss(x, dec_a, ETA)
        loss_p = anisotropic_loss(x, dec_p, ETA)
        assert loss_a < loss_p * 0.99, (loss_a, loss_p)

    def test_parallel_residual_shrinks(self):
        """The score-relevant (parallel) residual — what eta>1 buys —
        must shrink vs plain PQ, even at some total-MSE cost."""
        x = _sample()
        apq = train_apq_local(x, SPEC, eta=ETA)
        plain = _plain_model(x)

        def par2(model):
            dec = _decode(
                apq_codes_local(x, model), model.codebook_array(), SPEC
            )
            r = x - dec
            n = np.linalg.norm(x, axis=1)
            u = np.where(
                n[:, None] > 0, x / np.where(n == 0, 1.0, n)[:, None], 0.0
            )
            return float(((u * r).sum(axis=1) ** 2).mean())

        assert par2(apq) < par2(plain) * 0.9, (par2(apq), par2(plain))

    def test_deterministic_under_row_order(self):
        """Rows lexsort before the seeded fit (the PQ-trainer contract),
        so a shuffled sample trains the identical codebook."""
        x = _sample()
        a = train_apq_local(x, SPEC, eta=ETA)
        b = train_apq_local(np.ascontiguousarray(x[::-1]), SPEC, eta=ETA)
        for (s1, c1, v1), (s2, c2, v2) in zip(
            a.codebook_rows, b.codebook_rows
        ):
            assert (s1, c1) == (s2, c2)
            assert v1 == pytest.approx(v2)

    def test_save_load_roundtrip(self, tmp_path):
        x = _sample()
        m = train_apq_local(x, SPEC, eta=3.0)
        m.save(str(tmp_path / "apq"))
        m2 = APQModel.load(str(tmp_path / "apq"))
        assert m2.eta == m.eta
        assert m2.spec == m.spec
        assert m2.codebook_rows == pytest.approx(m.codebook_rows)

    def test_version_gate(self, tmp_path):
        import json
        import os

        x = _sample(n=100)
        m = train_apq_local(x, SPEC, eta=3.0)
        p = str(tmp_path / "apq")
        m.save(p)
        f = os.path.join(p, "apq.json")
        with open(f) as fh:
            d = json.load(fh)
        d["format_version"] = 99
        with open(f, "w") as fh:
            json.dump(d, fh)
        with pytest.raises(ValueError, match="format_version"):
            APQModel.load(p)

    def test_default_eta(self):
        assert default_eta(64) == pytest.approx(63 * 0.04 / 0.96)
        assert default_eta(2, threshold=0.01) == 1.0  # floored


class TestApqSpark:
    def _df(self, spark, x):
        return spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(x)],
            "vid long, v array<double>",
        )

    def test_encode_matches_local_and_is_deterministic(self, spark):
        x = _sample(n=300)
        model = train_apq_local(x, SPEC, eta=ETA)
        df = self._df(spark, x)
        got = {
            r["vid"]: list(r["v_apq"])
            for r in apq_encode(df, "v", model).collect()
        }
        want = apq_codes_local(x, model)
        for vid, codes in got.items():
            assert codes == want[vid].tolist(), vid
        got2 = {
            r["vid"]: list(r["v_apq"])
            for r in apq_encode(df.repartition(7), "v", model).collect()
        }
        assert got2 == got

    def test_null_vectors_encode_null(self, spark):
        df = spark.createDataFrame(
            [(0, [0.0] * 16), (1, None)], "vid long, v array<double>"
        )
        model = train_apq_local(_sample(n=100), SPEC, eta=2.0)
        rows = {
            r["vid"]: r["v_apq"] for r in apq_encode(df, "v", model).collect()
        }
        assert rows[1] is None
        assert rows[0] is not None  # zero vector: plain-L2 limit, valid code

    def test_ip_adc_is_exact_for_reconstruction(self, spark):
        """dot(q, decode(codes)) must equal the additive LUT sum
        EXACTLY (same additive decomposition) — the ADC correctness
        contract."""
        x = _sample(n=200)
        model = train_apq_local(x, SPEC, eta=3.0)
        df = apq_encode(self._df(spark, x), "v", model)
        q = np.arange(16, dtype=np.float64) / 7.5 - 1.0
        scored = {
            r["vid"]: r["ip_score"]
            for r in pq_ip_score(
                df, "v_apq", q.tolist(), model.codebook_rows, SPEC
            ).collect()
        }
        dec = _decode(apq_codes_local(x, model), model.codebook_array(), SPEC)
        for vid in range(len(x)):
            assert scored[vid] == pytest.approx(float(dec[vid] @ q), abs=1e-9)

    def test_mips_recall_apq_vs_plain(self, spark):
        """End-to-end MIPS: top-10-by-ADC recall against exact inner
        product. APQ must beat-or-match plain PQ at the same code size
        on the anisotropic corpus and clear an absolute floor; the
        Spark ADC must rank exactly like the numpy replay."""
        x = _sample(n=600)
        rng = np.random.RandomState(9)
        queries = x[rng.choice(len(x), 8, replace=False)] + 0.05 * rng.randn(
            8, 16
        )
        apq = train_apq_local(x, SPEC, eta=ETA)
        plain = _plain_model(x)

        def recall(model):
            dec = _decode(
                apq_codes_local(x, model), model.codebook_array(), SPEC
            )
            hits = 0
            for q in queries:
                truth = set(np.argsort(-(x @ q))[:10].tolist())
                approx = set(np.argsort(-(dec @ q))[:10].tolist())
                hits += len(truth & approx)
            return hits / (10 * len(queries))

        r_apq, r_pq = recall(apq), recall(plain)
        assert r_apq >= 0.5
        assert r_apq >= r_pq - 0.05, (r_apq, r_pq)

        df = apq_encode(self._df(spark, x), "v", apq)
        q0 = queries[0]
        top_spark = [
            r["vid"]
            for r in pq_ip_score(
                df, "v_apq", q0.tolist(), apq.codebook_rows, SPEC
            )
            .orderBy(F.desc("ip_score"), "vid")
            .limit(10)
            .collect()
        ]
        dec = _decode(apq_codes_local(x, apq), apq.codebook_array(), SPEC)
        scores = dec @ q0
        top_np = sorted(
            range(len(x)), key=lambda i: (-round(scores[i], 9), i)
        )[:10]
        assert top_spark == top_np

    def test_train_apq_from_dataframe(self, spark):
        x = _sample(n=400)
        m = train_apq(self._df(spark, x), "v", SPEC, eta=3.0)
        m_local = train_apq_local(x, SPEC, eta=3.0)
        for (s1, c1, v1), (s2, c2, v2) in zip(
            m.codebook_rows, m_local.codebook_rows
        ):
            assert (s1, c1) == (s2, c2)
            assert v1 == pytest.approx(v2)


class TestDistributedAPQ:
    """r9 (review r8 item 5): the assignment/update alternation runs
    cluster-side — codes persist as a column, the closed-form update
    reduces sufficient statistics, the sample never collects."""

    def _df(self, spark):
        x = _sample()
        return spark.createDataFrame(
            [(i, row.tolist()) for i, row in enumerate(x)],
            "vec_id long, embedding array<double>",
        )

    def test_distributed_equals_local_at_equal_sample(self, spark):
        df = self._df(spark)
        local = train_apq(
            df, "embedding", SPEC, eta=ETA, train_limit=None, iters=5
        )
        dist = train_apq(
            df, "embedding", SPEC, eta=ETA, train_limit=None, iters=5,
            distributed=True,
        )
        assert dist.eta == local.eta
        assert dist.train_loss == pytest.approx(local.train_loss, rel=1e-6)
        cb_l = {(s, c): tuple(v) for s, c, v in local.codebook_rows}
        cb_d = {(s, c): tuple(v) for s, c, v in dist.codebook_rows}
        assert set(cb_l) == set(cb_d)
        for key in cb_l:
            assert np.allclose(cb_l[key], cb_d[key], atol=1e-6), key

    def test_distributed_eta1_delegates_to_plain(self, spark):
        df = self._df(spark)
        local = train_apq(
            df, "embedding", SPEC, eta=1.0, train_limit=None, iters=3
        )
        dist = train_apq(
            df, "embedding", SPEC, eta=1.0, train_limit=None, iters=3,
            distributed=True,
        )
        cb_l = {(s, c): tuple(v) for s, c, v in local.codebook_rows}
        cb_d = {(s, c): tuple(v) for s, c, v in dist.codebook_rows}
        for key in cb_l:
            assert np.allclose(cb_l[key], cb_d[key], atol=1e-9), key
        assert dist.train_loss == pytest.approx(local.train_loss, rel=1e-9)

    def test_distributed_no_sample_collect(self, spark, monkeypatch):
        df = self._df(spark)
        df_cls = type(df)
        real_collect = df_cls.collect
        sizes = []

        def spy(self):
            rows = real_collect(self)
            sizes.append(len(rows))
            return rows

        monkeypatch.setattr(df_cls, "collect", spy)
        try:
            train_apq(
                df, "embedding", SPEC, eta=ETA, train_limit=None,
                iters=2, distributed=True,
            )
        finally:
            monkeypatch.undo()
        # 800-row sample: only codebook rows + per-batch stat rows
        assert sizes and max(sizes) <= SPEC.splits * SPEC.clusters + 64
