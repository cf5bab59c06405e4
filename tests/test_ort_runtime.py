"""Local ONNX runtime tests (ort_runtime.rs analog).

The container ships no onnxruntime and no model files, so these tests
inject a duck-typed fake session (same ``get_inputs()``/``run()``
surface as ``onnxruntime.InferenceSession``) and exercise the REAL
pipeline — tokenize → pad/mask → run → pool → normalize → batch — the
identical code a real session would flow through. The import gate
itself is also pinned.
"""

import hashlib

import numpy as np
import pytest

from lantern_spark.operators.ort_runtime import (
    CLS_ID,
    OrtConfig,
    OrtEmbeddingRuntime,
    SEP_ID,
    cls_pool,
    hash_bucket_tokenize,
    mean_pool,
)

DIM = 8


class _Input:
    def __init__(self, name):
        self.name = name


class FakeSession:
    """Deterministic 'model': hidden[b, t, :] is a seeded function of
    input_ids[b, t]; padding positions get a LARGE constant so any
    pooling that fails to mask them is caught numerically."""

    input_names = ("input_ids", "attention_mask", "token_type_ids")
    calls: list = []

    def __init__(self, model_path):
        self.model_path = model_path

    def get_inputs(self):
        return [_Input(n) for n in self.input_names]

    def run(self, _outputs, feed):
        type(self).calls.append({k: v.copy() for k, v in feed.items()})
        ids = feed["input_ids"]
        n, L = ids.shape
        hidden = np.empty((n, L, DIM), dtype=np.float32)
        for b in range(n):
            for t in range(L):
                tid = int(ids[b, t])
                if feed["attention_mask"][b, t] == 0:
                    hidden[b, t] = 1e6  # poison: must be masked out
                else:
                    rng = np.random.RandomState(tid % (2**32))
                    hidden[b, t] = rng.standard_normal(DIM)
        return [hidden]


def fake_factory(path):
    return FakeSession(path)


def _cfg(**kw):
    kw.setdefault("model_path", "/models/fake.onnx")
    kw.setdefault("dim", DIM)
    kw.setdefault("session_factory", fake_factory)
    return OrtConfig(**kw)


def _expected_hidden(token_ids):
    rows = []
    for tid in token_ids:
        rng = np.random.RandomState(tid % (2**32))
        rows.append(rng.standard_normal(DIM))
    return np.asarray(rows)


class TestTokenizer:
    def test_sentinels_and_determinism(self):
        a = hash_bucket_tokenize(["hello world"], 30522, 128)[0]
        b = hash_bucket_tokenize(["hello world"], 30522, 128)[0]
        assert a == b
        assert a[0] == CLS_ID and a[-1] == SEP_ID
        assert len(a) == 4
        assert all(t >= 1000 for t in a[1:-1])  # clear of specials

    def test_truncation(self):
        toks = hash_bucket_tokenize(["w " * 500], 30522, 16)[0]
        assert len(toks) <= 16
        assert toks[-1] == SEP_ID


class TestPooling:
    def test_mean_pool_masks_padding(self):
        hidden = np.ones((1, 4, 3))
        hidden[0, 2:] = 100.0  # padding positions
        mask = np.array([[1, 1, 0, 0]])
        out = mean_pool(hidden, mask)
        assert np.allclose(out, 1.0)

    def test_cls_pool_takes_first(self):
        hidden = np.arange(24, dtype=float).reshape(1, 4, 6)
        out = cls_pool(hidden, np.ones((1, 4)))
        assert np.allclose(out, hidden[0, 0])


class TestRuntime:
    def test_mean_pooling_end_to_end(self):
        rt = OrtEmbeddingRuntime(_cfg(pooling="mean"))
        [vec] = rt.embed(["alpha beta"])
        toks = hash_bucket_tokenize(["alpha beta"], 30522, 128)[0]
        assert np.allclose(vec, _expected_hidden(toks).mean(axis=0), atol=1e-6)

    def test_cls_pooling_end_to_end(self):
        rt = OrtEmbeddingRuntime(_cfg(pooling="cls"))
        [vec] = rt.embed(["alpha beta gamma"])
        assert np.allclose(vec, _expected_hidden([CLS_ID])[0], atol=1e-6)

    def test_padding_never_leaks_into_mean(self):
        """Batching a short text with a long one pads the short row;
        the poison value at padded positions must not reach the
        pooled vector."""
        rt = OrtEmbeddingRuntime(_cfg(pooling="mean"))
        [short_alone] = rt.embed(["tiny"])
        short_padded, _long = rt.embed(["tiny", "a b c d e f g h i j"])
        assert np.allclose(short_alone, short_padded, atol=1e-6)

    def test_null_and_empty_skip(self):
        rt = OrtEmbeddingRuntime(_cfg())
        out = rt.embed([None, "", "  ", "real text"])
        assert out[0] is None and out[1] is None and out[2] is None
        assert out[3] is not None and len(out[3]) == DIM

    def test_chunking_matches_single_batch(self):
        texts = [f"doc number {i}" for i in range(10)]
        big = OrtEmbeddingRuntime(_cfg(batch_size=64)).embed(texts)
        small = OrtEmbeddingRuntime(_cfg(batch_size=3)).embed(texts)
        for a, b in zip(big, small):
            assert np.allclose(a, b, atol=1e-6)

    def test_normalize(self):
        rt = OrtEmbeddingRuntime(_cfg(normalize=True))
        [vec] = rt.embed(["some text here"])
        assert abs(np.linalg.norm(vec) - 1.0) < 1e-6

    def test_token_type_ids_supplied_when_asked(self):
        FakeSession.calls = []
        OrtEmbeddingRuntime(_cfg()).embed(["x"])
        assert "token_type_ids" in FakeSession.calls[-1]
        assert (FakeSession.calls[-1]["token_type_ids"] == 0).all()

    def test_missing_required_input_raises(self):
        class NoMask(FakeSession):
            input_names = ("input_ids",)

        with pytest.raises(ValueError, match="attention_mask"):
            OrtEmbeddingRuntime(_cfg(session_factory=NoMask))

    def test_bad_pooling_raises(self):
        with pytest.raises(ValueError, match="unknown pooling"):
            OrtEmbeddingRuntime(_cfg(pooling="max"))

    def test_dim_mismatch_raises(self):
        with pytest.raises(ValueError, match="inconsistent with dim"):
            OrtEmbeddingRuntime(_cfg(dim=DIM + 1)).embed(["x"])

    def test_import_gate_when_no_factory(self):
        """Without an injected factory, the ONLY failure mode in this
        container is the onnxruntime import gate."""
        with pytest.raises(NotImplementedError, match="onnxruntime"):
            OrtEmbeddingRuntime(
                OrtConfig(model_path="/m.onnx", dim=DIM)
            ).embed(["x"])


class TestSparkIntegration:
    def test_embed_column_via_ort(self, spark):
        """RuntimeSpec('ort') routes Arrow batches through the ORT
        runtime (model-load-once-per-worker analog)."""
        from lantern_spark.operators.embed import RuntimeSpec, embed_column

        # factory defined INSIDE the test: cloudpickle then ships it by
        # VALUE to executor workers (the test module is not importable
        # there; a module-level function would pickle by reference)
        def _worker_safe_factory(model_path):
            import numpy as _np

            class _In:
                def __init__(self, name):
                    self.name = name

            class _Sess:
                def get_inputs(self):
                    return [_In("input_ids"), _In("attention_mask")]

                def run(self, _outputs, feed):
                    ids = feed["input_ids"]
                    n, L = ids.shape
                    hidden = _np.empty((n, L, 8), dtype=_np.float32)
                    for b in range(n):
                        for t in range(L):
                            if feed["attention_mask"][b, t] == 0:
                                hidden[b, t] = 1e6
                            else:
                                rng = _np.random.RandomState(
                                    int(ids[b, t]) % (2**32)
                                )
                                hidden[b, t] = rng.standard_normal(8)
                    return [hidden]

            return _Sess()

        df = spark.createDataFrame(
            [(1, "alpha beta"), (2, None), (3, "gamma")],
            "id long, body string",
        )
        out = embed_column(
            df, "body", "emb",
            RuntimeSpec(
                "ort", dim=DIM, batch_size=2,
                params={
                    "model_path": "/models/fake.onnx",
                    "session_factory": _worker_safe_factory,
                    "pooling": "mean",
                },
            ),
        ).collect()
        by_id = {r["id"]: r["emb"] for r in out}
        assert by_id[2] is None
        toks = hash_bucket_tokenize(["alpha beta"], 30522, 128)[0]
        assert np.allclose(
            by_id[1], _expected_hidden(toks).mean(axis=0), atol=1e-5
        )

    def test_model_name_selects_pooling(self):
        """The registry's per-model pooling strategy resolves from the
        model name (ort_runtime.rs:283-316)."""
        from lantern_spark.operators.embed import RuntimeSpec, _runtime_fn

        fn = _runtime_fn(
            RuntimeSpec(
                "ort", dim=DIM,
                params={
                    "model": "BAAI/bge-small-en",
                    "model_path": "/models/bge.onnx",
                    "session_factory": fake_factory,
                },
            )
        )
        [vec] = fn(["alpha"])
        # bge-small-en → cls pooling
        assert np.allclose(vec, _expected_hidden([CLS_ID])[0], atol=1e-6)
