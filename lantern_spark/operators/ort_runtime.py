"""Local ONNX embedding runtime (the reference's workhorse runtime).

Reference: lantern_cli/src/embeddings/core/ort_runtime.rs —
- model registry with per-model pooling strategies (:283-316),
- session over a local model path, batch inference,
- transformer-style inputs (input_ids, attention_mask, optional
  token_type_ids) discovered from the session's input signature,
- mean pooling masks padding before averaging; cls pooling takes the
  first token's hidden state,
- optional L2 normalization of the pooled vector.

Spark-first shape: the runtime object is created once per python
worker inside ``embed_column``'s mapInPandas closure (the long-lived
worker-task analog) and sees Arrow-sized batches re-chunked to
``batch_size``.

The ONLY gated step is ``import onnxruntime`` (and the model file
itself — this container ships neither). Everything else — tokenize,
input assembly, pooling, normalization, batching — is real numpy and
is exercised in pytest against a duck-typed fake session
(``get_inputs()`` / ``run()``), so a container WITH onnxruntime runs a
real ``InferenceSession`` through the identical code path.

Tokenizer note: the reference pairs each ONNX model with its HF
tokenizer file (ort_runtime.rs model registry). No tokenizer assets
exist offline, so this runtime uses a deterministic hash-bucket
tokenizer (md5(token) mod vocab_size, [CLS]/[SEP] sentinels, pad/
truncate to max_seq_len) — the SAME interface, honestly documented as
a stand-in: swap ``tokenize_fn`` for a real tokenizer when model
assets are present.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import numpy as np

# sentinel ids mirror BERT-family specials
CLS_ID = 101
SEP_ID = 102
PAD_ID = 0


@dataclass
class OrtConfig:
    model_path: str
    dim: int
    pooling: str = "mean"  # "mean" | "cls" (ort_runtime.rs:283-316)
    normalize: bool = False
    max_seq_len: int = 128
    vocab_size: int = 30522
    batch_size: int = 32
    # test/offline seam: anything with .get_inputs()/.run(); defaults
    # to a real onnxruntime.InferenceSession (the only gated import)
    session_factory: Optional[Callable] = None
    # swap in a real tokenizer (texts -> list[list[int]]) when model
    # assets are available
    tokenize_fn: Optional[Callable] = None
    extra: dict = field(default_factory=dict)


def _default_session_factory(model_path: str):
    try:
        import onnxruntime as ort
    except ImportError as e:  # the gate — everything else is real
        raise NotImplementedError(
            "ort runtime requires onnxruntime (not in this container); "
            "use the 'hash'/'md5' runtimes offline, or inject "
            "session_factory for testing"
        ) from e
    return ort.InferenceSession(model_path, providers=["CPUExecutionProvider"])


def hash_bucket_tokenize(
    texts: List[str], vocab_size: int, max_seq_len: int
) -> List[List[int]]:
    """[CLS] tok… [SEP], ids = md5(token) mod (vocab_size − 1000) +
    1000 (keeping the sentinel/special range clear), truncated to
    max_seq_len."""
    out = []
    body = max(vocab_size - 1000, 1)
    for t in texts:
        ids = [CLS_ID]
        for tok in str(t).lower().split():
            d = hashlib.md5(tok.encode("utf-8")).digest()
            ids.append(int.from_bytes(d[:4], "little") % body + 1000)
            if len(ids) >= max_seq_len - 1:
                break
        ids.append(SEP_ID)
        out.append(ids)
    return out


def mean_pool(hidden: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Masked mean over the sequence axis (ort_runtime.rs mean
    pooling): padding positions contribute nothing."""
    m = mask[:, :, None].astype(hidden.dtype)
    summed = (hidden * m).sum(axis=1)
    counts = np.maximum(m.sum(axis=1), 1e-9)
    return summed / counts


def cls_pool(hidden: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """First-token hidden state (the [CLS] strategy)."""
    return hidden[:, 0, :]


_POOLERS = {"mean": mean_pool, "cls": cls_pool}


class OrtEmbeddingRuntime:
    """Batch embedding over a (real or injected) ONNX session."""

    def __init__(self, cfg: OrtConfig):
        if cfg.pooling not in _POOLERS:
            raise ValueError(
                f"unknown pooling {cfg.pooling!r}; expected one of "
                f"{sorted(_POOLERS)}"
            )
        self.cfg = cfg
        factory = cfg.session_factory or _default_session_factory
        self.session = factory(cfg.model_path)
        self._input_names = [i.name for i in self.session.get_inputs()]
        for required in ("input_ids", "attention_mask"):
            if required not in self._input_names:
                raise ValueError(
                    f"model at {cfg.model_path} lacks required input "
                    f"{required!r} (has {self._input_names})"
                )

    # -- input assembly --------------------------------------------------

    def _assemble(self, token_ids: List[List[int]]):
        """Pad to the batch max length; build attention mask (and
        token_type_ids when the model asks for them)."""
        n = len(token_ids)
        L = max(len(t) for t in token_ids)
        ids = np.full((n, L), PAD_ID, dtype=np.int64)
        mask = np.zeros((n, L), dtype=np.int64)
        for r, toks in enumerate(token_ids):
            ids[r, : len(toks)] = toks
            mask[r, : len(toks)] = 1
        feed = {"input_ids": ids, "attention_mask": mask}
        if "token_type_ids" in self._input_names:
            feed["token_type_ids"] = np.zeros((n, L), dtype=np.int64)
        return feed, mask

    # -- inference -------------------------------------------------------

    def _run_batch(self, texts: List[str]) -> np.ndarray:
        cfg = self.cfg
        tokenize = cfg.tokenize_fn or (
            lambda ts: hash_bucket_tokenize(ts, cfg.vocab_size, cfg.max_seq_len)
        )
        feed, mask = self._assemble(tokenize(texts))
        # first output is the last_hidden_state (batch, seq, dim)
        hidden = self.session.run(None, feed)[0]
        hidden = np.asarray(hidden, dtype=np.float64)
        if hidden.ndim != 3 or hidden.shape[2] != cfg.dim:
            raise ValueError(
                f"model output shape {hidden.shape} inconsistent with "
                f"dim={cfg.dim}"
            )
        pooled = _POOLERS[cfg.pooling](hidden, mask)
        if cfg.normalize:
            pooled = pooled / np.maximum(
                np.linalg.norm(pooled, axis=1, keepdims=True), 1e-30
            )
        return pooled

    def embed(self, texts: List[Optional[str]]) -> List[Optional[List[float]]]:
        """NULL/empty skip (mod.rs:203-208); the rest run through the
        session in batch_size chunks; order restored by position."""
        out: List[Optional[List[float]]] = [None] * len(texts)
        live = [
            i
            for i, t in enumerate(texts)
            if t is not None and str(t).strip() != ""
        ]
        bs = self.cfg.batch_size
        for s in range(0, len(live), bs):
            chunk = live[s : s + bs]
            pooled = self._run_batch([str(texts[i]) for i in chunk])
            for i, vec in zip(chunk, pooled):
                out[i] = [float(x) for x in vec]
        return out


# per-model pooling strategies (ort_runtime.rs:283-316 registry excerpt)
MODEL_POOLING = {
    "BAAI/bge-small-en": "cls",
    "BAAI/bge-base-en": "cls",
    "BAAI/bge-large-en": "cls",
    "microsoft/all-MiniLM-L12-v2": "mean",
    "microsoft/all-mpnet-base-v2": "mean",
    "intfloat/e5-base-v2": "mean",
    "clip/ViT-B-32-textual": "mean",
}
