"""Embedding-generation pipelines.

Reference: lantern_cli/src/embeddings/ —
- 3-stage async pipeline (producer → embedding worker → db exporter,
  embeddings/mod.rs:616-721) collapses on Spark to ONE
  ``mapInPandas`` pass: the scan is the producer, the Arrow batch
  iterator is the worker loop, the write is the exporter. Model state
  loads once per executor python worker (the iterator closure), the
  analog of the reference's long-lived worker task.
- Runtime registry (embeddings/core/mod.rs:24-147): ``ort`` (local
  ONNX), ``openai``, ``cohere``. Here: the same three names, gated
  behind import-try (the container has no onnxruntime / network) plus
  the deterministic offline ``hash`` runtime used by tests
  (FIXTURES.md F6).
- Per-model batch sizes (embeddings/mod.rs:574-607) → ``batch_size``
  in the runtime spec; Arrow batches are re-chunked to it.
- NULL/empty inputs are skipped, not embedded (mod.rs:203-208):
  output is NULL for those rows.
- Failed-row capture (``ldb_try_cast`` CTE, mod.rs:280-382) →
  ``embed_with_failures`` splits the output into (ok, failed)
  DataFrames via a success flag — no second scan.

Scale notes: map-only (no shuffle); throughput scales with executors ×
batch_size. For 100 TB the pattern is identical — the model rides in
the python worker, vectors land columnar via Arrow.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class RuntimeSpec:
    """An embedding runtime (core/mod.rs registry analog)."""

    name: str
    dim: int
    batch_size: int = 100  # reference default (embeddings/mod.rs:607)
    params: dict = field(default_factory=dict)


# per-model default batch sizes (embeddings/mod.rs:574-607, excerpt)
MODEL_BATCH_SIZES = {
    "BAAI/bge-small-en": 300,
    "BAAI/bge-base-en": 100,
    "BAAI/bge-large-en": 60,
    "clip/ViT-B-32-textual": 2000,
    "clip/ViT-B-32-visual": 50,
    "openai/text-embedding-ada-002": 500,
    "openai/text-embedding-3-small": 500,
    "cohere/embed-english-v3.0": 5000,
}


def hash_embed_batch(texts: List[Optional[str]], dim: int) -> List[Optional[List[float]]]:
    """Deterministic offline embedding: md5-seeded unit-norm vector per
    token, mean-pooled (FIXTURES.md F6's 'seeded hash of tokens').
    Stable across processes/platforms (hashlib, not hash())."""
    out: List[Optional[List[float]]] = []
    for t in texts:
        if t is None or (isinstance(t, str) and t.strip() == ""):
            out.append(None)  # skip semantics, mod.rs:203-208
            continue
        toks = t.lower().split()
        acc = np.zeros(dim, dtype=np.float64)
        for tok in toks:
            h = hashlib.md5(tok.encode("utf-8")).digest()
            seed = int.from_bytes(h[:8], "little")
            rng = np.random.RandomState(seed % (2**32))
            v = rng.standard_normal(dim)
            acc += v / np.linalg.norm(v)
        if toks:
            acc /= len(toks)
        out.append([float(x) for x in acc])
    return out


def md5_embed_batch(texts: List[Optional[str]], dim: int) -> List[Optional[List[float]]]:
    """Deterministic offline embedding, SQL-expressible variant: per
    whitespace token, component i = md5(tok + '#' + i) first 48 bits
    scaled to [-0.5, 0.5); token vectors unit-normalized then
    mean-pooled. Unlike ``hash`` (numpy RandomState gaussians), every
    step is replayable in ANSI SQL — the `md5` runtime is what makes
    the embed→search composition oracle-hash-checkable. The Spark-side
    twin is the pure Catalyst expression ``md5_embed_expr``."""
    out: List[Optional[List[float]]] = []
    for t in texts:
        if t is None or (isinstance(t, str) and t.strip() == ""):
            out.append(None)
            continue
        toks = t.lower().split()
        acc = np.zeros(dim, dtype=np.float64)
        for tok in toks:
            raw = np.array(
                [
                    int.from_bytes(
                        hashlib.md5(f"{tok}#{i}".encode("utf-8")).digest()[:6],
                        "big",
                    )
                    / 2.0**48
                    - 0.5
                    for i in range(dim)
                ]
            )
            acc += raw / np.linalg.norm(raw)
        acc /= len(toks)
        out.append([float(x) for x in acc])
    return out


def md5_embed_expr(col, dim: int):
    """The `md5` runtime as a PURE Catalyst expression — md5 runs
    JVM-side, no Python workers (the 'UDFs are the slow path' rule
    applied to embedding itself). Output matches ``md5_embed_batch``
    to float precision (summation order differs at ~1e-15; downstream
    consumers round to 6 per the repo convention)."""
    from pyspark.sql import Column

    c = col if isinstance(col, Column) else F.col(col)
    toks = F.filter(F.split(F.lower(c), r"\s+"), lambda x: x != "")
    idxs = F.sequence(F.lit(0), F.lit(dim - 1))

    def raw_vec(tok):
        return F.transform(
            idxs,
            lambda i: F.conv(
                F.substring(
                    F.md5(F.concat(tok, F.lit("#"), i.cast("string"))), 1, 12
                ),
                16,
                10,
            ).cast("long").cast("double")
            / F.lit(2.0**48)
            - 0.5,
        )

    def add_tok(acc, tok):
        raw = raw_vec(tok)
        norm = F.sqrt(
            F.aggregate(raw, F.lit(0.0), lambda a, x: a + x * x)
        )
        return F.zip_with(acc, raw, lambda a, x: a + x / norm)

    summed = F.aggregate(
        toks, F.array_repeat(F.lit(0.0), dim), add_tok
    )
    n = F.size(toks)
    return F.when(
        c.isNull() | (F.trim(c) == ""), F.lit(None).cast("array<double>")
    ).otherwise(F.transform(summed, lambda x: x / n))


def _runtime_fn(spec: RuntimeSpec) -> Callable[[List[Optional[str]]], List]:
    """Resolve a runtime name to a batch-embedding function.

    'ort' / 'openai' / 'cohere' require optional deps / network —
    import-gated; 'hash' and 'md5' are the deterministic offline
    runtimes ('md5' additionally being SQL-replayable).
    """
    if spec.name == "hash":
        return lambda texts: hash_embed_batch(texts, spec.dim)
    if spec.name == "md5":
        return lambda texts: md5_embed_batch(texts, spec.dim)
    if spec.name == "ort":
        # Real local-ONNX runtime (ort_runtime.rs analog): session over
        # a model path, hash-bucket tokenize, masked mean/cls pooling,
        # chunked batch inference. The ONLY gate is `import
        # onnxruntime` inside the default session factory; tests inject
        # a duck-typed session via params['session_factory'] and run
        # the identical path.
        from lantern_spark.operators.ort_runtime import (
            MODEL_POOLING,
            OrtConfig,
            OrtEmbeddingRuntime,
        )

        params = dict(spec.params)
        model = params.pop("model", None)
        cfg = OrtConfig(
            model_path=params.pop("model_path", model or ""),
            dim=spec.dim,
            pooling=params.pop(
                "pooling", MODEL_POOLING.get(model or "", "mean")
            ),
            batch_size=spec.batch_size,
            **params,
        )
        return OrtEmbeddingRuntime(cfg).embed
    if spec.name in ("openai", "cohere"):
        # Real HTTP runtimes (openai_runtime.rs / cohere_runtime.rs
        # parity: token-budget batching, linear-backoff retries, Azure
        # detection — operators/http_runtime.py). Credentials arrive
        # via spec.params; absent credentials fail like the reference
        # ("'api_token' is required").
        params = dict(spec.params)
        if not (params.get("api_token") or params.get("azure_entra_token")):
            raise NotImplementedError(
                f"{spec.name} runtime requires an api_token (network "
                "credentials); use the 'hash'/'md5' runtimes offline"
            )
        from lantern_spark.operators.http_runtime import make_http_runtime

        rt = make_http_runtime(spec.name, params)
        return rt.embed
    raise ValueError(f"unknown runtime {spec.name!r}")


def get_available_runtimes() -> List[str]:
    """embeddings.rs:201-229 analog."""
    return ["hash", "md5", "ort", "openai", "cohere"]


def get_available_models() -> Dict[str, int]:
    """Model → default batch size (ort_runtime.rs:283-303 registry)."""
    return dict(MODEL_BATCH_SIZES)


def embed_column(
    df: DataFrame,
    src_col: str,
    dst_col: str,
    runtime: RuntimeSpec,
) -> DataFrame:
    """Batch embedding job: ``create-embeddings`` analog.

    mapInPandas iterator-of-batches: runtime state initializes once per
    python worker, batches re-chunk to runtime.batch_size.
    """
    fields = df.schema.fields
    out_schema = T.StructType(
        list(fields) + [T.StructField(dst_col, T.ArrayType(T.FloatType()))]
    )
    bs = runtime.batch_size
    spec = runtime

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = _runtime_fn(spec)  # once per worker — model-load analog
        for pdf in batches:
            n = len(pdf)
            vecs: List = []
            for i in range(0, n, bs):
                chunk = pdf[src_col].iloc[i : i + bs].tolist()
                vecs.extend(fn(chunk))
            pdf = pdf.copy()
            pdf[dst_col] = vecs
            yield pdf

    return df.mapInPandas(run, out_schema)


def embed_with_failures(
    df: DataFrame,
    src_col: str,
    dst_col: str,
    runtime: RuntimeSpec,
) -> tuple:
    """(ok_df, failed_df): rows whose input couldn't be embedded (NULL /
    empty → NULL output) land in failed_df — the failed-rows CTE
    analog (embeddings/mod.rs:280-382)."""
    out = embed_column(df, src_col, dst_col, runtime)
    ok = out.filter(F.col(dst_col).isNotNull())
    failed = out.filter(F.col(dst_col).isNull()).drop(dst_col)
    return ok, failed


def llm_embedding(col, model: str = "hash-16", dim: int = 16):
    """Scalar embedding Column function (llm_embedding analog,
    lantern_extras/src/embeddings.rs:154-184) using the offline hash
    runtime. Real API runtimes plug in via embed_column."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(s: pd.Series) -> pd.Series:
        return pd.Series(hash_embed_batch(s.tolist(), dim))

    c = col if not isinstance(col, str) else F.col(col)
    return _embed(c)


def text_embedding(model: str, col, dim: int = 16):
    """SQL-surface alias of llm_embedding with the reference's
    (model, text) argument order (embeddings.rs:186-191
    ``lantern.text_embedding``)."""
    return llm_embedding(col, model=model, dim=dim)


def openai_embedding(model: str, col, dim: int = 16):
    """``lantern.openai_embedding`` alias (embeddings.rs:193-196).
    Routes to the offline hash runtime in this container; a real
    OpenAI runtime plugs in via embed_column(RuntimeSpec('openai'))."""
    return llm_embedding(col, model=model, dim=dim)


def cohere_embedding(model: str, col, dim: int = 16):
    """``lantern.cohere_embedding`` alias (embeddings.rs:197-199)."""
    return llm_embedding(col, model=model, dim=dim)


def llm_completion(col, model: str = "echo", system_prompt: str = ""):
    """llm_completion analog (embeddings.rs:129-152). Offline runtime:
    deterministic 'echo' transform (real runtimes need network creds —
    NotImplementedError, import-gated like ort)."""
    if model != "echo":
        raise NotImplementedError(
            "only the offline 'echo' completion runtime is available "
            "in this container"
        )
    c = col if not isinstance(col, str) else F.col(col)
    return F.concat(F.lit(f"[{system_prompt}] " if system_prompt else ""), c)


def measure_model_speed(
    df: DataFrame,
    src_col: str,
    runtime: RuntimeSpec,
    sample_rows: int = 1000,
) -> dict:
    """Throughput probe (measure-model-speed analog,
    embeddings/measure_speed.rs): embed a bounded sample and report
    rows/sec + the effective batch size. Driver-side timing around a
    count() materialization — the sample bound keeps it cheap at any
    table size."""
    import time

    sample = df.select(src_col).where(F.col(src_col).isNotNull()).limit(
        sample_rows
    )
    n = sample.count()
    out = embed_column(sample, src_col, "__emb", runtime)
    t0 = time.time()
    out.select(F.count("__emb")).collect()
    dt = max(time.time() - t0, 1e-9)
    return {
        "model": runtime.name,
        "rows": n,
        "seconds": round(dt, 3),
        "rows_per_sec": round(n / dt, 1),
        "batch_size": runtime.batch_size,
    }
