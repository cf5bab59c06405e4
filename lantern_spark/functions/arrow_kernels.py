"""Arrow-batched numpy distance kernels — the wide-vector fast path.

Spark's higher-order functions (``aggregate``/``zip_with``) are
CodegenFallback: they evaluate interpreted, per element, per row. For
a 64-dim scan that is ~200 closure evaluations per row; a vectorized
numpy kernel over an Arrow batch does the same work as one BLAS-backed
matrix op (measured ~2.6× faster at 600k×64, gap grows with dim).

Tradeoff, and why these are OPT-IN (``impl="arrow"``) rather than the
default:
- the expression path is pure Catalyst — SQL-expressible, oracle-
  hashable, no Python workers on the executors, and eligible for
  future pushdown rules;
- the Arrow path pays one serialization boundary but vectorizes the
  arithmetic; summation order differs (pairwise vs left fold), so
  values can differ at ~1e-15 — identical after round(·, 6).

Reference: the same tiering exists in Lantern — usearch's SIMD kernels
vs the scalar ``array_dist`` fallback (hnsw.c:296-331).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _col(c) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def arrow_l2sq_dist(col, query: Sequence[float]) -> Column:
    """Squared L2 to a fixed query vector (l2sq_dist fast path)."""
    q = np.asarray(list(query), dtype=np.float64)

    @F.pandas_udf(T.DoubleType())
    def _k(vs: pd.Series) -> pd.Series:
        mask = vs.notna()
        out = np.full(len(vs), np.nan)
        if mask.any():
            x = np.asarray(vs[mask].tolist(), dtype=np.float64)
            if x.shape[1] != q.size:
                raise ValueError(
                    f"l2sq_dist: dimension mismatch ({x.shape[1]} vs {q.size})"
                )
            d = x - q
            out[np.flatnonzero(mask.to_numpy())] = (d * d).sum(axis=1)
        return pd.Series(out).where(pd.Series(mask.to_numpy()), None)

    return _k(_col(col))


def arrow_cos_dist(col, query: Sequence[float]) -> Column:
    """1 − cosine similarity to a fixed query vector."""
    q = np.asarray(list(query), dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-30)

    @F.pandas_udf(T.DoubleType())
    def _k(vs: pd.Series) -> pd.Series:
        mask = vs.notna()
        out = np.full(len(vs), np.nan)
        if mask.any():
            x = np.asarray(vs[mask].tolist(), dtype=np.float64)
            if x.shape[1] != q.size:
                raise ValueError(
                    f"cos_dist: dimension mismatch ({x.shape[1]} vs {q.size})"
                )
            norms = np.linalg.norm(x, axis=1, keepdims=True)
            xn = x / np.maximum(norms, 1e-30)
            d = 1.0 - xn @ qn
            # zero-norm vectors have undefined cosine → NULL, matching
            # the expression path's try_divide (ADVICE r1)
            d[norms[:, 0] == 0.0] = np.nan
            out[np.flatnonzero(mask.to_numpy())] = d
        valid = pd.Series(mask.to_numpy() & ~np.isnan(out))
        return pd.Series(out).where(valid, None)

    return _k(_col(col))


def arrow_distance(col, query: Sequence[float], metric: str = "l2sq") -> Column:
    from lantern_spark.types import Metric

    m = Metric.resolve(metric)
    if m is Metric.L2SQ:
        return arrow_l2sq_dist(col, query)
    if m is Metric.COS:
        return arrow_cos_dist(col, query)
    raise ValueError(f"arrow kernel not implemented for metric {m}")
