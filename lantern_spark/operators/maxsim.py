"""Late-interaction (ColBERT-style) MaxSim retrieval.

Khattab & Zaharia 2020 (arXiv:2004.12832): a document is a BAG of
token embeddings and relevance is

    score(Q, D) = Σ_{q ∈ Q} max_{t ∈ D} sim(q, t)

— every query token finds its best-matching document token. This is
the standard quality tier above single-vector ANN (which this repo's
index families serve) and below cross-encoders (which need a model).

Spark-first mapping:

- storage: one row per document with ``array<array<float>>`` token
  vectors — the bag stays WITH the row, so scoring is map-only (no
  per-token explode/shuffle);
- scoring: an Arrow-batched pandas UDF; per document ONE BLAS matmul
  (tokens × dim) @ (dim × |Q|) → column-max → sum. Per-token HOF
  expressions would interpret |Q|·|D| closures per row (the repo's
  measured ~20× penalty — see dedup.embedding_near_pairs);
- top-k: TakeOrderedAndProject (map-side partial top-k, driver merges
  P·k rows);
- scale path: the ColBERT serving shape — candidate generation with a
  cheap single-vector ANN over POOLED doc vectors (mean or max-pool,
  any of this repo's index families), exact MaxSim re-rank on the
  k·oversample candidates only. ``maxsim_search(candidates=...)``
  composes with `IVFIndex`/`HNSWIndex` search output directly.

Engine-portable: scoring is pure arithmetic over stored arrays, so an
ANSI oracle replays it exactly (pytest runs the DuckDB replay —
list_max/list_transform over the same rows).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _prep_queries(query_vecs, metric: str) -> np.ndarray:
    q = np.asarray([list(v) for v in query_vecs], dtype=np.float64)
    if metric == "cos":
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    return q


def maxsim_score(
    vec_col,
    query_vecs: Sequence[Sequence[float]],
    metric: str = "dot",
    round_digits: Optional[int] = None,
) -> Column:
    """Column: Σ_q max_t sim(q, t) against the literal query bag.

    ``metric``: ``"dot"`` (ColBERT's choice — embeddings are trained
    unit-norm) or ``"cos"`` (normalizes both sides here). Documents
    with an empty/NULL bag score NULL (no token to match — orderBy
    must put NULLs last, as :func:`maxsim_search` does).
    """
    if metric not in ("dot", "cos"):
        raise ValueError(f"metric must be 'dot' or 'cos', got {metric!r}")
    q = _prep_queries(query_vecs, metric)
    rd = round_digits
    met = metric

    @F.pandas_udf(T.DoubleType())
    def _score(bags: pd.Series) -> pd.Series:
        out = np.empty(len(bags), dtype=object)
        for i, bag in enumerate(bags):
            if bag is not None:
                # NULL tokens inside a bag score as absent (the repo's
                # NULL-vector convention) instead of crashing the task
                bag = [t for t in bag if t is not None]
            if bag is None or len(bag) == 0:
                out[i] = None
                continue
            dims = {len(t) for t in bag}
            if len(dims) != 1 or dims != {q.shape[1]}:
                raise ValueError(
                    f"maxsim: token dimension mismatch (bag dims {dims}, "
                    f"query dim {q.shape[1]})"
                )
            d = np.asarray([list(t) for t in bag], dtype=np.float64)
            if met == "cos":
                d = d / np.maximum(
                    np.linalg.norm(d, axis=1, keepdims=True), 1e-30
                )
            s = float((d @ q.T).max(axis=0).sum())
            out[i] = round(s, rd) if rd is not None else s
        return pd.Series(out)

    c = vec_col if isinstance(vec_col, Column) else F.col(vec_col)
    return _score(c)


def maxsim_search(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vecs: Sequence[Sequence[float]],
    k: int = 10,
    metric: str = "dot",
    candidates: Optional[DataFrame] = None,
    score_col: str = "score",
    round_digits: Optional[int] = None,
) -> DataFrame:
    """Top-k documents by MaxSim. Brute force over ``df`` by default
    (one map pass + TakeOrdered — correct at any scale, pays a full
    scan); pass ``candidates`` (any DataFrame with ``id_col``, e.g.
    the ids from a pooled-vector ANN search) to re-rank only that set
    — the ColBERT serving shape, where the scan cost collapses to the
    candidate count. Ties break on (score desc, id asc) after
    ``round_digits`` rounding, the repo's oracle convention.

    The candidate join happens BEFORE scoring (review r7c #1: scoring
    first put the Arrow kernel below the join in the physical plan, so
    the "cheap re-rank" still ran one matmul per corpus document)."""
    base = df
    if candidates is not None:
        base = df.join(
            F.broadcast(candidates.select(id_col).distinct()), id_col
        )
    scored = base.select(
        F.col(id_col),
        maxsim_score(
            vec_col, query_vecs, metric=metric, round_digits=round_digits
        ).alias(score_col),
    )
    return scored.orderBy(
        F.col(score_col).desc_nulls_last(), F.col(id_col).asc()
    ).limit(int(k))


def pool_tokens(vec_col, mode: str = "mean") -> Column:
    """Pooled single vector per document bag — the candidate-generation
    representation (index it with IVF/HNSW, re-rank with MaxSim).
    ``mode``: "mean" or "max" (element-wise). Pure expressions —
    map-only, codegen-eligible, no UDF."""
    c = vec_col if isinstance(vec_col, Column) else F.col(vec_col)
    n = F.size(c)
    if mode == "mean":
        summed = F.aggregate(
            c,
            F.transform(F.element_at(c, 1), lambda x: x * F.lit(0.0)),
            lambda acc, t: F.zip_with(acc, t, lambda a, b: a + b),
        )
        return F.when(
            n > 0,
            F.transform(summed, lambda x: x / n.cast("double")),
        )
    if mode == "max":
        return F.when(
            n > 0,
            F.aggregate(
                c,
                F.element_at(c, 1),
                lambda acc, t: F.zip_with(
                    acc, t, lambda a, b: F.greatest(a, b)
                ),
            ),
        )
    raise ValueError(f"mode must be 'mean' or 'max', got {mode!r}")
