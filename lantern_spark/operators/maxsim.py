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
- DEFAULT cheap tier (r9): PLAID (arXiv:2205.09707) — tokens quantize
  once to IVF centroids (+ m-byte PQ residual codes), candidates are
  scored by approximate MaxSim over the compressed codes alone
  (:func:`plaid_doc_codes` / :func:`plaid_candidates` for the
  centroid-only proxy, :func:`plaid_encode` / :func:`plaid_refine`
  for the residual-ADC stage that resolves within-cell ties), exact
  re-rank on the shortlist (:func:`plaid_maxsim_search`). Mean
  pooling remains available but is a measured dead tier on
  token-peaked corpora (bench: pooled recall 0.1 vs PLAID 1.0 at a
  10% candidate budget).

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


# ----------------------------------------------------------------------
# PLAID centroid-interaction candidate tier (Santhanam et al. 2022,
# arXiv:2205.09707)
# ----------------------------------------------------------------------

def _centroid_matrix(centroids, metric: str) -> np.ndarray:
    """Accept a raw (nlist × dim) array-like or an IVFIndex (its
    trained coarse centroids ARE the PLAID codebook — one artifact
    serves both the single-vector and the late-interaction tier)."""
    m = getattr(getattr(centroids, "manifest", None), "centroids", None)
    c = np.asarray(m if m is not None else centroids, dtype=np.float64)
    if c.ndim != 2:
        raise ValueError(
            f"centroids must be a (nlist, dim) matrix, got shape {c.shape}"
        )
    if metric == "cos":
        c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-30)
    return c


def plaid_doc_codes(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids,
    metric: str = "dot",
    codes_col: str = "codes",
) -> DataFrame:
    """(id, codes): the DISTINCT centroid ids of each document's
    tokens — PLAID's compressed document representation (Santhanam et
    al. 2022 §3.2: every token is quantized to its nearest IVF
    centroid; the candidate stage never touches token vectors again).
    Map-only: one Arrow-batched matmul+argmax per bag; output is a few
    int32 per doc, ~1000× smaller than the bag. Persist it next to
    the token index and reuse across queries. NULL/empty bags get
    empty code sets (they can never be candidates — consistent with
    maxsim_score's NULL)."""
    if metric not in ("dot", "cos"):
        raise ValueError(f"metric must be 'dot' or 'cos', got {metric!r}")
    c = _centroid_matrix(centroids, metric)
    met = metric

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _codes(bags: pd.Series) -> pd.Series:
        out = np.empty(len(bags), dtype=object)
        for i, bag in enumerate(bags):
            if bag is not None:
                bag = [t for t in bag if t is not None]
            if bag is None or len(bag) == 0:
                out[i] = []
                continue
            d = np.asarray([list(t) for t in bag], dtype=np.float64)
            if d.shape[1] != c.shape[1]:
                raise ValueError(
                    f"plaid: token dim {d.shape[1]} != centroid dim "
                    f"{c.shape[1]}"
                )
            if met == "cos":
                d = d / np.maximum(
                    np.linalg.norm(d, axis=1, keepdims=True), 1e-30
                )
            # nearest centroid by the SCORING similarity (dot) — the
            # same geometry the candidate stage scores with
            out[i] = np.unique((d @ c.T).argmax(axis=1)).astype(
                np.int32
            ).tolist()
        return pd.Series(out)

    return df.select(F.col(id_col), _codes(F.col(vec_col)).alias(codes_col))


def plaid_candidates(
    codes_df: DataFrame,
    id_col: str,
    query_vecs: Sequence[Sequence[float]],
    centroids,
    n_candidates: int = 100,
    metric: str = "dot",
    codes_col: str = "codes",
    score_col: str = "plaid_score",
) -> DataFrame:
    """Top-``n_candidates`` docs by CENTROID MaxSim — PLAID's stage-1
    proxy: ``score(Q, D) ≈ Σ_q max_{c ∈ codes(D)} sim(q, c)``. The
    query×centroid similarity matrix (|Q| × nlist, tiny) is computed
    ONCE driver-side and closed over; per doc the kernel is one numpy
    gather + max — no token data, no shuffle, TakeOrdered top-N.
    Upper-bound intuition (the paper's): a doc whose best tokens sit
    in high-scoring cells scores high; mean-pooling (the tier this
    replaces as default) averages those peaks away, which is exactly
    why its recall collapses on token-peaked corpora."""
    if metric not in ("dot", "cos"):
        raise ValueError(f"metric must be 'dot' or 'cos', got {metric!r}")
    c = _centroid_matrix(centroids, metric)
    q = _prep_queries(query_vecs, metric)
    if q.shape[1] != c.shape[1]:
        raise ValueError(
            f"plaid: query dim {q.shape[1]} != centroid dim {c.shape[1]}"
        )
    s = c @ q.T  # (nlist, |Q|) — the only geometry stage 1 needs

    @F.pandas_udf(T.DoubleType())
    def _proxy(codes: pd.Series) -> pd.Series:
        out = np.empty(len(codes), dtype=object)
        for i, cd in enumerate(codes):
            if cd is None or len(cd) == 0:
                out[i] = None
                continue
            out[i] = float(s[np.asarray(cd, dtype=np.int64)].max(axis=0).sum())
        return pd.Series(out)

    scored = codes_df.select(
        F.col(id_col), _proxy(F.col(codes_col)).alias(score_col)
    )
    return scored.orderBy(
        F.col(score_col).desc_nulls_last(), F.col(id_col).asc()
    ).limit(int(n_candidates))


def plaid_maxsim_search(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vecs: Sequence[Sequence[float]],
    centroids,
    k: int = 10,
    n_candidates: int = 100,
    metric: str = "dot",
    codes_df: Optional[DataFrame] = None,
    round_digits: Optional[int] = None,
) -> DataFrame:
    """Two-stage PLAID serving: centroid-MaxSim candidates
    (:func:`plaid_candidates`) → exact MaxSim re-rank
    (:func:`maxsim_search`). ``codes_df`` reuses persisted doc codes
    (the operating shape — codes are computed once per corpus, not
    per query); omitted, they are derived inline. The exact stage
    touches only ``n_candidates`` bags, so the full-scan token matmul
    of brute-force MaxSim collapses to O(candidates) while stage 1
    reads a few bytes per doc."""
    if codes_df is None:
        codes_df = plaid_doc_codes(
            df, vec_col, id_col, centroids, metric=metric
        )
    cand = plaid_candidates(
        codes_df, id_col, query_vecs, centroids,
        n_candidates=n_candidates, metric=metric,
    )
    return maxsim_search(
        df, vec_col, id_col, query_vecs, k=k, metric=metric,
        candidates=cand, round_digits=round_digits,
    )


def _train_plaid_residuals_distributed(
    df: DataFrame, vec_col: str, c: np.ndarray, spec, met: str,
    train_limit: Optional[int],
):
    """Codebook rows for the PLAID residual PQ with the sample kept
    cluster-side: explode tokens, compute residuals against the
    broadcast centroid matrix in one Arrow pass (float64, the exact
    local-path math), and hand the residual column to
    ``pq.train_codebook`` — whose per-subvector applyInPandas k-means
    is the r9-pinned distributed ≡ local trainer. Driver traffic is
    the m·clusters codebook rows, never tokens."""
    from lantern_spark.operators.pq import train_codebook

    toks = df.select(F.explode(F.col(vec_col)).alias("__tok")).where(
        F.col("__tok").isNotNull()
    )
    if train_limit:
        toks = toks.limit(int(train_limit))
    cl = c.copy()

    def resid_fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(pdf["__tok"].tolist(), dtype=np.float64)
            if met == "cos":
                x = x / np.maximum(
                    np.linalg.norm(x, axis=1, keepdims=True), 1e-30
                )
            r = x - cl[(x @ cl.T).argmax(axis=1)]
            yield pd.DataFrame({"__resid": [row.tolist() for row in r]})

    resid_df = toks.mapInPandas(resid_fn, "__resid array<double>")
    rows = [
        (r["subvector_id"], r["centroid_id"], r["c"])
        for r in train_codebook(
            resid_df, "__resid", spec, train_limit=None
        ).collect()
    ]
    if not rows:
        raise ValueError("plaid_encode: no tokens to train on")
    return rows


def plaid_encode(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids,
    metric: str = "dot",
    m: int = 8,
    clusters: int = 256,
    train_limit: Optional[int] = 20000,
    seed: int = 42,
    distributed: bool = False,
):
    """PLAID's compressed document representation (arXiv:2205.09707
    §3.1): per token, its nearest-centroid id PLUS an ``m``-byte PQ
    code of the RESIDUAL (token − centroid). Returns ``(encoded_df,
    residual_codebook)`` where ``encoded_df`` is
    ``(id, tok_codes array<int>, tok_pq array<array<smallint>>)`` —
    ~(4 + m) bytes per token instead of 4·dim — and the codebook is a
    ``(m, clusters, dim/m)`` numpy array.

    ``distributed=False`` (default): training collects a bounded
    token sample to the driver (``train_limit`` tokens — the
    reference's ``dataset_size_limit`` contract, pq/mod.rs:109-131)
    and reuses the repo's deterministic PQ trainer.

    ``distributed=True`` (r10, review r9 item 6 — the one quantizer
    trainer that didn't get the r9 treatment): the token sample never
    collects — residuals compute cluster-side in one Arrow pass
    (same float64 nearest-centroid math as the local path) and feed
    ``pq.train_codebook``'s per-subvector applyInPandas fan-out; only
    the m·clusters codebook rows reach the driver. Distributed ≡
    local at equal sample is pinned in tests (the
    ``TestDistributedOPQ`` pattern). ``train_limit=None`` trains on
    every token. Encoding is one map-only Arrow pass either way."""
    from lantern_spark.operators.pq import train_codebook_local
    from lantern_spark.types import PQSpec

    if metric not in ("dot", "cos"):
        raise ValueError(f"metric must be 'dot' or 'cos', got {metric!r}")
    c = _centroid_matrix(centroids, metric)
    dim = c.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    spec = PQSpec(dim=dim, splits=m, clusters=clusters, seed=seed)
    met = metric

    if distributed:
        rows = _train_plaid_residuals_distributed(
            df, vec_col, c, spec, met, train_limit
        )
    else:
        sample_q = df.select(F.explode(F.col(vec_col)))
        if train_limit:
            sample_q = sample_q.limit(int(train_limit))
        sample = [
            np.asarray(r[0], dtype=np.float64)
            for r in sample_q.collect()
            if r[0] is not None
        ]
        if not sample:
            raise ValueError("plaid_encode: no tokens to train on")
        x = np.asarray(sample)
        if met == "cos":
            x = x / np.maximum(
                np.linalg.norm(x, axis=1, keepdims=True), 1e-30
            )
        resid = x - c[(x @ c.T).argmax(axis=1)]
        rows = train_codebook_local(resid, spec)
    cb = np.full((m, clusters, dim // m), np.inf, dtype=np.float64)
    for sid, cid, cv in rows:
        cb[sid, cid] = cv

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("tok_codes", T.ArrayType(T.IntegerType())),
            T.StructField(
                "tok_pq", T.ArrayType(T.ArrayType(T.ShortType()))
            ),
        ]
    )

    def enc(batches):
        for pdf in batches:
            codes_out, pq_out = [], []
            for bag in pdf[vec_col]:
                if bag is not None:
                    bag = [t for t in bag if t is not None]
                if bag is None or len(bag) == 0:
                    codes_out.append([])
                    pq_out.append([])
                    continue
                d = np.asarray([list(t) for t in bag], dtype=np.float64)
                if met == "cos":
                    d = d / np.maximum(
                        np.linalg.norm(d, axis=1, keepdims=True), 1e-30
                    )
                code = (d @ c.T).argmax(axis=1)
                r = (d - c[code]).reshape(len(d), m, dim // m)
                # one matmul per split against the codebook, argmin L2
                pq_codes = np.empty((len(d), m), dtype=np.int16)
                for s in range(m):
                    sub = r[:, s, :]
                    d2 = (
                        (sub * sub).sum(axis=1)[:, None]
                        - 2.0 * sub @ cb[s].T
                        + (cb[s] * cb[s]).sum(axis=1)[None, :]
                    )
                    pq_codes[:, s] = d2.argmin(axis=1)
                codes_out.append(code.astype(np.int32).tolist())
                pq_out.append([row.tolist() for row in pq_codes])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tok_codes": codes_out,
                    "tok_pq": pq_out,
                }
            )

    return (
        df.select(id_col, vec_col).mapInPandas(enc, out_schema),
        cb,
    )


def plaid_refine(
    encoded_df: DataFrame,
    id_col: str,
    query_vecs: Sequence[Sequence[float]],
    centroids,
    residual_codebook: np.ndarray,
    n_candidates: int = 100,
    metric: str = "dot",
    score_col: str = "adc_score",
) -> DataFrame:
    """PLAID stage 2: approximate MaxSim over the COMPRESSED tokens —
    ``sim(q, t) ≈ q·c_code(t) + Σ_s LUT_q[s, pq_s(t)]`` where the LUT
    is the query-subvector × residual-codebook dot table, built ONCE
    per query driver-side. Resolves the within-cell ties the
    centroid-only proxy cannot (same-cell docs differ only by
    residuals), still without reading a single raw token vector.
    Top-``n_candidates`` by TakeOrdered."""
    if metric not in ("dot", "cos"):
        raise ValueError(f"metric must be 'dot' or 'cos', got {metric!r}")
    c = _centroid_matrix(centroids, metric)
    q = _prep_queries(query_vecs, metric)
    if q.shape[1] != c.shape[1]:
        raise ValueError(
            f"plaid: query dim {q.shape[1]} != centroid dim {c.shape[1]}"
        )
    cb = np.asarray(residual_codebook, dtype=np.float64)
    m, n_clusters, subdim = cb.shape
    s_cent = c @ q.T  # (nlist, |Q|)
    # LUT[qi, s, code] = q_sub(s) · cb[s, code]
    cb_f = np.where(np.isfinite(cb), cb, 0.0)
    lut = np.einsum("qsd,scd->qsc", q.reshape(q.shape[0], m, subdim), cb_f)

    @F.pandas_udf(T.DoubleType())
    def _adc(codes: pd.Series, pqs: pd.Series) -> pd.Series:
        out = np.empty(len(codes), dtype=object)
        for i, (cd, pq_) in enumerate(zip(codes, pqs)):
            if cd is None or len(cd) == 0:
                out[i] = None
                continue
            cd = np.asarray(cd, dtype=np.int64)
            pq_ = np.asarray([list(p) for p in pq_], dtype=np.int64)
            total = 0.0
            for qi in range(lut.shape[0]):
                approx = s_cent[cd, qi] + lut[
                    qi, np.arange(m)[None, :], pq_
                ].sum(axis=1)
                total += float(approx.max())
            out[i] = total
        return pd.Series(out)

    scored = encoded_df.select(
        F.col(id_col),
        _adc(F.col("tok_codes"), F.col("tok_pq")).alias(score_col),
    )
    return scored.orderBy(
        F.col(score_col).desc_nulls_last(), F.col(id_col).asc()
    ).limit(int(n_candidates))
