"""Anisotropic product quantization for inner-product search (ScaNN).

Guo et al., "Accelerating Large-Scale Inference with Anisotropic Vector
Quantization" (ICML 2020, arXiv:1908.10396) — the score-aware
quantization loss behind ScaNN. For MAXIMUM-INNER-PRODUCT retrieval the
quantization residual r = x − x̃ decomposes against the datapoint's own
direction u = x/‖x‖ into a PARALLEL part (⟨u, r⟩ — shifts the score of
exactly the queries that rank x highly) and an ORTHOGONAL part (mostly
averages out across a high-dimensional query distribution). Plain PQ
minimizes ‖r‖² and spends bits on both equally; the anisotropic loss

    L(x, x̃) = η·⟨u, r⟩² + (‖r‖² − ⟨u, r⟩²)
             = ‖r‖² + (η−1)·⟨u, r⟩²,          η ≥ 1

penalizes the score-relevant direction η× harder — same code size,
lower inner-product score error where it matters.

This is the paper's PQ form (§4): the loss couples subspaces through
the FULL-vector direction u (⟨u, r⟩ = Σ_m ⟨u_m, r_m⟩), so code
assignment is COORDINATE DESCENT across subspaces — update subspace
m's code given the other subspaces' parallel contribution s₋ₘ — and
the codebook update is a closed-form weighted least-squares per
centroid: minimizing over c gives

    [n·I + (η−1)·Σ u_m u_mᵀ] · c = Σ x_m + (η−1)·Σ (s₋ₘ + ⟨u_m, x_m⟩)·u_m

— one (subdim × subdim) solve per centroid per iteration. η = 1
degenerates to EXACTLY plain PQ (delegated, pinned in tests — the
falsifiability witness).

Spark shape (100 TB): training is bounded driver-side numpy on a
≤ train_limit sample (the `pq`/`opq` contract — no Spark job in the
loop); ENCODING is a map-only Arrow-batched UDF with the codebook
task-broadcast (the coordinate-descent assignment is row-local —
deterministic under any batching/partitioning); inner-product ADC is
one per-query (splits × clusters) dot-LUT, additive across subspaces —
`dot(q, decode(codes)) = Σ_m lut[m, code_m]` EXACTLY (pinned), the
same bytes-read contract as the existing l2sq/cos ADC.

Extends the reference's PQ surface (pq/mod.rs:73-370 — plain PQ only)
one step past OPQ (operators/opq): OPQ re-balances subspaces for ‖r‖²,
anisotropic re-aims the loss at the retrieval score itself.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lantern_spark.operators.pq import _kmeans_fit, train_codebook_local
from lantern_spark.types import PQSpec

FORMAT_VERSION = 1

__all__ = [
    "APQModel",
    "default_eta",
    "train_apq",
    "train_apq_local",
    "apq_encode",
    "apq_codes_local",
    "pq_ip_score",
    "anisotropic_loss",
]


def default_eta(dim: int, threshold: float = 0.2) -> float:
    """The paper's weight ratio for a score threshold T (§3.2 / the
    ScaNN library's ``anisotropic_quantization_threshold=0.2``
    default): η = (d−1)·T²/(1−T²), floored at 1 (isotropic)."""
    t2 = threshold * threshold
    return max(1.0, (dim - 1) * t2 / (1.0 - t2))


@dataclass
class APQModel:
    """Anisotropically-trained codebook. ``codebook_rows`` uses the
    ``pq.train_codebook`` row layout [(subvector_id, centroid_id, c)],
    so decode / persistence tooling interoperates; ENCODING must go
    through :func:`apq_encode` (assignment is loss-specific — plain
    nearest-L2 would pick worse-scoring codes)."""

    spec: PQSpec
    eta: float
    codebook_rows: list
    train_loss: float

    def codebook_df(self, spark) -> DataFrame:
        return spark.createDataFrame(
            self.codebook_rows,
            "subvector_id int, centroid_id int, c array<double>",
        )

    def codebook_array(self) -> np.ndarray:
        k = max(r[1] for r in self.codebook_rows) + 1
        arr = np.full(
            (self.spec.splits, k, self.spec.subdim), np.inf, dtype=np.float64
        )
        for sid, cid, c in self.codebook_rows:
            arr[sid, cid] = c
        return arr

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "apq.json"), "w") as f:
            json.dump(
                {
                    "format_version": FORMAT_VERSION,
                    "spec": {
                        "dim": self.spec.dim,
                        "splits": self.spec.splits,
                        "clusters": self.spec.clusters,
                        "seed": self.spec.seed,
                    },
                    "eta": self.eta,
                    "codebook": [
                        [sid, cid, list(c)]
                        for sid, cid, c in self.codebook_rows
                    ],
                    "train_loss": self.train_loss,
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "APQModel":
        with open(os.path.join(path, "apq.json")) as f:
            d = json.load(f)
        ver = d.get("format_version")
        if ver != FORMAT_VERSION:
            raise ValueError(
                f"APQ artifact format_version {ver!r} unsupported "
                f"(expected {FORMAT_VERSION})"
            )
        sp = d["spec"]
        return cls(
            spec=PQSpec(
                dim=sp["dim"],
                splits=sp["splits"],
                clusters=sp["clusters"],
                seed=sp["seed"],
            ),
            eta=float(d["eta"]),
            codebook_rows=[
                (int(s), int(c), list(v)) for s, c, v in d["codebook"]
            ],
            train_loss=float(d["train_loss"]),
        )


def _finite_cb(cb: np.ndarray):
    """(zeroed codebook, finite mask) — +inf padding must never win an
    argmin but must not poison the matmuls."""
    finite = np.isfinite(cb).all(axis=2)  # (splits, k)
    return np.where(finite[:, :, None], cb, 0.0), finite


def _directions(x: np.ndarray, splits: int, subdim: int):
    """(x3, u3): the (n, splits, subdim) reshapes of the vectors and of
    the FULL-vector unit directions (zero vectors get u = 0 — no
    direction, the loss degrades to plain L2, the correct limit)."""
    n = x.shape[0]
    xn = np.linalg.norm(x, axis=1)
    u = np.where(xn[:, None] > 0, x / np.where(xn == 0, 1.0, xn)[:, None], 0.0)
    return x.reshape(n, splits, subdim), u.reshape(n, splits, subdim)


def _cd_assign(
    x3: np.ndarray,
    u3: np.ndarray,
    cb: np.ndarray,
    eta: float,
    codes: np.ndarray,
    passes: int = 2,
):
    """Coordinate-descent code assignment under the full-direction
    loss. Row-local and deterministic: fixed subspace order, plain-L2
    warm start expected in ``codes``, round-6 ties → lowest id.
    Returns (codes, pm) where pm[i, m] = ⟨u_m, x_m − c_codes⟩."""
    n, splits, _ = x3.shape
    cbz, finite = _finite_cb(cb)
    rows = np.arange(n)
    # candidate tables per subspace (reused across passes)
    pm = np.empty((n, splits), dtype=np.float64)
    for m in range(splits):
        pm[:, m] = (u3[:, m] * (x3[:, m] - cbz[m, codes[:, m]])).sum(axis=1)
    for _ in range(passes):
        for m in range(splits):
            xm, um = x3[:, m], u3[:, m]
            xc = xm @ cbz[m].T  # (n, k)
            r2 = (
                (xm * xm).sum(axis=1)[:, None]
                + (cbz[m] * cbz[m]).sum(axis=1)[None, :]
                - 2.0 * xc
            )
            p_cand = (um * xm).sum(axis=1)[:, None] - um @ cbz[m].T
            s_minus = pm.sum(axis=1) - pm[:, m]
            loss = r2 + (eta - 1.0) * (s_minus[:, None] + p_cand) ** 2
            loss[:, ~finite[m]] = np.inf
            codes[:, m] = np.round(loss, 6).argmin(axis=1)
            pm[:, m] = p_cand[rows, codes[:, m]]
    return codes, pm


def _plain_codes(x3: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """Nearest-L2 codes per subspace — the warm start (and the η = 1
    assignment)."""
    n, splits, _ = x3.shape
    cbz, finite = _finite_cb(cb)
    codes = np.empty((n, splits), dtype=np.int64)
    for m in range(splits):
        xm = x3[:, m]
        d = (
            (xm * xm).sum(axis=1)[:, None]
            + (cbz[m] * cbz[m]).sum(axis=1)[None, :]
            - 2.0 * (xm @ cbz[m].T)
        )
        d[:, ~finite[m]] = np.inf
        codes[:, m] = np.round(d, 6).argmin(axis=1)
    return codes


def anisotropic_loss(
    x: np.ndarray, decoded: np.ndarray, eta: float
) -> float:
    """Mean full-direction anisotropic loss of a reconstruction — the
    training objective, exposed so tests/benches compare codebooks on
    the SAME footing (plain PQ vs APQ)."""
    x = np.asarray(x, dtype=np.float64)
    d = np.asarray(decoded, dtype=np.float64)
    r = x - d
    xn = np.linalg.norm(x, axis=1)
    u = np.where(xn[:, None] > 0, x / np.where(xn == 0, 1.0, xn)[:, None], 0.0)
    par = (u * r).sum(axis=1)
    r2 = (r * r).sum(axis=1)
    return float((r2 + (eta - 1.0) * par * par).mean())


def train_apq_local(
    x: np.ndarray,
    spec: PQSpec,
    eta: Optional[float] = None,
    iters: int = 10,
    cd_passes: int = 2,
) -> APQModel:
    """Fit from an in-memory sample. Deterministic: full rows lexsort
    before the seeded per-subspace k-means init (η = 1 delegates to
    ``train_codebook_local`` outright), then ``iters`` alternations of
    coordinate-descent assignment and the closed-form weighted
    centroid update; centroid ids stable-sorted in the artifact."""
    x = np.asarray(x, dtype=np.float64)
    if eta is None:
        eta = default_eta(spec.dim)
    if eta == 1.0:
        rows = train_codebook_local(x, spec)
        cb = APQModel(spec, 1.0, rows, 0.0).codebook_array()
        x3, _ = _directions(x, spec.splits, spec.subdim)
        codes = _plain_codes(x3, cb)
        cbz, _ = _finite_cb(cb)
        dec = np.concatenate(
            [cbz[m, codes[:, m]] for m in range(spec.splits)], axis=1
        )
        return APQModel(spec, 1.0, rows, anisotropic_loss(x, dec, 1.0))

    x = x[np.lexsort(x.T[::-1])]
    x3, u3 = _directions(x, spec.splits, spec.subdim)
    k = spec.clusters
    cb = np.stack(
        [
            _kmeans_fit(np.ascontiguousarray(x3[:, m]), k, seed=spec.seed + m)
            for m in range(spec.splits)
        ]
    )
    k = cb.shape[1]  # _kmeans_fit may shrink k below spec.clusters
    codes = _plain_codes(x3, cb)
    n = x.shape[0]
    eye = np.eye(spec.subdim)
    for _ in range(iters):
        codes, pm = _cd_assign(x3, u3, cb, eta, codes, passes=cd_passes)
        new = cb.copy()
        s_tot = pm.sum(axis=1)
        for m in range(spec.splits):
            s_minus = s_tot - pm[:, m]
            um, xm = u3[:, m], x3[:, m]
            ux = (um * xm).sum(axis=1)
            for j in range(k):
                sel = codes[:, m] == j
                nj = int(sel.sum())
                if nj == 0:
                    continue
                uj = um[sel]
                A = nj * eye + (eta - 1.0) * (uj.T @ uj)
                b = xm[sel].sum(axis=0) + (eta - 1.0) * (
                    (s_minus[sel] + ux[sel])[:, None] * uj
                ).sum(axis=0)
                new[m, j] = np.linalg.solve(A, b)
        if np.abs(new - cb).max() < 1e-7:
            cb = new
            break
        cb = new
    # final assignment for the reported loss
    codes, _ = _cd_assign(x3, u3, cb, eta, codes, passes=cd_passes)
    cbz, _ = _finite_cb(cb)
    dec = np.concatenate(
        [cbz[m, codes[:, m]] for m in range(spec.splits)], axis=1
    )
    loss = anisotropic_loss(x, dec, eta)
    # stable centroid ids: sort by vector value per subspace (the
    # train_codebook convention; codes are re-derived at encode time)
    rows = []
    for m in range(spec.splits):
        cents = cb[m][np.lexsort(cb[m].T[::-1])]
        for cid, c in enumerate(cents):
            rows.append((m, cid, c.tolist()))
    return APQModel(
        spec=spec, eta=float(eta), codebook_rows=rows, train_loss=loss
    )


def train_apq(
    df: DataFrame,
    column: str,
    spec: PQSpec,
    eta: Optional[float] = None,
    train_limit: int = 20000,
    iters: int = 10,
) -> APQModel:
    """Bounded-sample training (the reference's dataset_size_limit
    contract, pq/mod.rs:109-131): one limited collect, then the
    driver-side alternation — no Spark job in the loop."""
    sample = (
        df.select(column)
        .where(F.col(column).isNotNull())
        .limit(int(train_limit))
        .collect()
    )
    x = np.asarray([r[column] for r in sample], dtype=np.float64)
    return train_apq_local(x, spec, eta=eta, iters=iters)


def apq_codes_local(
    x: np.ndarray, model: APQModel, cd_passes: int = 2
) -> np.ndarray:
    """Anisotropic code assignment for an in-memory batch — the shared
    kernel behind :func:`apq_encode` (and the bench/test replays):
    plain-L2 warm start, then row-local coordinate descent."""
    x = np.asarray(x, dtype=np.float64)
    x3, u3 = _directions(x, model.spec.splits, model.spec.subdim)
    cb = model.codebook_array()
    codes = _plain_codes(x3, cb)
    if model.eta != 1.0:
        codes, _ = _cd_assign(x3, u3, cb, model.eta, codes, passes=cd_passes)
    return codes


def apq_encode(
    df: DataFrame,
    column: str,
    model: APQModel,
    out_col: Optional[str] = None,
    cd_passes: int = 2,
) -> DataFrame:
    """Append anisotropic codes (array<smallint>) — map-only, one
    Arrow-batched kernel, codebook task-broadcast. The coordinate
    descent is row-local, so output is deterministic under any
    partitioning/batching (pinned)."""
    out_col = out_col or f"{column}_apq"
    spec, eta = model.spec, model.eta
    cb = model.codebook_array()
    passes = int(cd_passes)

    @F.pandas_udf(T.ArrayType(T.ShortType()))
    def _encode(vs: pd.Series) -> pd.Series:
        mask = vs.notna()
        vals = vs[mask]
        if len(vals) == 0:
            return pd.Series([None] * len(vs), index=vs.index, dtype=object)
        x = np.asarray(vals.tolist(), dtype=np.float64)
        x3, u3 = _directions(x, spec.splits, spec.subdim)
        codes = _plain_codes(x3, cb)
        if eta != 1.0:
            codes, _ = _cd_assign(x3, u3, cb, eta, codes, passes=passes)
        codes = codes.astype(np.int16)
        it = iter(codes)
        return pd.Series(
            [next(it).tolist() if m else None for m in mask],
            index=vs.index,
            dtype=object,
        )

    return df.withColumn(out_col, _encode(F.col(column)))


def pq_ip_score(
    df: DataFrame,
    code_col: str,
    query: Sequence[float],
    codebook_rows: list,
    spec: PQSpec,
    out_col: str = "ip_score",
) -> DataFrame:
    """Inner-product ADC: ``dot(q, decode(codes))`` via one per-query
    (splits × clusters) dot-LUT — additive across subspaces, EXACT for
    the reconstruction (pinned against decode+dot in tests). Works for
    any codebook in the shared row layout (plain PQ, OPQ, APQ), so the
    MIPS serving path is codebook-agnostic; rank DESCENDING."""
    k = max(r[1] for r in codebook_rows) + 1
    cb = np.zeros((spec.splits, k, spec.subdim), dtype=np.float64)
    seen = np.zeros((spec.splits, k), dtype=bool)
    for sid, cid, c in codebook_rows:
        cb[sid, cid] = c
        seen[sid, cid] = True
    q = np.asarray(list(query), dtype=np.float64).reshape(
        spec.splits, 1, spec.subdim
    )
    lut = (q * cb).sum(axis=2)  # (splits, k)
    lut = np.where(seen, lut, -np.inf)  # unseen codes never plausible

    @F.pandas_udf(T.DoubleType())
    def _adc(codes: pd.Series) -> pd.Series:
        def one(c):
            if c is None:
                return None
            idx = np.asarray(c, dtype=np.int64)
            return float(lut[np.arange(len(idx)), idx].sum())

        return codes.map(one)

    return df.withColumn(out_col, _adc(F.col(code_col)))
