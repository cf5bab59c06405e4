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
        from lantern_spark.types import local_df

        return local_df(
            spark,
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


def _rows_to_cb(rows: list, spec: PQSpec) -> np.ndarray:
    """Densify [(sid, cid, c), ...] into a (splits, k, subdim) array
    (k = max centroid id + 1; every split trains the same k since the
    shrink is sample-size driven)."""
    k = max(cid for _sid, cid, _c in rows) + 1
    cb = np.full((spec.splits, k, spec.subdim), np.inf, dtype=np.float64)
    for sid, cid, c in rows:
        cb[sid, cid] = c
    return cb


def _update_stats(x3, u3, codes, pm, k: int):
    """Sufficient statistics of the closed-form weighted-LS codebook
    update, summed over this batch of rows: per (m, j) the count,
    ``Σ u uᵀ`` (subdim×subdim), ``Σ x_m`` and ``Σ (s_minus + u·x) u``.
    Row-local given (x, codes, cb) — the whole update distributes as
    a partial-sum reduction of these four tensors."""
    splits, subdim = x3.shape[1], x3.shape[2]
    s_n = np.zeros((splits, k))
    s_uu = np.zeros((splits, k, subdim, subdim))
    s_bx = np.zeros((splits, k, subdim))
    s_bu = np.zeros((splits, k, subdim))
    s_tot = pm.sum(axis=1)
    for m in range(splits):
        s_minus = s_tot - pm[:, m]
        um, xm = u3[:, m], x3[:, m]
        w = s_minus + (um * xm).sum(axis=1)
        cm = codes[:, m]
        for j in np.unique(cm):
            sel = cm == j
            uj = um[sel]
            s_n[m, j] = int(sel.sum())
            s_uu[m, j] = uj.T @ uj
            s_bx[m, j] = xm[sel].sum(axis=0)
            s_bu[m, j] = (w[sel, None] * uj).sum(axis=0)
    return s_n, s_uu, s_bx, s_bu


def _solve_update(cb: np.ndarray, stats, eta: float) -> np.ndarray:
    """New codebook from the summed sufficient statistics — the
    closed-form per-(m, j) linear solve, shared verbatim by the local
    and distributed trainers."""
    s_n, s_uu, s_bx, s_bu = stats
    new = cb.copy()
    eye = np.eye(cb.shape[2])
    for m in range(cb.shape[0]):
        for j in range(cb.shape[1]):
            if s_n[m, j] == 0:
                continue
            a = s_n[m, j] * eye + (eta - 1.0) * s_uu[m, j]
            b = s_bx[m, j] + (eta - 1.0) * s_bu[m, j]
            new[m, j] = np.linalg.solve(a, b)
    return new


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
    # plain-PQ init through the SHARED trainer (r9): per-slice lexsort
    # + seed+sid — byte-identical to pq.train_codebook's distributed
    # applyInPandas fit, which is what makes train_apq(distributed=
    # True) ≡ local pinnable. (Previously: _kmeans_fit directly on the
    # full-row-sorted slice — same quality, unsharable order.)
    cb = _rows_to_cb(train_codebook_local(x, spec), spec)
    k = cb.shape[1]  # the trainer may shrink k below spec.clusters
    codes = _plain_codes(x3, cb)
    for _ in range(iters):
        codes, pm = _cd_assign(x3, u3, cb, eta, codes, passes=cd_passes)
        new = _solve_update(
            cb, _update_stats(x3, u3, codes, pm, k), eta
        )
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
    train_limit: Optional[int] = 20000,
    iters: int = 10,
    distributed: bool = False,
) -> APQModel:
    """``distributed=False`` (default): bounded-sample training (the
    reference's dataset_size_limit contract, pq/mod.rs:109-131) — one
    limited collect, then the driver-side alternation, no Spark job
    in the loop.

    ``distributed=True`` (r9, review r8 item 5): the sample never
    collects — init runs the distributed per-subvector k-means
    (``pq.train_codebook``, same seeds/ordering as the local init),
    each alternation is one row-local coordinate-descent assignment
    pass (codes persist as a column between iterations — the SAME
    warm-start chain as the local loop) plus a sufficient-statistics
    reduction (per (m, j): count, Σuuᵀ, Σx, Σwu — a few hundred KB
    regardless of sample size), and the driver solves the
    closed-form update from the summed stats. Same math through the
    SHARED ``_update_stats``/``_solve_update`` kernels; distributed ≡
    local at equal sample is pinned in tests (float-sum-order
    tolerance). ``train_limit=None`` trains on the whole table.

    η = 1 boundary: BOTH paths skip the alternation loop by design —
    at η = 1 the anisotropic loss degenerates to plain reconstruction
    error, so the plain-PQ trainer's fit (``train_codebook``) is taken
    as final, matching what ``quantize`` computes at η = 1.
    ``train_apq_local`` short-circuits identically (see its η = 1
    branch); distributed ≡ local at η = 1 is pinned at 1e-9 in
    ``test_anisotropic.py::test_distributed_eta1_delegates_to_plain``."""
    sample = df.select(column).where(F.col(column).isNotNull())
    if train_limit:
        sample = sample.limit(int(train_limit))
    if not distributed:
        x = np.asarray(
            [r[column] for r in sample.collect()], dtype=np.float64
        )
        return train_apq_local(x, spec, eta=eta, iters=iters)
    return _train_apq_distributed(
        sample, column, spec, eta=eta, iters=iters
    )


def _train_apq_distributed(
    sample: DataFrame,
    column: str,
    spec: PQSpec,
    eta: Optional[float],
    iters: int,
    cd_passes: int = 2,
) -> APQModel:
    from lantern_spark.operators.pq import train_codebook

    if eta is None:
        eta = default_eta(spec.dim)
    rows0 = [
        (r["subvector_id"], r["centroid_id"], r["c"])
        for r in train_codebook(
            sample, column, spec, train_limit=None
        ).collect()
    ]
    cb = _rows_to_cb(rows0, spec)
    k = cb.shape[1]
    splits, subdim = spec.splits, spec.subdim
    eta_f = float(eta)
    passes = int(cd_passes)

    codes_schema = T.StructType(
        [
            T.StructField("__x", T.ArrayType(T.DoubleType())),
            T.StructField("__codes", T.ArrayType(T.IntegerType())),
        ]
    )
    stats_schema = T.StructType(
        [
            T.StructField("s_n", T.ArrayType(T.DoubleType())),
            T.StructField("s_uu", T.ArrayType(T.DoubleType())),
            T.StructField("s_bx", T.ArrayType(T.DoubleType())),
            T.StructField("s_bu", T.ArrayType(T.DoubleType())),
            T.StructField("loss_sum", T.DoubleType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def assign_pass(cb_now, warm: bool):
        cbl = cb_now.copy()

        def fn(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                x = np.asarray(pdf["__x"].tolist(), dtype=np.float64)
                x3, u3 = _directions(x, splits, subdim)
                if warm:
                    codes = np.asarray(
                        pdf["__codes"].tolist(), dtype=np.int64
                    )
                else:
                    codes = _plain_codes(x3, cbl)
                if eta_f != 1.0:
                    codes, _ = _cd_assign(
                        x3, u3, cbl, eta_f, codes, passes=passes
                    )
                yield pd.DataFrame(
                    {
                        "__x": pdf["__x"],
                        "__codes": [c.tolist() for c in codes.astype(int)],
                    }
                )

        return fn

    def stats_pass(cb_now):
        cbl, _finite = _finite_cb(cb_now)

        def fn(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                x = np.asarray(pdf["__x"].tolist(), dtype=np.float64)
                codes = np.asarray(pdf["__codes"].tolist(), dtype=np.int64)
                x3, u3 = _directions(x, splits, subdim)
                # pm is recomputable row-locally from (x, codes, cb)
                pm = np.empty((len(x), splits))
                dec = np.empty_like(x)
                for m in range(splits):
                    cm = cbl[m, codes[:, m]]
                    pm[:, m] = (u3[:, m] * (x3[:, m] - cm)).sum(axis=1)
                    dec[:, m * subdim : (m + 1) * subdim] = cm
                s_n, s_uu, s_bx, s_bu = _update_stats(
                    x3, u3, codes, pm, k
                )
                r = x - dec
                par = pm.sum(axis=1)
                loss = float(
                    ((r * r).sum(axis=1) + (eta_f - 1.0) * par * par).sum()
                )
                yield pd.DataFrame(
                    {
                        "s_n": [s_n.ravel().tolist()],
                        "s_uu": [s_uu.ravel().tolist()],
                        "s_bx": [s_bx.ravel().tolist()],
                        "s_bu": [s_bu.ravel().tolist()],
                        "loss_sum": [loss],
                        "n": [len(x)],
                    }
                )

        return fn

    def reduce_stats(codes_df, cb_now):
        parts = codes_df.mapInPandas(stats_pass(cb_now), stats_schema).collect()
        if not parts:
            raise ValueError("train_apq: no rows to train on")
        s_n = np.zeros((splits, k))
        s_uu = np.zeros((splits, k, subdim, subdim))
        s_bx = np.zeros((splits, k, subdim))
        s_bu = np.zeros((splits, k, subdim))
        loss_sum, n = 0.0, 0
        for r in parts:
            s_n += np.asarray(r["s_n"]).reshape(splits, k)
            s_uu += np.asarray(r["s_uu"]).reshape(splits, k, subdim, subdim)
            s_bx += np.asarray(r["s_bx"]).reshape(splits, k, subdim)
            s_bu += np.asarray(r["s_bu"]).reshape(splits, k, subdim)
            loss_sum += r["loss_sum"]
            n += r["n"]
        return (s_n, s_uu, s_bx, s_bu), loss_sum / max(n, 1)

    base = sample.select(
        F.col(column).alias("__x"),
        F.lit(None).cast(T.ArrayType(T.IntegerType())).alias("__codes"),
    )
    codes_df = base.mapInPandas(assign_pass(cb, warm=False), codes_schema)
    codes_df = codes_df.persist()
    try:
        if eta_f != 1.0:
            for _ in range(max(1, iters)):
                stats, _ = reduce_stats(codes_df, cb)
                new = _solve_update(cb, stats, eta_f)
                done = bool(np.abs(new - cb).max() < 1e-7)
                cb = new
                if done:
                    break
                nxt = codes_df.mapInPandas(
                    assign_pass(cb, warm=True), codes_schema
                ).persist()
                nxt.count()
                codes_df.unpersist()
                codes_df = nxt
            # final assignment under the final codebook for the loss
            nxt = codes_df.mapInPandas(
                assign_pass(cb, warm=True), codes_schema
            ).persist()
            nxt.count()
            codes_df.unpersist()
            codes_df = nxt
        _stats, loss = reduce_stats(codes_df, cb)
    finally:
        codes_df.unpersist()
    rows = []
    for m in range(splits):
        cents = cb[m][np.lexsort(cb[m].T[::-1])]
        for cid, c in enumerate(cents):
            rows.append((m, cid, c.tolist()))
    return APQModel(
        spec=spec, eta=eta_f, codebook_rows=rows, train_loss=loss
    )


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
