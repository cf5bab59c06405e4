"""Product quantization + scalar quantization.

Reference:
- PQ codebook training: _lantern_internal.create_pq_codebook —
  per-subvector k-means, ≤256 clusters, 200 iters, convergence 0.1
  (lantern_hnsw/src/hnsw/product_quantization.c:173-240,
  pqtable.c:41-192); the CLI distributed variant fans out one job per
  subvector (lantern_cli/src/pq/mod.rs:73-370).
- Encode: quantize_vector — per-subvector nearest centroid
  (lantern.sql:256-307); decode: dequantize_vector (lantern.sql:310-339).
- Codebook storage: table (subvector_id, centroid_id, c REAL[])
  (lantern.sql:229-249).
- Scalar quantization: quant_bits ∈ {1,8,…} element casts
  (options.c:36-46,137-158).

Spark-first design:
- Training subsumes the reference's 3-phase GCP-Batch orchestration in
  ONE Spark job: slice vectors into subvectors (posexplode), group by
  subvector_id (= the per-subvector fan-out), run a deterministic
  seeded k-means per group in applyInPandas. The codebook is tiny
  (≤ splits×256×subdim floats) and is BROADCAST for encode/decode —
  never shuffled with the data.
- Encode/decode are Arrow-batched pandas UDFs doing one vectorized
  numpy argmin per batch — the per-row SQL loop of quantize_vector
  becomes a (batch × clusters) matrix op.
- Determinism: k-means++ init with a fixed seed + deterministic tie
  breaks, so codebooks are reproducible run-to-run (the reference's
  random init is nondeterministic; SURVEY §7 notes tests must assert
  reconstruction error, not exact centroids — we do both since ours IS
  deterministic).

Scale notes (100 TB): training samples ``train_limit`` rows
(reference: dataset_size_limit) — a bounded-size job regardless of
table size; encode is a map-only pass (no shuffle); ADC scoring
builds one (splits × clusters) lookup table per query and scores codes
with a gather-sum, all inside one mapInPandas pass.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lantern_spark.types import Metric, PQSpec


# ----------------------------------------------------------------------
# deterministic k-means (numpy, seeded, used per subvector group)
# ----------------------------------------------------------------------

def _kmeans_fit(
    x: np.ndarray, k: int, seed: int, iters: int = 200, tol: float = 1e-4
) -> np.ndarray:
    """Seeded k-means++ → Lloyd iterations. Deterministic for fixed input
    order. Mirrors the reference's 200-iteration cap
    (product_quantization.c:173-193) with a tighter tolerance."""
    n = x.shape[0]
    k = min(k, n)
    rng = np.random.RandomState(seed)
    # k-means++ init
    centroids = np.empty((k, x.shape[1]), dtype=np.float64)
    idx0 = int(rng.randint(n))
    centroids[0] = x[idx0]
    d2 = ((x - centroids[0]) ** 2).sum(axis=1)
    for j in range(1, k):
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
        idx = int(rng.choice(n, p=probs))
        centroids[j] = x[idx]
        d2 = np.minimum(d2, ((x - centroids[j]) ** 2).sum(axis=1))
    x2 = (x * x).sum(axis=1)
    for _ in range(iters):
        # ‖x−c‖² = ‖x‖² + ‖c‖² − 2·x·c — one BLAS matmul instead of an
        # (n, k, dim) broadcast intermediate
        c2 = (centroids * centroids).sum(axis=1)
        dists = x2[:, None] + c2[None, :] - 2.0 * (x @ centroids.T)
        assign = dists.argmin(axis=1)
        new = np.empty_like(centroids)
        for j in range(k):
            pts = x[assign == j]
            new[j] = pts.mean(axis=0) if len(pts) else centroids[j]
        shift = float(np.abs(new - centroids).max())
        centroids = new
        if shift < tol:
            break
    return centroids


def train_codebook_local(x: "np.ndarray", spec: PQSpec):
    """Fit the codebook from an in-memory sample (numpy) — the shape
    used inside IVFIndex.build where the centroid sample is already
    collected; avoids a second Spark job + shuffle. Deterministic:
    rows are lexsorted before the seeded fit, exactly like the
    distributed path. Returns [(subvector_id, centroid_id, c), ...]."""
    x = np.asarray(x, dtype=np.float64)
    rows = []
    for sid in range(spec.splits):
        sub = x[:, sid * spec.subdim : (sid + 1) * spec.subdim]
        sub = sub[np.lexsort(sub.T[::-1])]
        cents = _kmeans_fit(sub, spec.clusters, seed=spec.seed + sid)
        cents = cents[np.lexsort(cents.T[::-1])]
        for cid, c in enumerate(cents):
            rows.append((sid, cid, c.tolist()))
    return rows


def train_codebook(
    df: DataFrame,
    column: str,
    spec: PQSpec,
    train_limit: Optional[int] = 10000,
) -> DataFrame:
    """Train the PQ codebook → DataFrame (subvector_id, centroid_id, c).

    One Spark job: sample → posexplode into subvector slices → groupBy
    subvector_id → seeded k-means per group (applyInPandas). The
    groupBy IS the reference CLI's per-subvector job fan-out
    (pq/mod.rs:186-238), scheduled by Spark instead of GCP Batch.
    """
    sub = spec.subdim
    sample = df.select(column).where(F.col(column).isNotNull())
    if train_limit:
        sample = sample.limit(train_limit)  # dataset_size_limit analog
    slices = sample.select(
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(spec.splits - 1)),
                lambda i: F.slice(F.col(column), i * sub + 1, sub),
            )
        ).alias("subvector_id", "sub")
    )

    out_schema = T.StructType(
        [
            T.StructField("subvector_id", T.IntegerType()),
            T.StructField("centroid_id", T.IntegerType()),
            T.StructField("c", T.ArrayType(T.DoubleType())),
        ]
    )
    clusters, seed = spec.clusters, spec.seed

    def fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(pdf["subvector_id"].iloc[0])
        x = np.asarray(pdf["sub"].tolist(), dtype=np.float64)
        # deterministic row order regardless of partition order
        order = np.lexsort(x.T[::-1])
        x = x[order]
        cents = _kmeans_fit(x, clusters, seed=seed + sid)
        # stable centroid ids: sort by vector value
        cents = cents[np.lexsort(cents.T[::-1])]
        return pd.DataFrame(
            {
                "subvector_id": sid,
                "centroid_id": range(len(cents)),
                "c": [c.tolist() for c in cents],
            }
        )

    return slices.groupBy("subvector_id").applyInPandas(fit_group, out_schema)


def _codebook_array(codebook: DataFrame, spec: PQSpec) -> np.ndarray:
    """Collect the (tiny) codebook to a dense (splits, clusters, subdim)
    numpy array, padding missing clusters with +inf (never matched)."""
    rows = codebook.collect()
    k = max(r["centroid_id"] for r in rows) + 1
    arr = np.full((spec.splits, k, spec.subdim), np.inf, dtype=np.float64)
    for r in rows:
        arr[r["subvector_id"], r["centroid_id"]] = r["c"]
    return arr


def encode_pq(
    df: DataFrame,
    column: str,
    codebook: DataFrame,
    spec: PQSpec,
    out_col: Optional[str] = None,
) -> DataFrame:
    """Append ``<col>_pq`` codes (array<smallint>), one code per
    subvector — quantize_vector / quantize_table analog
    (lantern.sql:256-307, 342-429). Map-only; codebook rides along as a
    task-broadcast numpy array inside the Arrow-batched UDF."""
    out_col = out_col or f"{column}_pq"
    cb = _codebook_array(codebook, spec)
    splits, subdim = spec.splits, spec.subdim

    @F.pandas_udf(T.ArrayType(T.ShortType()))
    def _encode(vs: pd.Series) -> pd.Series:
        mask = vs.notna()
        vals = vs[mask]
        if len(vals) == 0:
            return pd.Series([None] * len(vs), index=vs.index, dtype=object)
        # whole-batch vectorization: (B, splits, subdim) against the
        # (splits, k, subdim) codebook via one matmul per split
        x = np.asarray(vals.tolist(), dtype=np.float64).reshape(
            -1, splits, subdim
        )
        codes = np.empty((x.shape[0], splits), dtype=np.int16)
        for s in range(splits):
            c = cb[s]  # (k, subdim); padded rows are +inf → never argmin
            finite = np.isfinite(c).all(axis=1)
            cf = np.where(finite[:, None], c, 0.0)
            d = (
                (x[:, s] * x[:, s]).sum(axis=1)[:, None]
                + (cf * cf).sum(axis=1)[None, :]
                - 2.0 * (x[:, s] @ cf.T)
            )
            d[:, ~finite] = np.inf
            # round-6 before argmin: the repo-wide (rounded value, id)
            # tie-break — argmin takes the LOWEST centroid_id among
            # rounded-equal distances, so a SQL oracle replicating the
            # encode (ORDER BY round(d,6), centroid_id) picks the same
            # code even when BLAS vs fold summation differ at ~1e-13
            codes[:, s] = np.round(d, 6).argmin(axis=1).astype(np.int16)
        it = iter(codes)
        return pd.Series(
            [next(it).tolist() if m else None for m in mask],
            index=vs.index,
            dtype=object,
        )

    return df.withColumn(out_col, _encode(F.col(column)))


def decode_pq(
    df: DataFrame,
    code_col: str,
    codebook: DataFrame,
    spec: PQSpec,
    out_col: str = "decoded",
) -> DataFrame:
    """Concatenate centroids by code — dequantize_vector analog
    (lantern.sql:310-339)."""
    cb = _codebook_array(codebook, spec)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _decode(codes: pd.Series) -> pd.Series:
        def dec(c):
            if c is None:
                return None
            idx = np.asarray(c, dtype=np.int64)
            return cb[np.arange(len(idx)), idx].reshape(-1).tolist()

        return codes.map(dec)

    return df.withColumn(out_col, _decode(F.col(code_col)))


def pq_dist(
    df: DataFrame,
    code_col: str,
    query: Sequence[float],
    codebook: DataFrame,
    spec: PQSpec,
    metric: str = "l2sq",
    out_col: str = "pq_dist",
) -> DataFrame:
    """ADC (asymmetric distance computation): distance(query, code) via
    per-query (splits × clusters) lookup tables — the Spark analog of
    PQ-aware search (pqtable.c:194-333 load_pq_codebook + scan.c:75-81).

    l2sq: one LUT of per-subvector squared distances (classic additive
    ADC). cos: ALSO additive — dot(q, decode) = Σ (q_sub · c_sub) and
    ‖decode‖² = Σ ‖c_sub‖², so two LUTs (dot, norm²) reconstruct
    1 − dot/(‖q‖·‖decode‖) exactly as decode+cos would, without
    materializing the decoded vectors."""
    m = Metric.resolve(metric)
    cb = _codebook_array(codebook, spec)
    q = np.asarray(list(query), dtype=np.float64).reshape(spec.splits, 1, spec.subdim)
    if m is Metric.L2SQ:
        lut = ((q - cb) ** 2).sum(axis=2)  # (splits, clusters)
        lut = np.where(np.isfinite(lut), lut, np.inf)

        def score(idx):
            return float(lut[np.arange(len(idx)), idx].sum())

    elif m is Metric.COS:
        dot_lut = (q * cb).sum(axis=2)  # (splits, clusters)
        n2_lut = (cb * cb).sum(axis=2)
        dot_lut = np.where(np.isfinite(dot_lut), dot_lut, 0.0)
        n2_lut = np.where(np.isfinite(n2_lut), n2_lut, np.inf)
        qn = float(np.linalg.norm(q.reshape(-1)))

        def score(idx):
            r = np.arange(len(idx))
            dn = qn * float(np.sqrt(n2_lut[r, idx].sum()))
            if dn == 0.0:
                return None
            return 1.0 - float(dot_lut[r, idx].sum()) / dn

    else:
        raise ValueError(
            f"pq_dist supports l2sq/cos (got {m.value}): ADC needs an "
            "additive decomposition"
        )

    @F.pandas_udf(T.DoubleType())
    def _adc(codes: pd.Series) -> pd.Series:
        def one(c):
            if c is None:
                return None
            return score(np.asarray(c, dtype=np.int64))

        return codes.map(one)

    return df.withColumn(out_col, _adc(F.col(code_col)))


def drop_quantization(
    df: DataFrame, column: str, codebook_path: Optional[str] = None
) -> DataFrame:
    """``lantern.drop_quantization`` analog (lantern.sql:431-452): the
    reference drops the codebook table and restores the real-vector
    column; here the codes column (``<col>_pq``) is dropped from the
    projection — the raw vector column was never replaced — and the
    codebook artifact directory is removed when given."""
    out = df.drop(f"{column}_pq")
    if codebook_path is not None:
        import shutil

        shutil.rmtree(codebook_path, ignore_errors=True)
    return out


def reconstruction_mse(
    df: DataFrame, column: str, codebook: DataFrame, spec: PQSpec
) -> float:
    """Mean squared reconstruction error of encode→decode (test metric,
    cf. pq_test_with_db.rs round-trip checks)."""
    enc = encode_pq(df, column, codebook, spec, out_col="__pq")
    dec = decode_pq(enc, "__pq", codebook, spec, out_col="__dec")
    from lantern_spark.functions.distances import l2sq_dist

    row = dec.agg(
        F.avg(l2sq_dist(column, "__dec") / spec.dim).alias("mse")
    ).first()
    return float(row["mse"])


# ----------------------------------------------------------------------
# scalar quantization (quant_bits analog, options.c:36-46,137-158)
# ----------------------------------------------------------------------

def sq_train_bounds(df: DataFrame, column: str) -> tuple:
    """Global (min, max) element bounds for min-max int8 quantization."""
    row = df.select(
        F.min(F.array_min(F.col(column))).alias("mn"),
        F.max(F.array_max(F.col(column))).alias("mx"),
    ).first()
    return float(row["mn"]), float(row["mx"])


def sq_encode_i8(col, mn: float, mx: float) -> Column:
    """Min-max scalar quantization to int8 codes [-127, 127] — pure
    column expr (quant_bits=8 analog). Deterministic, SQL-expressible."""
    c = col if isinstance(col, Column) else F.col(col)
    scale = (mx - mn) or 1.0
    return F.transform(
        c,
        lambda x: F.round(
            (x.cast("double") - F.lit(mn)) / F.lit(scale) * 254.0 - 127.0, 0
        ).cast("int"),
    )


def sq_decode_i8(col, mn: float, mx: float) -> Column:
    c = col if isinstance(col, Column) else F.col(col)
    scale = (mx - mn) or 1.0
    return F.transform(
        c,
        lambda x: (x.cast("double") + 127.0) / 254.0 * F.lit(scale) + F.lit(mn),
    )


def sq_round_f16(col) -> Column:
    """quant_bits=16 analog: round each element through IEEE float16
    (usearch scalar_kind f16, options.c:137-158). Spark has no half
    type, so storage-as-f16 is modeled as the value after the f16
    round-trip — numerically identical to what a f16-backed index
    would compute distances on. Arrow-batched, one vectorized numpy
    astype per batch."""
    import numpy as np
    import pandas as pd

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _f16(vs: pd.Series) -> pd.Series:
        def rt(v):
            if v is None:
                return None
            return (
                np.asarray(v, dtype=np.float32)
                .astype(np.float16)
                .astype(np.float32)
                .tolist()
            )

        return vs.map(rt)

    c = col if isinstance(col, Column) else F.col(col)
    return _f16(c)


def sq_encode_b1(col) -> Column:
    """1-bit quantization: sign bits packed into int32 words (the
    quant_bits=1 layout, dim×32 packing of hnsw.c:308-318).

    Element i sets bit (i % 32) of word (i // 32) when x > 0.
    """
    c = col if isinstance(col, Column) else F.col(col)
    nwords = F.ceil(F.size(c) / 32).cast("int")
    # accumulator carries (acc, weight); weight doubles per element —
    # equivalent to setting bit i, without needing a column shift amount
    return F.transform(
        F.sequence(F.lit(0), nwords - 1),
        lambda w: F.aggregate(
            F.slice(c, w * 32 + 1, 32),
            F.struct(
                F.lit(0).cast("long").alias("acc"),
                F.lit(1).cast("long").alias("wt"),
            ),
            lambda s, x: F.struct(
                (
                    s["acc"]
                    + F.when(x > 0, s["wt"]).otherwise(F.lit(0).cast("long"))
                ).alias("acc"),
                (s["wt"] * 2).alias("wt"),
            ),
            # two's-complement wrap before the int cast (ANSI mode would
            # reject a plain overflow cast for words with bit 31 set)
            lambda s: F.when(
                s["acc"] >= F.lit(2147483648), s["acc"] - F.lit(4294967296)
            ).otherwise(s["acc"]),
        ).cast("int"),
    )
