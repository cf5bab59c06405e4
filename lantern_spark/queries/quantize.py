"""Registered quantization queries (SURVEY §2.D parity).

Hash-checked approximate operators (round-2): the PQ codebook is
deterministic by construction (seeded k-means over lexsorted samples,
operators/pq.py), so it is persisted to parquet and the DuckDB oracle
``read_parquet``s the SAME bytes, replicating argmin-encode / decode /
ADC in SQL. Encode tie-breaks on (round(d,6), centroid_id) on both
sides (the repo-wide rounded-value-then-id convention).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lantern_spark.functions.distances import l2sq_dist
from lantern_spark.operators.pq import (
    decode_pq,
    encode_pq,
    pq_dist,
    sq_decode_i8,
    sq_encode_i8,
    sq_train_bounds,
    train_codebook,
)
from lantern_spark.queries.common import (
    ORACLE_ART,
    Q64,
    artifact_dir,
    duck_lit,
    load_table,
)
from lantern_spark.registry import register
from lantern_spark.types import PQSpec

_SPEC = PQSpec(dim=64, splits=8, clusters=16, seed=42)
_QL = duck_lit(Q64)

# oracle artifact paths — resolved through the ``oracle`` symlink,
# which the engine query repoints at its sf before the oracle runs
_CB_SQL_PATH = f"{ORACLE_ART}/pq_codebook"
_IVF_SQL_PATH = f"{ORACLE_ART}/ivf"

_CB_CACHE: dict = {}


def _codebook_for(spark, sf_dir):
    """Train-once-per-sf codebook, persisted to the artifact dir and
    read BACK from parquet so engine and oracle consume identical
    bytes."""
    path = artifact_dir(sf_dir, "pq_codebook")  # repoints oracle symlink
    if sf_dir not in _CB_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        cb = train_codebook(emb, "embedding", _SPEC)
        cb.repartition(1).write.mode("overwrite").parquet(path)
        _CB_CACHE[sf_dir] = spark.read.parquet(path)
    return _CB_CACHE[sf_dir]


# Shared oracle CTE prefix: read codebook, slice vectors into
# subvectors, argmin-encode with (round(d,6), centroid_id) tie-break.
def _encode_ctes(cb_path: str) -> str:
    return f"""
    cb AS (SELECT subvector_id, centroid_id, c
           FROM read_parquet('{cb_path}/*.parquet')),
    v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    sub AS (SELECT vec_id, sid, e[sid*8+1 : sid*8+8] AS sv
            FROM v, (SELECT unnest(range(0, 8)) AS sid) s),
    scored AS (
      SELECT vec_id, sid, centroid_id, c,
             round(list_sum(list_transform(list_zip(sv, c),
                   x -> (x[1]-x[2])*(x[1]-x[2]))), 6) AS d
      FROM sub JOIN cb ON cb.subvector_id = sub.sid),
    best AS (
      SELECT vec_id, sid, centroid_id, c,
             row_number() OVER (PARTITION BY vec_id, sid
                                ORDER BY d, centroid_id) AS rn
      FROM scored)
    """


@register(
    "sq_i8_roundtrip",
    """
    WITH bounds AS (
      SELECT min(list_min(embedding)) AS mn, max(list_max(embedding)) AS mx
      FROM embeddings
    ),
    enc AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
               x -> CAST(round((x - b.mn)/(b.mx - b.mn)*254.0 - 127.0) AS INT)) AS codes,
             b.mn AS mn, b.mx AS mx
      FROM embeddings, bounds b
    )
    SELECT vec_id,
           list_min(codes) AS code_min,
           list_max(codes) AS code_max,
           round(list_sum(list_transform(
             list_zip(embedding::DOUBLE[],
                      list_transform(codes, c -> (c + 127.0)/254.0*(e.mx - e.mn) + e.mn)),
             p -> (p[1]-p[2])*(p[1]-p[2]))), 6) AS recon_err
    FROM enc e JOIN embeddings USING (vec_id)
    """,
)
def sq_i8_roundtrip(spark, sf_dir):
    """Scalar int8 quantization round-trip (quant_bits=8 analog,
    options.c:137-158): per-row code bounds + reconstruction error."""
    emb = load_table(spark, sf_dir, "embeddings")
    mn, mx = sq_train_bounds(emb, "embedding")
    enc = emb.withColumn("codes", sq_encode_i8("embedding", mn, mx))
    dec = enc.withColumn("back", sq_decode_i8("codes", mn, mx))
    return dec.select(
        "vec_id",
        F.array_min("codes").alias("code_min"),
        F.array_max("codes").alias("code_max"),
        F.round(l2sq_dist("embedding", "back"), 6).alias("recon_err"),
    )


@register(
    "pq_roundtrip",
    f"""
    WITH {_encode_ctes(_CB_SQL_PATH)},
    codes AS (
      SELECT vec_id, list(centroid_id ORDER BY sid) AS code_arr,
             flatten(list(c ORDER BY sid)) AS back
      FROM best WHERE rn = 1 GROUP BY vec_id)
    SELECT v.vec_id, len(code_arr) AS n_codes,
           list_min(code_arr) AS code_min, list_max(code_arr) AS code_max,
           round(list_sum(list_transform(list_zip(v.e, back),
                 x -> (x[1]-x[2])*(x[1]-x[2]))) / 64, 6) AS mse
    FROM codes JOIN v USING (vec_id)
    """,
)
def pq_roundtrip(spark, sf_dir):
    """PQ encode→decode round-trip stats (create_pq_codebook +
    quantize/dequantize_vector analogs, lantern.sql:196-339), hash-
    checked against a SQL replay of argmin-encode over the persisted
    codebook (cf. pq_test_with_db.rs round-trip)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cb = _codebook_for(spark, sf_dir)
    enc = encode_pq(emb, "embedding", cb, _SPEC)
    dec = decode_pq(enc, "embedding_pq", cb, _SPEC, out_col="back")
    return dec.select(
        "vec_id",
        F.size("embedding_pq").alias("n_codes"),
        F.array_min("embedding_pq").alias("code_min"),
        F.array_max("embedding_pq").alias("code_max"),
        F.round(l2sq_dist("embedding", "back") / _SPEC.dim, 6).alias("mse"),
    )


def pq_adc_topk(spark, sf_dir):
    """Top-20 by ADC distance over PQ codes (PQ-aware search analog,
    scan.c:75-81).

    Retired from the oracle roster in r11 (50-query driver cap): the
    plain-ADC scan is a strict sub-plan of ``ivf_pq_adc_top10``
    (IVF-routed ADC over the same codebook), whose oracle replays the
    identical encode + lookup-table arithmetic and stays hash-green;
    encode/decode fidelity stays hash-checked via ``pq_roundtrip``.
    The slot funds ``packed_ids_export`` (the training-shard export,
    the pipeline's last mile). Still timed in bench (direct import)
    so the series stays comparable."""
    emb = load_table(spark, sf_dir, "embeddings")
    cb = _codebook_for(spark, sf_dir)
    enc = encode_pq(emb, "embedding", cb, _SPEC)
    scored = pq_dist(enc, "embedding_pq", Q64, cb, _SPEC)
    return (
        scored.select("vec_id", F.round("pq_dist", 6).alias("pq_dist"))
        .orderBy("pq_dist", "vec_id")
        .limit(20)
    )


# float→float16 round-to-nearest-even, expressed in SQL: quantum =
# 2^(e-10) (2^-24 subnormal), half-even on the exact quotient. Exact
# because inputs are float32 values and quanta are powers of two.
def _f16_sql(x: str) -> str:
    a = f"abs({x})"
    e0 = f"floor(log2({a}))"
    e1 = (
        f"(CASE WHEN 2.0 ** {e0} > {a} THEN {e0} - 1 "
        f"WHEN 2.0 ** ({e0} + 1) <= {a} THEN {e0} + 1 ELSE {e0} END)"
    )
    q = f"(CASE WHEN {e1} < -14 THEN 2.0 ** (-24) ELSE 2.0 ** ({e1} - 10) END)"
    r = f"({x} / {q})"
    r2 = f"floor({r})"
    frac = f"({r} - {r2})"
    rn = (
        f"(CASE WHEN {frac} > 0.5 THEN {r2} + 1 "
        f"WHEN {frac} < 0.5 THEN {r2} "
        f"ELSE {r2} + (CASE WHEN {r2} % 2 = 0 THEN 0 ELSE 1 END) END)"
    )
    return f"(CASE WHEN {x} = 0 THEN 0.0 ELSE {rn} * {q} END)"


def sq_f16_roundtrip(spark, sf_dir):
    """f16 round-trip (quant_bits=16 analog): per-row max absolute
    error.

    Retired from the oracle roster in r7 (50-query driver cap): the
    f16 kernel stays hash-pinned in pytest (`test_bloom_sq.py` golden
    bit patterns) and the scalar-quant family is already oracle-checked
    via `sq_i8_roundtrip` + `sq_b1_hamming_top10`; this slot funds
    `pii_redact_docs`. The arithmetic-f16 oracle SQL survives in
    `_f16_sql` (git history has the registered form)."""
    from lantern_spark.operators.pq import sq_round_f16

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.withColumn("f16", sq_round_f16("embedding"))
    return q.select(
        "vec_id",
        F.round(
            F.aggregate(
                F.zip_with("embedding", "f16", lambda a, b: F.abs(a - b)),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, x),
            ),
            6,
        ).alias("max_abs_err"),
    )


@register(
    "ivf_pq_adc_top10",
    f"""
    WITH cent AS (SELECT list_id, centroid
                  FROM read_parquet('{_IVF_SQL_PATH}/centroids_oracle/*.parquet')),
    ranked AS (
      SELECT list_id,
             row_number() OVER (
               ORDER BY list_sum(list_transform(list_zip(centroid, {_QL}),
                        x -> (x[1]-x[2])*(x[1]-x[2]))), list_id) AS rn
      FROM cent),
    probes AS (
      SELECT list_id FROM ranked
      WHERE rn <= (SELECT nprobe
                   FROM read_parquet('{_IVF_SQL_PATH}/params_oracle/*.parquet'))),
    rows_ AS (
      SELECT vec_id, embedding::DOUBLE[] AS e, __pq_codes
      FROM read_parquet('{_IVF_SQL_PATH}/lists/*/*.parquet', hive_partitioning=1)
      WHERE list_id IN (SELECT list_id FROM probes)),
    cb AS (SELECT subvector_id, centroid_id, c
           FROM read_parquet('{_IVF_SQL_PATH}/pq_codebook/*.parquet')),
    q AS (SELECT {_QL} AS qv),
    lut AS (
      SELECT subvector_id AS sid, centroid_id,
             list_sum(list_transform(
               list_zip(qv[subvector_id*8+1 : subvector_id*8+8], c),
               x -> (x[1]-x[2])*(x[1]-x[2]))) AS ld
      FROM cb, q),
    codeidx AS (
      SELECT vec_id, sid, __pq_codes[sid+1] AS code
      FROM rows_, (SELECT unnest(range(0, 8)) AS sid) s),
    adc AS (
      SELECT vec_id, round(sum(ld), 6) AS adc
      FROM codeidx JOIN lut ON lut.sid = codeidx.sid AND lut.centroid_id = codeidx.code
      GROUP BY vec_id),
    cand AS (SELECT vec_id FROM adc ORDER BY adc, vec_id LIMIT 40),
    rerank AS (
      SELECT r.vec_id,
             round(list_sum(list_transform(list_zip(r.e, {_QL}),
                   x -> (x[1]-x[2])*(x[1]-x[2]))), 6) AS dist
      FROM rows_ r JOIN cand USING (vec_id))
    SELECT vec_id, dist FROM rerank ORDER BY dist, vec_id LIMIT 10
    """,
)
def ivf_pq_adc_top10(spark, sf_dir):
    """IVF-PQ compound search: partition-pruned lists → ADC candidate
    scan over codes (column-pruned: vectors unread) → exact re-rank.
    The 100 TB fast path. Hash-checked (round-2): the oracle replays
    probe selection + ADC from the persisted centroids/lists/codebook
    parquet — the approximation is pinned by the shared artifact.
    Shares the PQ-enabled index build (and its tuned nprobe) with the
    ivf_* query family."""
    from lantern_spark.queries.ann import _index_for, _tuned_nprobe

    idx = _index_for(spark, sf_dir)
    out = idx.search_adc(
        spark, Q64, k=10, nprobe=_tuned_nprobe(spark, sf_dir),
        oversample=4, round_digits=6,
    )
    return out.select("vec_id", "dist")
