"""Registered quantization queries (SURVEY §2.D parity)."""

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
from lantern_spark.queries.common import Q64, load_table
from lantern_spark.registry import register
from lantern_spark.types import PQSpec

_SPEC = PQSpec(dim=64, splits=8, clusters=16, seed=42)


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


@register("pq_roundtrip")  # rows-only: k-means codebook not SQL-expressible
def pq_roundtrip(spark, sf_dir):
    """PQ encode→decode round-trip stats (create_pq_codebook +
    quantize/dequantize_vector analogs, lantern.sql:196-339)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cb = train_codebook(emb, "embedding", _SPEC)
    enc = encode_pq(emb, "embedding", cb, _SPEC)
    dec = decode_pq(enc, "embedding_pq", cb, _SPEC, out_col="back")
    return dec.select(
        "vec_id",
        F.size("embedding_pq").alias("n_codes"),
        F.array_min("embedding_pq").alias("code_min"),
        F.array_max("embedding_pq").alias("code_max"),
        F.round(l2sq_dist("embedding", "back") / _SPEC.dim, 6).alias("mse"),
    )


@register("pq_adc_topk")  # rows-only: approximate by construction
def pq_adc_topk(spark, sf_dir):
    """Top-20 by ADC distance over PQ codes (PQ-aware search analog,
    scan.c:75-81). Approximate — verified by recall in pytest, not hash."""
    emb = load_table(spark, sf_dir, "embeddings")
    cb = train_codebook(emb, "embedding", _SPEC)
    enc = encode_pq(emb, "embedding", cb, _SPEC)
    scored = pq_dist(enc, "embedding_pq", Q64, cb, _SPEC)
    return (
        scored.select("vec_id", F.round("pq_dist", 6).alias("pq_dist"))
        .orderBy("pq_dist", "vec_id")
        .limit(20)
    )


@register("sq_f16_roundtrip")  # rows-only: no f16 type in DuckDB
def sq_f16_roundtrip(spark, sf_dir):
    """f16 round-trip (quant_bits=16 analog): per-row max absolute
    error must be within half-precision ulp of the value range."""
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


@register("ivf_pq_adc_top10")  # rows-only: approximate by contract
def ivf_pq_adc_top10(spark, sf_dir):
    """IVF-PQ compound search: partition-pruned lists → ADC candidate
    scan over codes (column-pruned: vectors unread) → exact re-rank.
    The 100 TB fast path; recall-verified in pytest. Shares the
    PQ-enabled index build with the ivf_* query family."""
    from lantern_spark.queries.ann import _index_for

    idx = _index_for(spark, sf_dir)
    out = idx.search_adc(spark, Q64, k=10, nprobe=4, oversample=4)
    return out.select("vec_id", F.round("dist", 6).alias("dist"))
