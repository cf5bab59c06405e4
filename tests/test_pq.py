"""PQ + scalar quantization tests.

Ports the invariants of test/sql/hnsw_pq.sql and pq_test_with_db.rs:
codebook shape (splits × clusters), codes < clusters, round-trip
reconstruction error bound, param validation errors
(pqtable.c:81-91,118-127), and determinism (ours is seeded).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lantern_spark.functions.distances import hamming_dist, l2sq_dist
from lantern_spark.operators.pq import (
    decode_pq,
    encode_pq,
    pq_dist,
    reconstruction_mse,
    sq_decode_i8,
    sq_encode_b1,
    sq_encode_i8,
    sq_train_bounds,
    train_codebook,
)
from lantern_spark.types import PQSpec

SPEC = PQSpec(dim=64, splits=4, clusters=10, seed=42)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def codebook(spark, emb):
    cb = train_codebook(emb, "embedding", SPEC)
    cb.cache().count()
    return cb


def test_codebook_shape(codebook):
    rows = codebook.collect()
    assert len(rows) == SPEC.splits * SPEC.clusters
    subs = {r.subvector_id for r in rows}
    assert subs == set(range(SPEC.splits))
    assert all(len(r.c) == SPEC.subdim for r in rows)


def test_codes_in_range(emb, codebook):
    enc = encode_pq(emb, "embedding", codebook, SPEC)
    row = enc.agg(
        F.min(F.array_min("embedding_pq")).alias("lo"),
        F.max(F.array_max("embedding_pq")).alias("hi"),
        F.min(F.size("embedding_pq")).alias("len"),
    ).first()
    assert row.lo >= 0 and row.hi < SPEC.clusters
    assert row.len == SPEC.splits


def test_roundtrip_mse_bound(emb, codebook):
    mse = reconstruction_mse(emb, "embedding", codebook, SPEC)
    # embeddings elements ∈ ~[-0.45, 0.49]; variance ≈ 0.02 — 10 clusters
    # over 16-dim subvectors must at least beat the trivial bound
    assert 0 < mse < 0.05, f"reconstruction MSE {mse} out of bound"


def test_determinism(emb):
    cb1 = {(r.subvector_id, r.centroid_id): r.c for r in train_codebook(emb, "embedding", SPEC).collect()}
    cb2 = {(r.subvector_id, r.centroid_id): r.c for r in train_codebook(emb, "embedding", SPEC).collect()}
    assert cb1.keys() == cb2.keys()
    for k in cb1:
        assert cb1[k] == pytest.approx(cb2[k], rel=1e-12)


def test_adc_matches_decoded_distance(emb, codebook):
    """ADC(query, code) must equal l2sq(query, decode(code)) exactly."""
    q = [float((i * 37 % 97) / 97.0) for i in range(64)]
    enc = encode_pq(emb.limit(50), "embedding", codebook, SPEC)
    dec = decode_pq(enc, "embedding_pq", codebook, SPEC, out_col="dec")
    adc = pq_dist(dec, "embedding_pq", q, codebook, SPEC)
    from lantern_spark.functions.vectors import vec_lit

    rows = adc.withColumn("ref", l2sq_dist("dec", vec_lit(q))).select("pq_dist", "ref").collect()
    for r in rows:
        assert r.pq_dist == pytest.approx(r.ref, rel=1e-9)


def test_spec_validation():
    with pytest.raises(ValueError):
        PQSpec(dim=64, splits=5, clusters=10)  # dim not divisible
    with pytest.raises(ValueError):
        PQSpec(dim=64, splits=4, clusters=300)  # >256 clusters
    with pytest.raises(ValueError):
        PQSpec(dim=64, splits=100, clusters=10)  # splits > dim


def test_clusters_capped_at_dataset_size(spark):
    """clusters > rows: k-means caps at n points (reference errors;
    we degrade gracefully — documented deviation, codebook still valid)."""
    small = spark.createDataFrame(
        [([float(i)] * 4,) for i in range(3)], "v array<float>"
    )
    spec = PQSpec(dim=4, splits=2, clusters=8)
    cb = train_codebook(small, "v", spec)
    assert cb.count() <= 2 * 3


def test_sq_i8_roundtrip(emb):
    mn, mx = sq_train_bounds(emb, "embedding")
    enc = emb.withColumn("codes", sq_encode_i8("embedding", mn, mx))
    row = enc.agg(
        F.min(F.array_min("codes")).alias("lo"), F.max(F.array_max("codes")).alias("hi")
    ).first()
    assert row.lo >= -127 and row.hi <= 127
    dec = enc.withColumn("back", sq_decode_i8("codes", mn, mx))
    err = dec.agg(F.max(l2sq_dist("embedding", "back")).alias("e")).first().e
    step = (mx - mn) / 254.0
    assert err <= 64 * (step / 2) ** 2 * 1.01


def test_sq_b1_sign_bits(spark):
    df = spark.createDataFrame(
        [([1.0, -1.0, 0.5, -0.5] * 16,)], "v array<float>"
    )
    row = df.select(sq_encode_b1("v").alias("bits")).first()
    assert len(row.bits) == 2  # 64 dims → 2 int32 words
    # pattern 1,0,1,0,... → 0b...0101 per word
    assert row.bits[0] == 0x55555555 - (1 << 32) or row.bits[0] == 0x55555555


def test_pq_cos_adc_matches_decode_then_cos(spark, sf_dir):
    """cos ADC (two LUTs: dot + norm²) must equal decoding the codes
    and computing cos exactly — the additive decomposition is lossless
    relative to decode+cos, not an extra approximation."""
    import numpy as np

    from lantern_spark.functions.distances import cos_dist
    from lantern_spark.functions.vectors import vec_lit
    from lantern_spark.operators.pq import (
        decode_pq,
        encode_pq,
        pq_dist,
        train_codebook,
    )
    from lantern_spark.types import PQSpec

    spec = PQSpec(dim=64, splits=8, clusters=8, seed=7)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    cb = train_codebook(emb, "embedding", spec)
    cb = cb.cache()
    cb.count()
    q = [float((i * 13 % 31) / 31.0) for i in range(64)]
    enc = encode_pq(emb, "embedding", cb, spec)
    adc = pq_dist(enc, "embedding_pq", q, cb, spec, metric="cos")
    dec = decode_pq(adc, "embedding_pq", cb, spec, out_col="back")
    rows = dec.withColumn(
        "ref", cos_dist("back", vec_lit(q))
    ).select("vec_id", "pq_dist", "ref").collect()
    for r in rows:
        assert r["pq_dist"] == pytest.approx(r["ref"], abs=1e-9)


def test_pq_dist_rejects_unsupported_metric(spark, sf_dir):
    from lantern_spark.operators.pq import pq_dist, train_codebook
    from lantern_spark.types import PQSpec

    spec = PQSpec(dim=64, splits=8, clusters=4, seed=7)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    cb = train_codebook(emb, "embedding", spec)
    with pytest.raises(ValueError, match="additive decomposition"):
        pq_dist(emb, "embedding", [0.0] * 64, cb, spec, metric="hamming")
