"""Registered vector-search queries (SURVEY §2.A/§2.B/§2.G parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lantern_spark.functions import (
    cos_dist,
    hamming_dist,
    inner_dist,
    l1_dist,
    l2sq_dist,
    vec_lit,
)
from lantern_spark.queries.common import (
    Q64,
    Q64_B,
    duck_cos,
    duck_l2sq,
    duck_lit,
    load_table,
)
from lantern_spark.registry import register

_QL = duck_lit(Q64)
_QLB = duck_lit(Q64_B)


# --- 2.A distance functions over the full table -------------------------

@register(
    "dist_l2sq_all",
    f"""
    SELECT vec_id, round({duck_l2sq('embedding::DOUBLE[]', _QL)}, 6) AS l2sq
    FROM embeddings
    """,
)
def dist_l2sq_all(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.round(l2sq_dist("embedding", vec_lit(Q64)), 6).alias("l2sq")
    )


@register(
    "dist_cos_all",
    f"""
    SELECT vec_id, round({duck_cos('embedding::DOUBLE[]', _QL)}, 6) AS cosd
    FROM embeddings
    """,
)
def dist_cos_all(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.round(cos_dist("embedding", vec_lit(Q64)), 6).alias("cosd")
    )


def dist_l1_inner_all(spark, sf_dir):
    """Full-table L1 + inner-product distances.

    Retired from the oracle roster in r13 (50-query driver cap): both
    expressions stay hash-covered elsewhere — ``weighted_search_exact``
    and ``weighted_search_approx`` hash l2sq/cos blends through the
    same ``F.aggregate``/``zip_with`` kernel family, and the reference
    extras' l1/inner parity is pinned against scipy in
    tests/test_distances.py — so this entry was redundant evidence;
    its slot funds ``seed_expansion_hops`` (the graph-traversal
    layer's first driver-hash row, review r12 item 4). Kept callable
    so the expressions remain one import away for ad-hoc parity."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.round(l1_dist("embedding", vec_lit(Q64)), 6).alias("l1d"),
        F.round(inner_dist("embedding", vec_lit(Q64)), 6).alias("innerd"),
    )


@register(
    "dist_hamming_all",
    """
    WITH b AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(floor(x * 1024) AS INT)) AS bits
      FROM embeddings
    )
    SELECT b1.vec_id,
           list_sum(list_transform(list_zip(b1.bits, b2.bits),
                    x -> bit_count(xor(x[1], x[2]))))::BIGINT AS hd
    FROM b b1 JOIN b b2 ON b2.vec_id = ((b1.vec_id + 7) % (SELECT count(*) FROM embeddings))
    """,
)
def dist_hamming_all(spark, sf_dir):
    """Hamming over int32-packed bit vectors derived from embeddings.

    Pairs row i with row (i+7) mod n — a deterministic derangement — so
    the kernel is exercised across the whole table (hnsw.c:308-318).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()  # small metadata-only count; table row count is stable
    bits = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: F.floor(x.cast("double") * 1024).cast("int")).alias("bits"),
    )
    b2 = bits.select(F.col("vec_id").alias("vid2"), F.col("bits").alias("bits2"))
    joined = bits.join(b2, ((F.col("vec_id") + 7) % n) == F.col("vid2"))
    return joined.select(
        "vec_id", hamming_dist("bits", "bits2").cast("long").alias("hd")
    )


# --- 2.B exact KNN ------------------------------------------------------

@register(
    "knn_l2sq_top10",
    f"""
    SELECT vec_id, round({duck_l2sq('embedding::DOUBLE[]', _QL)}, 6) AS dist
    FROM embeddings
    ORDER BY round({duck_l2sq('embedding::DOUBLE[]', _QL)}, 6), vec_id
    LIMIT 10
    """,
)
def knn_l2sq_top10(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.withColumn("dist", F.round(l2sq_dist("embedding", vec_lit(Q64)), 6))
        .orderBy("dist", "vec_id")
        .limit(10)
        .select("vec_id", "dist")
    )


def knn_cos_top10(spark, sf_dir):
    """Exact top-10 KNN under cosine distance.

    Retired from the oracle roster in r8 (50-query driver cap): the
    top-k machinery is the SAME metric-agnostic TakeOrdered path
    already hash-checked by ``knn_l2sq_top10``, and the cosine
    expression itself is hash-checked by ``dist_cos_all`` — this entry
    was redundant evidence; its slot funds ``url_dedup_docs``. Still
    timed in bench (direct import) so the series stays comparable."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.withColumn("dist", F.round(cos_dist("embedding", vec_lit(Q64)), 6))
        .orderBy("dist", "vec_id")
        .limit(10)
        .select("vec_id", "dist")
    )


@register(
    "knn_filtered_top5",
    f"""
    SELECT vec_id, label, round({duck_l2sq('embedding::DOUBLE[]', _QL)}, 6) AS dist
    FROM embeddings WHERE label = 3
    ORDER BY round({duck_l2sq('embedding::DOUBLE[]', _QL)}, 6), vec_id
    LIMIT 5
    """,
)
def knn_filtered_top5(spark, sf_dir):
    """WHERE + ORDER BY interplay (hnsw_select.sql:51): exact path
    filters BEFORE top-k (never under-fills k)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.filter(F.col("label") == 3)
        .withColumn("dist", F.round(l2sq_dist("embedding", vec_lit(Q64)), 6))
        .orderBy("dist", "vec_id")
        .limit(5)
        .select("vec_id", "label", "dist")
    )


@register(
    "knn_join_top3",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 5),
    d AS (SELECT q.query_id, e.vec_id,
                 round({duck_l2sq('e.embedding::DOUBLE[]', 'q.qv')}, 6) AS dist,
                 row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY round({duck_l2sq('e.embedding::DOUBLE[]', 'q.qv')}, 6), e.vec_id) AS rn
          FROM embeddings e CROSS JOIN q)
    SELECT query_id, vec_id, dist FROM d WHERE rn <= 3
    """,
)
def knn_join_top3(spark, sf_dir):
    """LATERAL knn-join analog (hnsw_dist_func.sql:66-90)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    # same shape as operators.knn.knn_join, but ranks on the ROUNDED
    # distance for exact tie parity with the oracle
    from pyspark.sql import Window

    out = (
        emb.select("vec_id", "embedding")
        .crossJoin(F.broadcast(queries))
        .withColumn("dist", F.round(l2sq_dist("embedding", "qv"), 6))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("dist", "vec_id")
            ),
        )
        .filter(F.col("rn") <= 3)
        .select("query_id", "vec_id", "dist")
    )
    return out


# --- 2.G weighted multi-vector search ----------------------------------

@register(
    "weighted_search_exact",
    f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS v1,
             list_transform(embedding::DOUBLE[], x -> x*x) AS v2
      FROM embeddings),
    s AS (
      SELECT vec_id,
             round(0.6 * {duck_l2sq('v1', _QL)} + 0.4 * {duck_l2sq('v2', _QLB)}, 6) AS joint_dist
      FROM v)
    SELECT vec_id, joint_dist FROM s
    ORDER BY joint_dist, vec_id LIMIT 10
    """,
)
def weighted_search_exact(spark, sf_dir):
    """lantern.weighted_vector_search exact mode (lantern.sql:673-819)."""
    emb = load_table(spark, sf_dir, "embeddings")
    df = emb.withColumn("v2", F.transform("embedding", lambda x: (x * x).cast("double")))
    return (
        df.withColumn(
            "joint_dist",
            F.round(
                0.6 * l2sq_dist("embedding", vec_lit(Q64))
                + 0.4 * l2sq_dist("v2", vec_lit(Q64_B)),
                6,
            ),
        )
        .orderBy("joint_dist", "vec_id")
        .limit(10)
        .select("vec_id", "joint_dist")
    )
