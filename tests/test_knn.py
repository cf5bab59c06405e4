"""Exact KNN search / KNN join / weighted search vs DuckDB oracle.

Reference behaviors ported: top-k ordering (scan.c fetch loop), LATERAL
knn-join (hnsw_dist_func.sql:66-90), weighted_vector_search
(lantern.sql:673-819).
"""

import pytest
from pyspark.sql import functions as F

from lantern_spark.functions import cos_dist, l2sq_dist, vec_lit
from lantern_spark.operators.knn import knn_join, knn_search, weighted_vector_search
from tests.conftest import assert_matches_oracle

Q64 = [float((i * 37 % 97) / 97.0) for i in range(64)]
QLIT = "[" + ",".join(repr(x) for x in Q64) + "]::DOUBLE[]"

L2SQ_DUCK = (
    "list_sum(list_transform(list_zip({a}::DOUBLE[], {b}), x -> (x[1]-x[2])*(x[1]-x[2])))"
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_knn_search_topk_oracle(emb, duck):
    sdf = (
        knn_search(emb, "embedding", Q64, k=10, metric="l2sq")
        .select("vec_id", F.round("dist", 6).alias("dist"))
        .orderBy(F.round("dist", 6), "vec_id")
        .limit(10)
    )
    # round-then-order in BOTH engines so boundary ties break identically
    sql = f"""
        SELECT vec_id, round({L2SQ_DUCK.format(a='embedding', b=QLIT)}, 6) AS dist
        FROM embeddings ORDER BY dist, vec_id LIMIT 10
    """
    assert_matches_oracle(sdf, duck, sql)


def test_knn_search_with_filter(emb, duck):
    sdf = (
        knn_search(emb, "embedding", Q64, k=5, metric="cos",
                   where=F.col("label") == 3, tie_break="vec_id")
        .select("vec_id", "label", F.round("dist", 6).alias("dist"))
    )
    sql = f"""
        SELECT vec_id, label,
               round(1.0 - list_sum(list_transform(list_zip(embedding::DOUBLE[], {QLIT}), x -> x[1]*x[2]))
                 / sqrt(list_sum(list_transform(embedding::DOUBLE[], x->x*x))
                      * list_sum(list_transform({QLIT}, x->x*x))), 6) AS dist
        FROM embeddings WHERE label = 3 ORDER BY dist, vec_id LIMIT 5
    """
    assert_matches_oracle(sdf, duck, sql)


def test_knn_join_oracle(emb, duck):
    queries = (
        emb.filter(F.col("vec_id") < 3)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    )
    sdf = (
        knn_join(
            emb.select("vec_id", "embedding"), "embedding",
            queries, "qv", k=3, metric="l2sq", tie_break="vec_id",
        )
        .select("query_id", "vec_id", F.round("dist", 6).alias("dist"))
    )
    sql = f"""
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                   FROM embeddings WHERE vec_id < 3),
        d AS (SELECT q.query_id, e.vec_id,
                     round({L2SQ_DUCK.format(a='e.embedding', b='q.qv')}, 6) AS dist,
                     row_number() OVER (PARTITION BY q.query_id
                                        ORDER BY {L2SQ_DUCK.format(a='e.embedding', b='q.qv')}, e.vec_id) AS rn
              FROM embeddings e CROSS JOIN q)
        SELECT query_id, vec_id, dist FROM d WHERE rn <= 3
    """
    assert_matches_oracle(sdf, duck, sql)


def test_weighted_search_exact_oracle(emb, duck):
    # two vector columns: embedding and its elementwise square (derived)
    df = emb.withColumn("v2", F.transform("embedding", lambda x: x * x))
    q2 = [x * x for x in Q64]
    sdf = (
        weighted_vector_search(
            df, [(0.7, "embedding", Q64), (0.3, "v2", q2)],
            k=8, metric="l2sq", id_col="vec_id",
        )
        .select("vec_id", F.round("joint_dist", 6).alias("joint_dist"))
    )
    q2lit = "[" + ",".join(repr(x) for x in q2) + "]::DOUBLE[]"
    sql = f"""
        WITH s AS (
          SELECT vec_id,
                 0.7 * {L2SQ_DUCK.format(a='embedding', b=QLIT)}
               + 0.3 * {L2SQ_DUCK.format(a='list_transform(embedding::DOUBLE[], x -> x*x)', b=q2lit)}
                 AS jd
          FROM embeddings)
        SELECT vec_id, round(jd, 6) AS joint_dist
        FROM s ORDER BY jd, vec_id LIMIT 8
    """
    assert_matches_oracle(sdf, duck, sql)


def test_weighted_search_approx_superset(emb):
    """Approx mode (per-term top-ef union → re-rank) must equal exact
    mode when ef is large enough to cover the union."""
    df = emb.withColumn("v2", F.transform("embedding", lambda x: x * x))
    q2 = [x * x for x in Q64]
    terms = [(0.5, "embedding", Q64), (0.5, "v2", q2)]
    exact = weighted_vector_search(df, terms, k=5, id_col="vec_id", exact=True)
    approx = weighted_vector_search(df, terms, k=5, id_col="vec_id", exact=False, ef=500)
    e = [(r.vec_id, round(r.joint_dist, 9)) for r in exact.collect()]
    a = [(r.vec_id, round(r.joint_dist, 9)) for r in approx.collect()]
    assert e == a


def test_weighted_search_max_dist(emb):
    out = weighted_vector_search(
        emb, [(1.0, "embedding", Q64)], k=100, id_col="vec_id", max_dist=8.0
    ).collect()
    assert all(r.joint_dist < 8.0 for r in out)


def test_knn_plan_is_take_ordered(emb):
    """The exact top-k must compile to TakeOrderedAndProject — per-partition
    heaps + driver merge, no global sort/shuffle of the base data."""
    plan = knn_search(emb, "embedding", Q64, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


class TestArrowImpl:
    def test_arrow_matches_expr(self, spark, sf_dir):
        """Arrow kernel and expression path agree after round(·, 6)."""
        from lantern_spark.operators.knn import knn_search
        from pyspark.sql import functions as F

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q = emb.select("embedding").first()["embedding"]
        for metric in ("l2sq", "cos"):
            a = knn_search(
                emb, "embedding", list(q), k=10, metric=metric,
                tie_break="vec_id",
            ).select("vec_id", F.round("dist", 6).alias("d")).collect()
            b = knn_search(
                emb, "embedding", list(q), k=10, metric=metric,
                tie_break="vec_id", impl="arrow",
            ).select("vec_id", F.round("dist", 6).alias("d")).collect()
            assert [(r["vec_id"], r["d"]) for r in a] == [
                (r["vec_id"], r["d"]) for r in b
            ]

    def test_arrow_dim_mismatch_raises(self, spark, sf_dir):
        import pytest
        from lantern_spark.operators.knn import knn_search

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        with pytest.raises(Exception, match="dimension mismatch"):
            knn_search(
                emb, "embedding", [0.0] * 32, k=5, impl="arrow"
            ).collect()


class TestRRF:
    def test_rrf_fuse_math(self, spark):
        from lantern_spark.operators.hybrid import rrf_fuse
        from pyspark.sql import functions as F

        a = spark.createDataFrame(
            [(1, 9.0), (2, 7.0), (3, 5.0)], "id long, score double"
        )
        b = spark.createDataFrame(
            [(3, 0.1), (1, 0.4), (4, 0.9)], "id long, dist double"
        )
        out = rrf_fuse(
            [a, b], "id", ["score", "dist"], k=4,
            ascending=[False, True],
        ).collect()
        got = {r["id"]: round(r["rrf_score"], 6) for r in out}
        # a-ranks: 1->1, 2->2, 3->3 ; b-ranks: 3->1, 1->2, 4->3
        exp = {
            1: round(1 / 61 + 1 / 62, 6),
            3: round(1 / 63 + 1 / 61, 6),
            2: round(1 / 62, 6),
            4: round(1 / 63, 6),
        }
        assert got == exp
        # doc appearing in both lists outranks single-list docs
        order = [r["id"] for r in out]
        assert order[0] in (1, 3) and order[1] in (1, 3)


class TestSaltedTopK:
    def test_salted_equals_plain(self, spark, sf_dir):
        from lantern_spark.operators.topk import topk_per_group
        from lantern_spark.types import load_events

        ev = load_events(spark, sf_dir).select(
            "event_type", "event_id", "value"
        )
        plain = topk_per_group(
            ev, ["event_type"], "value", k=5,
            ascending=False, tie_break="event_id",
        )
        salted = topk_per_group(
            ev, ["event_type"], "value", k=5,
            ascending=False, tie_break="event_id", salt=8,
        )
        a = sorted((r["event_type"], r["event_id"]) for r in plain.collect())
        b = sorted((r["event_type"], r["event_id"]) for r in salted.collect())
        assert a == b and len(a) > 0

    def test_salted_has_two_bounded_shuffles(self, spark, sf_dir):
        from lantern_spark.operators.topk import topk_per_group
        from lantern_spark.types import load_events

        ev = load_events(spark, sf_dir).select(
            "event_type", "event_id", "value"
        )
        salted = topk_per_group(
            ev, ["event_type"], "value", k=5,
            ascending=False, tie_break="event_id", salt=8,
        )
        plan = salted._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange ") == 2


class TestWeightedIndexBacked:
    """Index-backed approx mode (VERDICT r1 #5): per-term candidates
    come from IVFIndex.search, matching lantern.sql:673-819's
    index-CTE shape instead of an exact top-ef scan."""

    @pytest.fixture(scope="class")
    def ivf(self, emb, tmp_path_factory):
        from lantern_spark.operators.index import IVFIndex

        path = str(tmp_path_factory.mktemp("weighted_ivf"))
        return IVFIndex.build(
            emb, "embedding", "vec_id", path, metric="l2sq", nlist=8, seed=42
        )

    def test_full_probe_equals_exact_candidates(self, emb, ivf):
        """At nprobe=nlist the index candidate set IS the exact top-ef
        set, so results match the scan-based approx path exactly."""
        q2 = [1.0 - x for x in Q64]
        terms = [(0.7, "embedding", Q64), (0.3, "embedding", q2)]
        scan = weighted_vector_search(
            emb, terms, k=10, id_col="vec_id", ef=50, exact=False
        )
        idx = weighted_vector_search(
            emb, terms, k=10, id_col="vec_id", ef=50, exact=False,
            indexes=[ivf, ivf],
        )
        s = [(r.vec_id, round(r.joint_dist, 9)) for r in scan.collect()]
        i = [(r.vec_id, round(r.joint_dist, 9)) for r in idx.collect()]
        assert s == i

    def test_pruned_probe_recall(self, emb, ivf):
        """At nprobe=4 of 8 the candidate generation is genuinely
        approximate; joint top-10 must still recall most of the exact
        answer (the ef/nprobe recall contract)."""
        q2 = [1.0 - x for x in Q64]
        terms = [(0.7, "embedding", Q64), (0.3, "embedding", q2)]
        exact = weighted_vector_search(
            emb, terms, k=10, id_col="vec_id", exact=True,
            tie_break="vec_id",
        )
        pruned = weighted_vector_search(
            emb, terms, k=10, id_col="vec_id", ef=50, exact=False,
            indexes=[ivf, ivf], nprobe=4,
        )
        e = {r.vec_id for r in exact.collect()}
        p = {r.vec_id for r in pruned.collect()}
        assert len(e & p) / 10 >= 0.6

    def test_candidate_ids_broadcast(self, emb, ivf):
        """The re-rank join must broadcast the O(ef·terms) id side,
        never shuffle the base table."""
        out = weighted_vector_search(
            emb, [(1.0, "embedding", Q64)], k=5, id_col="vec_id",
            ef=20, exact=False, indexes=[ivf],
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestWeightedSharedScan:
    """r14 optimization: a multi-term weighted search whose terms all
    probe the SAME delta-free index runs ONE scan with every term's
    distance computed in that pass (guide §2.4 — remove passes); the
    per-term top-ef candidate sets must equal the per-term
    ``idx.search`` results verbatim, and any state the rewrite cannot
    reproduce (delta rows, tombstones) must fall back."""

    @pytest.fixture(scope="class")
    def ivf(self, emb, tmp_path_factory):
        from lantern_spark.operators.index import IVFIndex

        path = str(tmp_path_factory.mktemp("shared_scan_ivf"))
        return IVFIndex.build(
            emb, "embedding", "vec_id", path, metric="l2sq", nlist=8,
            seed=42,
        )

    def test_shared_equals_per_term_all_nprobes(self, emb, ivf):
        from lantern_spark.operators.knn import (
            _per_term_candidates,
            _shared_index_candidates,
        )

        q2 = [1.0 - x for x in Q64]
        terms = [(0.7, "embedding", Q64), (0.3, "embedding", q2)]
        for npv in (None, 3, 8):
            shared = _shared_index_candidates(
                emb, terms, [ivf, ivf], "l2sq", 50, npv, "vec_id"
            )
            assert shared is not None
            per = _per_term_candidates(
                emb, terms, [ivf, ivf], "l2sq", 50, npv, "vec_id", None
            )
            for s, p in zip(shared, per):
                assert sorted(r[0] for r in s.collect()) == sorted(
                    r[0] for r in p.collect()
                )

    def test_fallback_on_delta_and_mixed_indexes(self, emb, ivf):
        from pyspark.sql import functions as SF

        from lantern_spark.operators.knn import _shared_index_candidates

        terms = [(0.7, "embedding", Q64), (0.3, "embedding", Q64)]
        # mixed index objects -> no shared scan
        assert (
            _shared_index_candidates(
                emb, terms, [ivf, None], "l2sq", 50, None, "vec_id"
            )
            is None
        )
        # pending delta -> no shared scan (search()'s delta union and
        # stale suppression cannot ride the single-scan rewrite)
        ivf.add_delta(
            emb.limit(3).select(
                (SF.col("vec_id") + 77777).alias("vec_id"), "embedding"
            )
        )
        assert (
            _shared_index_candidates(
                emb, terms, [ivf, ivf], "l2sq", 50, None, "vec_id"
            )
            is None
        )
