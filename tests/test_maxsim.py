"""Late-interaction MaxSim retrieval (operators/maxsim) —
arXiv:2004.12832. Hand-computed goldens, a full DuckDB SQL replay on
bags built from the embeddings table (oracle-grade parity without a
roster slot), the pooled-ANN + re-rank composition, and plan pins."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bags(spark, sf_dir):
    """Documents = labels; token bag = the label's member embeddings
    (deterministically ordered). Same construction is SQL-expressible
    for the DuckDB replay."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return (
        emb.groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("vec_id", "embedding"))
            ).alias("s")
        )
        .select(
            F.col("label").cast("long").alias("doc_id"),
            F.transform("s", lambda x: x["embedding"]).alias("tokens"),
        )
    )


QS = [
    [float((i * 37 % 97) / 97.0) for i in range(64)],
    [float((i * 53 % 101) / 101.0) for i in range(64)],
]


class TestMaxSim:
    def test_hand_computed_golden(self, spark):
        from lantern_spark.operators.maxsim import maxsim_score

        df = spark.createDataFrame(
            [
                (1, [[1.0, 0.0], [0.0, 1.0]]),
                (2, [[0.5, 0.5]]),
                (3, []),
            ],
            "doc_id long, tokens array<array<float>>",
        )
        qs = [[2.0, 0.0], [0.0, 4.0]]
        got = {
            r["doc_id"]: r["s"]
            for r in df.select(
                "doc_id", maxsim_score("tokens", qs).alias("s")
            ).collect()
        }
        # doc1: max(2,0)+max(0,4)=6 ; doc2: max(1)+max(2)=3 ; doc3: NULL
        assert got[1] == pytest.approx(6.0)
        assert got[2] == pytest.approx(3.0)
        assert got[3] is None

    def test_matches_duckdb_replay(self, bags, duck):
        from lantern_spark.operators.maxsim import maxsim_score

        got = {
            r["doc_id"]: r["s"]
            for r in bags.select(
                "doc_id",
                maxsim_score("tokens", QS, round_digits=6).alias("s"),
            ).collect()
        }
        q_sql = ", ".join(
            "[" + ",".join(repr(x) for x in q) + "]::DOUBLE[]" for q in QS
        )
        sql = f"""
        WITH d AS (
          SELECT label::BIGINT AS doc_id,
                 list(embedding::DOUBLE[] ORDER BY vec_id) AS tokens
          FROM embeddings GROUP BY label
        )
        SELECT doc_id,
               round(list_sum(list_transform([{q_sql}], q ->
                 list_max(list_transform(tokens, t ->
                   list_sum(list_transform(list_zip(q, t),
                                           p -> p[1]*p[2])))))), 6) AS s
        FROM d
        """
        want = {r[0]: r[1] for r in duck.execute(sql).fetchall()}
        assert set(got) == set(want)
        bad = {k: (got[k], want[k]) for k in got if abs(got[k] - want[k]) > 1e-9}
        assert not bad, bad

    def test_rerank_equals_bruteforce_on_candidates_superset(
        self, spark, bags
    ):
        """Pooled-ANN candidates + MaxSim re-rank ≡ brute force when
        the candidate set covers the true top-k (here: all docs) —
        and the re-rank plan only scores the candidate join."""
        from lantern_spark.operators.maxsim import maxsim_search, pool_tokens

        brute = maxsim_search(
            bags, "tokens", "doc_id", QS, k=3, round_digits=6
        ).collect()
        cands = bags.select("doc_id")  # superset
        rer = maxsim_search(
            bags, "tokens", "doc_id", QS, k=3, candidates=cands,
            round_digits=6,
        ).collect()
        assert [tuple(r) for r in brute] == [tuple(r) for r in rer]
        # pooled representation is a flat vector usable by the index
        # families
        pooled = bags.select(
            "doc_id", pool_tokens("tokens", "mean").alias("v")
        ).first()
        assert len(pooled["v"]) == 64

    def test_two_stage_with_real_index(self, spark, sf_dir, tmp_path, bags):
        """End-to-end ColBERT serving shape: IVF over mean-pooled
        vectors generates candidates, MaxSim re-ranks."""
        from lantern_spark.operators.index import IVFIndex
        from lantern_spark.operators.maxsim import maxsim_search, pool_tokens

        pooled = bags.select(
            "doc_id", pool_tokens("tokens", "mean").alias("v")
        )
        idx = IVFIndex.build(
            pooled, "v", "doc_id", str(tmp_path / "pool"),
            metric="l2sq", nlist=2, seed=42,
        )
        cand = idx.search(spark, QS[0], k=5, nprobe=2).select("doc_id")
        out = maxsim_search(
            bags, "tokens", "doc_id", QS, k=3, candidates=cand,
            round_digits=6,
        ).collect()
        assert 1 <= len(out) <= 3
        assert out[0]["score"] >= out[-1]["score"]

    def test_pool_modes_and_errors(self, spark):
        from lantern_spark.operators.maxsim import (
            maxsim_score,
            maxsim_search,
            pool_tokens,
        )

        df = spark.createDataFrame(
            [(1, [[1.0, 4.0], [3.0, 2.0]])],
            "doc_id long, tokens array<array<float>>",
        )
        row = df.select(
            pool_tokens("tokens", "mean").alias("m"),
            pool_tokens("tokens", "max").alias("x"),
        ).first()
        assert row["m"] == [2.0, 3.0]
        assert row["x"] == [3.0, 4.0]
        with pytest.raises(ValueError, match="mode"):
            pool_tokens("tokens", "median")
        with pytest.raises(ValueError, match="metric"):
            maxsim_score("tokens", [[1.0, 0.0]], metric="l2")
        # empty-bag doc never displaces real results (NULLs last)
        df2 = spark.createDataFrame(
            [(1, [[1.0, 0.0]]), (2, [])],
            "doc_id long, tokens array<array<float>>",
        )
        got = maxsim_search(
            df2, "tokens", "doc_id", [[1.0, 0.0]], k=2
        ).collect()
        assert got[0]["doc_id"] == 1

    def test_plan_no_shuffle_before_topk(self, bags):
        from lantern_spark.operators.maxsim import maxsim_search

        out = maxsim_search(bags.select("doc_id", "tokens"), "tokens", "doc_id", QS, k=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
