"""Text tokenization / stemming / BM25 tests.

Golden fixtures ported from the reference:
- stemmers.rs:148-166 — text_to_stem_array golden
- bm25_agg.rs:583-710 — 4-doc corpus, "apple banana" → doc 2 first;
  rare term ("kiwi") scores above common ("apple"); unknown term → 0.
"""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from lantern_spark.functions.text import (
    STOPWORDS,
    duck_tokenize_sql,
    porter_stem,
    stem_token_list,
    text_to_stem_array,
    tokenize,
)
from lantern_spark.operators.bm25 import (
    build_bm25_stats,
    bm25_score_one,
    search_bm25,
)
from tests.conftest import assert_matches_oracle

DOCS = [
    (1, "apple banana orange"),
    (2, "apple apple banana"),
    (3, "banana banana orange"),
    (4, "kiwi pineapple banana"),
]


def test_porter_stem_goldens():
    # stemmers.rs:155-166
    assert porter_stem("jumps") == "jump"
    assert porter_stem("lazy") == "lazi"
    assert porter_stem("quick") == "quick"
    assert porter_stem("brown") == "brown"
    assert porter_stem("fox") == "fox"
    assert porter_stem("dog") == "dog"
    assert porter_stem("over") == "over"


def test_text_to_stem_array_golden(spark):
    # exact reference fixture (stemmers.rs:155)
    df = spark.createDataFrame(
        [Row(t="The` quick? brown-fox@ jumps  over the (lazy) [(!!@)] dog.")]
    )
    out = df.select(text_to_stem_array("t").alias("s")).first().s
    assert out == ["quick", "brown", "fox", "jump", "over", "lazi", "dog"]


def test_stopwords_filtered_after_stem():
    # 'these' stems to 'these'? verify filter applies to stemmed form
    assert "the" not in stem_token_list(["the", "apple"])
    assert stem_token_list(["apples"]) == ["appl"]


def test_tokenize_matches_duckdb(spark, duck, sf_dir):
    sdf = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", tokenize("text").alias("toks"))
        .select("doc_id", F.size("toks").alias("ntoks"), F.element_at("toks", 1).alias("first_tok"))
    )
    tok = duck_tokenize_sql("text")
    sql = f"""
        SELECT doc_id, len({tok}) AS ntoks, {tok}[1] AS first_tok
        FROM documents
    """
    assert_matches_oracle(sdf, duck, sql)


@pytest.fixture(scope="module")
def fruit_stats(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, content string")
    return build_bm25_stats(df, "doc_id", "content", stem=True)


def test_bm25_doc2_ranks_first(fruit_stats):
    # bm25_agg.rs:681-686
    res = search_bm25(fruit_stats, "apple banana", limit=10).collect()
    assert res[0].doc_id == 2, f"expected doc 2 first, got {res}"
    assert res[0].bm25_score > 0.0


def test_bm25_rare_term_beats_common(fruit_stats):
    # kiwi (df=1) must outscore apple (df=2) — bm25_agg.rs rare-term test
    kiwi = search_bm25(fruit_stats, "kiwi", limit=1).collect()[0]
    apple = search_bm25(fruit_stats, "apple", limit=1).collect()[0]
    assert kiwi.bm25_score > apple.bm25_score


def test_bm25_unknown_term_empty(fruit_stats):
    res = search_bm25(fruit_stats, "pomegranate", limit=10).collect()
    assert res == []


def test_bm25_score_math_exact(fruit_stats):
    """Recompute doc 2's score for 'apple banana' by hand (reference
    formula bm25_agg.rs:139-151) and compare."""
    res = {r.doc_id: r.bm25_score for r in search_bm25(fruit_stats, "apple banana", limit=10).collect()}
    n, avg = 4, 3.0
    k1, b = 1.2, 0.75

    def idf(df_):
        return math.log((n - df_ + 0.5) / (df_ + 0.5) + 1)

    def ts(fq, df_, dl):
        return idf(df_) * fq * (k1 + 1) / (fq + k1 * (1 - b + b * dl / avg))

    # doc2 = [appl, appl, banana]; apple df=2, banana df=4
    expected = ts(2, 2, 3) + ts(1, 4, 3)
    assert res[2] == pytest.approx(expected, rel=1e-9)


def test_bm25_score_one_helper(fruit_stats):
    s = bm25_score_one(fruit_stats, ["appl", "appl", "banana"], ["appl", "banana"])
    res = {r.doc_id: r.bm25_score for r in search_bm25(fruit_stats, "apple banana", limit=10).collect()}
    assert s == pytest.approx(res[2], rel=1e-9)


def test_bm25_term_table_shape(fruit_stats):
    # reference-shaped arrays table (bm25_api.sql:33-46)
    rows = {r.term: r for r in fruit_stats.term_table().collect()}
    assert rows["banana"].term_freq == 4
    assert rows["banana"].doc_ids == [1, 2, 3, 4]
    assert rows["appl"].doc_ids == [1, 2]
    assert rows["appl"].fqs == [1, 2]
    assert rows["appl"].doc_lens == [3, 3]


def test_bm25_oracle_on_documents(spark, duck, sf_dir):
    """Full BM25 search (no stem) vs a from-scratch DuckDB oracle."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats = build_bm25_stats(docs, "doc_id", "text", stem=False)
    sdf = search_bm25(stats, "spark join vector", limit=20, stem=False, round_digits=6)
    tok = duck_tokenize_sql("text")
    sql = f"""
        WITH tl AS (
          SELECT doc_id, {tok} AS toks, len({tok}) AS doc_len FROM documents
        ),
        postings AS (
          SELECT term, doc_id, count(*) AS fq, any_value(doc_len) AS doc_len
          FROM (SELECT doc_id, doc_len, unnest(toks) AS term FROM tl)
          GROUP BY term, doc_id
        ),
        corpus AS (SELECT count(*) AS num_docs, avg(doc_len) AS avg_doc_len FROM tl),
        q AS (SELECT unnest(['spark','join','vector']) AS term),
        dfreq AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
        scored AS (
          SELECT p.doc_id,
            ln((c.num_docs - d.df + 0.5)/(d.df + 0.5) + 1.0)
              * (p.fq * 2.2) / (p.fq + 1.2*(1 - 0.75 + 0.75*p.doc_len/c.avg_doc_len)) AS s
          FROM postings p JOIN q USING(term) JOIN dfreq d USING(term) CROSS JOIN corpus c
        )
        SELECT doc_id, round(sum(s), 6) AS bm25_score
        FROM scored GROUP BY doc_id
        ORDER BY bm25_score DESC, doc_id LIMIT 20
    """
    assert_matches_oracle(sdf, duck, sql)


class TestUserStopwords:
    def test_set_get_and_tokenize(self, spark):
        from lantern_spark.functions.text import (
            get_user_stopwords,
            set_user_stopwords,
            tokenize,
        )
        from pyspark.sql import functions as F

        try:
            set_user_stopwords(["foo", "BAR"])
            assert get_user_stopwords() == ["bar", "foo"]
            df = spark.createDataFrame(
                [("the foo jumps over bar quickly",)], "t string"
            )
            toks = df.select(
                tokenize("t", drop_stopwords=True).alias("toks")
            ).first()["toks"]
            assert "foo" not in toks and "bar" not in toks
            assert "jumps" in toks and "quickly" in toks
        finally:
            set_user_stopwords([])


class TestBM25Merge:
    def test_merge_equals_full_build(self, spark, sf_dir):
        """consolidate analog: stats built on two halves then merged
        must rank identically to a single full build."""
        from pyspark.sql import functions as F

        from lantern_spark.operators.bm25 import (
            build_bm25_stats,
            merge_bm25_stats,
            search_bm25,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        full = build_bm25_stats(docs, "doc_id", "text", stem=False)
        h1 = build_bm25_stats(
            docs.filter(F.col("doc_id") % 2 == 0), "doc_id", "text", stem=False
        )
        h2 = build_bm25_stats(
            docs.filter(F.col("doc_id") % 2 == 1), "doc_id", "text", stem=False
        )
        merged = merge_bm25_stats(h1, h2)
        q = "data model spark"
        a = search_bm25(full, q, limit=10, stem=False, round_digits=6).collect()
        b = search_bm25(merged, q, limit=10, stem=False, round_digits=6).collect()
        assert [(r["doc_id"], r["bm25_score"]) for r in a] == [
            (r["doc_id"], r["bm25_score"]) for r in b
        ]


class TestBM25Approx:
    """Hot-term bloom approximation tier (bm25_agg.rs:161-216 +
    finalize_base:314-355; threshold GUC lib.rs:46,142-150)."""

    def test_tier_inactive_matches_exact(self, fruit_stats):
        from lantern_spark.operators.bm25 import (
            search_bm25,
            search_bm25_approx,
        )

        exact = search_bm25(
            fruit_stats, "apple banana", limit=10, round_digits=6
        ).collect()
        approx = search_bm25_approx(
            fruit_stats, "apple banana", limit=10, threshold=1000,
            round_digits=6,
        ).collect()
        assert [(r.doc_id, r.bm25_score) for r in exact] == [
            (r.doc_id, r.bm25_score) for r in approx
        ]

    def test_hot_term_blend_golden(self, fruit_stats):
        """threshold=3 makes banana (df=4) hot and appl (df=2) cold.
        Expected scores computed by hand: exact cold partial + the
        constant bm25(fq=1, doc_len=avg_doc_len) = idf(df_hot) for
        every candidate doc containing banana (bloom has no false
        negatives; all 4 docs contain banana)."""
        from lantern_spark.operators.bm25 import search_bm25_approx

        res = {
            r.doc_id: r.bm25_score
            for r in search_bm25_approx(
                fruit_stats, "apple banana", limit=10, threshold=3
            ).collect()
        }
        n, avg, k1, b = 4, 3.0, 1.2, 0.75

        def idf(df_):
            return math.log((n - df_ + 0.5) / (df_ + 0.5) + 1)

        def ts(fq, df_, dl):
            return idf(df_) * fq * (k1 + 1) / (fq + k1 * (1 - b + b * dl / avg))

        const = idf(4) * (k1 + 1) / (1 + k1)  # = idf(4)
        # candidates come from the cold term 'appl' (docs 1 and 2)
        assert set(res) == {1, 2}
        assert res[2] == pytest.approx(ts(2, 2, 3) + const, rel=1e-6)
        assert res[1] == pytest.approx(ts(1, 2, 3) + const, rel=1e-6)

    def test_hot_term_no_false_negatives(self, spark):
        """Every candidate doc that truly contains the hot term gets
        the constant added (bloom false negatives are impossible);
        docs NOT containing it can only gain, never lose (false
        positives only add)."""
        from lantern_spark.operators.bm25 import (
            build_bm25_stats,
            search_bm25,
            search_bm25_approx,
        )

        rows = [(i, "common " + ("rare " if i < 3 else "filler")) for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        stats = build_bm25_stats(df, "doc_id", "text", stem=False)
        # 'common' df=30 hot at threshold 10; 'rare' df=3 cold
        approx = {
            r.doc_id: r.bm25_score
            for r in search_bm25_approx(
                stats, "rare common", limit=10, threshold=10,
                stem=False,
            ).collect()
        }
        cold_only = {
            r.doc_id: r.bm25_score
            for r in search_bm25(
                stats, "rare", limit=100, stem=False
            ).collect()
        }
        assert set(approx) <= set(cold_only)
        for doc_id, score in approx.items():
            assert score > cold_only[doc_id]  # constant was added

    def test_pure_hot_query_falls_back_exact(self, fruit_stats):
        from lantern_spark.operators.bm25 import (
            search_bm25,
            search_bm25_approx,
        )

        exact = search_bm25(
            fruit_stats, "banana", limit=10, round_digits=6
        ).collect()
        approx = search_bm25_approx(
            fruit_stats, "banana", limit=10, threshold=3, round_digits=6
        ).collect()
        assert [(r.doc_id, r.bm25_score) for r in exact] == [
            (r.doc_id, r.bm25_score) for r in approx
        ]

    def test_prebuilt_blooms_used(self, fruit_stats):
        """Passing the persisted build-time bloom table yields the
        same result as deriving blooms on the fly."""
        from lantern_spark.operators.bm25 import (
            hot_term_blooms,
            search_bm25_approx,
        )

        blooms = hot_term_blooms(fruit_stats, threshold=3)
        rows = blooms.collect()
        assert [r["term"] for r in rows] == ["banana"]
        assert rows[0]["df"] == 4
        a = search_bm25_approx(
            fruit_stats, "apple banana", limit=10, threshold=3,
            round_digits=6,
        ).collect()
        b = search_bm25_approx(
            fruit_stats, "apple banana", limit=10, threshold=3,
            blooms=blooms, round_digits=6,
        ).collect()
        assert [(r.doc_id, r.bm25_score) for r in a] == [
            (r.doc_id, r.bm25_score) for r in b
        ]

    def test_stale_blooms_never_empty_the_result(self, fruit_stats):
        """A caller-supplied blooms table missing the currently-hot
        term (built at a higher threshold / before the corpus grew)
        must NOT wipe the exact candidates — the missing bloom is
        derived on the fly and the result matches blooms=None (the
        review finding: the crossJoin with an empty hot side returned
        zero rows)."""
        from lantern_spark.operators.bm25 import (
            hot_term_blooms,
            search_bm25_approx,
        )

        stale = hot_term_blooms(fruit_stats, threshold=1000)  # empty
        assert stale.count() == 0
        want = search_bm25_approx(
            fruit_stats, "apple banana", limit=10, threshold=3,
            round_digits=6,
        ).collect()
        got = search_bm25_approx(
            fruit_stats, "apple banana", limit=10, threshold=3,
            blooms=stale, round_digits=6,
        ).collect()
        assert len(got) > 0
        assert [(r.doc_id, r.bm25_score) for r in got] == [
            (r.doc_id, r.bm25_score) for r in want
        ]

    def test_approx_plan_shape(self, fruit_stats):
        """The blend stage must broadcast the (few) hot-term blooms
        against the bounded candidate pool — no shuffle of bloom bytes,
        no explode of member ids (the r2 O(n²)-bytes shape)."""
        from lantern_spark.operators.bm25 import search_bm25_approx

        df = search_bm25_approx(
            fruit_stats, "apple banana", limit=10, threshold=3
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the only explode allowed is the postings-build tokenizer;
        # member doc_ids must never explode against the bloom bytes
        assert "explode(doc_ids" not in plan
        assert "explode(__doc_ids" not in plan
        assert "BroadcastExchange" in plan

    def test_threshold_guc_range(self):
        from lantern_spark.operators.bm25 import (
            get_bm25_approximation_threshold,
            set_bm25_approximation_threshold,
        )

        assert get_bm25_approximation_threshold() == 8000
        with pytest.raises(ValueError, match="GUC range"):
            set_bm25_approximation_threshold(100)
        with pytest.raises(ValueError, match="GUC range"):
            set_bm25_approximation_threshold(200_000)
        set_bm25_approximation_threshold(5000)
        assert get_bm25_approximation_threshold() == 5000
        set_bm25_approximation_threshold(8000)


class TestMaskedExplain:
    def test_masks_vector_literals(self, spark, sf_dir):
        from lantern_spark.functions.distances import l2sq_dist
        from lantern_spark.functions.vectors import vec_lit
        from lantern_spark.plans.explain import masked_explain, physical_summary

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        df = (
            emb.withColumn("d", l2sq_dist("embedding", vec_lit([0.25] * 64)))
            .orderBy("d")
            .limit(5)
        )
        text = masked_explain(df)
        assert "[…vector…]" in text
        assert "0.25, 0.25, 0.25" not in text
        summary = physical_summary(df)
        assert summary["take_ordered"] is True
        assert summary["python_evals"] == 0


class TestModelSpeed:
    def test_measure_model_speed(self, spark, sf_dir):
        from lantern_spark.operators.embed import RuntimeSpec, measure_model_speed

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        rep = measure_model_speed(
            docs, "text", RuntimeSpec(name="hash", dim=16), sample_rows=200
        )
        assert rep["rows"] == 200 and rep["rows_per_sec"] > 0


class TestStatsForDerivedCorpus:
    """r14 optimization: the cached query-path stats derive the corpus
    row from the materialized postings + two cheap counts instead of a
    second full tokenize pass — values must be identical to
    build_bm25_stats' own corpus aggregate, including NULL-text docs
    (counted in num_docs, excluded from avg's divisor) and empty-token
    docs (counted in the divisor at length 0)."""

    def test_matches_build_corpus(self, spark, sf_dir):
        from lantern_spark.operators.bm25 import build_bm25_stats
        from lantern_spark.queries import text as QT
        from lantern_spark.queries.common import load_table

        docs = load_table(spark, sf_dir, "documents")
        orig = build_bm25_stats(
            docs, "doc_id", "text", stem=False
        ).corpus.first()
        QT._STATS_CACHE.pop((sf_dir, False), None)
        new = QT._stats_for(spark, sf_dir, stem=False).corpus.first()
        assert new["num_docs"] == orig["num_docs"]
        assert new["avg_doc_len"] == orig["avg_doc_len"]

    def test_null_and_empty_text_edge(self, spark):
        from pyspark.sql import functions as F

        from lantern_spark.operators.bm25 import build_bm25_stats

        d = spark.createDataFrame(
            [(1, "a b"), (2, None), (3, "")],
            "doc_id long, text string",
        )
        st = build_bm25_stats(d, "doc_id", "text", stem=False)
        orig = st.corpus.first()
        n_docs = d.count()
        n_len = d.where(F.col("text").isNotNull()).count()
        den = (
            F.lit(float(n_len)) if n_len else F.lit(None).cast("double")
        )
        derived = (
            st.postings.agg(F.sum("fq").cast("double").alias("s"))
            .select(
                F.lit(int(n_docs)).cast("long").alias("num_docs"),
                (F.col("s") / den).alias("avg_doc_len"),
            )
            .first()
        )
        assert derived["num_docs"] == orig["num_docs"] == 3
        assert derived["avg_doc_len"] == orig["avg_doc_len"] == 1.0
