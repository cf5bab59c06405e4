"""Stupid-backoff n-gram LM: hand-computed score parity, backoff
behavior, perplexity ordering, persistence, count pruning."""

import math

import pytest
from pyspark.sql import functions as F

from lantern_spark.operators.ngram_lm import (
    BOS,
    EOS,
    NGramLM,
    train_ngram_lm,
)


@pytest.fixture(scope="module")
def lm_and_corpus(spark, tmp_path_factory):
    rows = [
        (0, "the cat sat"),
        (1, "the cat ran"),
        (2, "the dog sat"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path_factory.mktemp("lm"))
    lm = train_ngram_lm(corpus, "text", path, n=2, alpha=0.4)
    return lm, corpus


class TestTraining:
    def test_counts_by_hand(self, spark, lm_and_corpus):
        lm, _ = lm_and_corpus
        c = {
            (r["order"], r["gram"]): r["c"]
            for r in lm.counts(spark).collect()
        }
        # unigrams: the×3, cat×2, sat×2, ran, dog, <s>×3, </s>×3
        assert c[(1, "the")] == 3
        assert c[(1, "cat")] == 2
        assert c[(1, BOS)] == 3
        assert c[(1, EOS)] == 3
        # bigrams
        assert c[(2, f"{BOS} the")] == 3
        assert c[(2, "the cat")] == 2
        assert c[(2, "cat sat")] == 1
        assert c[(2, f"sat {EOS}")] == 2
        # total excludes BOS: 3+2+2+1+1+3 = 12
        assert lm.total_tokens == 12

    def test_min_count_prunes(self, spark, tmp_path):
        corpus = spark.createDataFrame(
            [(0, "a a a b")], "doc_id long, text string"
        )
        lm = train_ngram_lm(
            corpus, "text", str(tmp_path), n=2, min_count=2
        )
        grams = {
            (r["order"], r["gram"]) for r in lm.counts(spark).collect()
        }
        assert (1, "a") in grams and (1, "b") not in grams
        assert (2, "a a") in grams


class TestScoring:
    def test_hand_computed_logprob(self, spark, lm_and_corpus):
        """Score 'the cat sat' under the bigram model by hand:
        S(the|<s>) = 3/3, S(cat|the) = 2/3, S(sat|cat) = 1/2,
        S(</s>|sat) = 2/2 → logprob = log10(1 · 2/3 · 1/2 · 1)."""
        lm, corpus = lm_and_corpus
        got = {
            r["doc_id"]: r
            for r in lm.score_docs(corpus, "text", "doc_id").collect()
        }
        want = math.log10(1.0) + math.log10(2 / 3) + math.log10(0.5) \
            + math.log10(1.0)
        assert got[0]["n_scored"] == 4  # 3 words + </s>
        assert got[0]["logprob"] == pytest.approx(want, rel=1e-9)
        assert got[0]["ppl"] == pytest.approx(
            10 ** (-want / 4), rel=1e-9
        )

    def test_backoff_applies_alpha(self, spark, lm_and_corpus):
        """'the dog ran' — bigram (dog ran) unseen → alpha · S(ran) =
        0.4 · 1/12; (ran </s>) seen (from doc 1)."""
        lm, _ = lm_and_corpus
        df = spark.createDataFrame(
            [(9, "the dog ran")], "doc_id long, text string"
        )
        r = lm.score_docs(df, "text", "doc_id").first()
        want = (
            math.log10(1.0)  # S(the|<s>) = 3/3
            + math.log10(1 / 3)  # S(dog|the) = 1/3
            + math.log10(0.4 * (1 / 12))  # backoff to unigram ran
            + math.log10(1.0)  # S(</s>|ran) = 1/1
        )
        assert r["logprob"] == pytest.approx(want, rel=1e-9)

    def test_oov_floor_not_zero(self, spark, lm_and_corpus):
        lm, _ = lm_and_corpus
        df = spark.createDataFrame(
            [(9, "zebra quux")], "doc_id long, text string"
        )
        r = lm.score_docs(df, "text", "doc_id").first()
        assert math.isfinite(r["logprob"])  # floored, not log(0)
        assert r["ppl"] > 10  # way out of domain

    def test_perplexity_orders_quality(self, spark, tmp_path):
        """In-domain text scores lower ppl than shuffled words than
        OOV gibberish — the property the CCNet filter relies on."""
        train = spark.createDataFrame(
            [
                (i, "the quick brown fox jumps over the lazy dog")
                for i in range(5)
            ]
            + [(9, "the lazy dog sleeps while the quick fox runs")],
            "doc_id long, text string",
        )
        lm = train_ngram_lm(train, "text", str(tmp_path), n=3)
        probe = spark.createDataFrame(
            [
                (0, "the quick brown fox jumps"),
                (1, "dog brown the jumps fox"),  # same words, shuffled
                (2, "zxq wvu tsr qpo nml"),  # OOV gibberish
            ],
            "doc_id long, text string",
        )
        ppl = {
            r["doc_id"]: r["ppl"]
            for r in lm.score_docs(probe, "text", "doc_id").collect()
        }
        assert ppl[0] < ppl[1] < ppl[2]

    def test_filter_keeps_head(self, spark, tmp_path):
        train = spark.createDataFrame(
            [(i, "good clean sentence here") for i in range(4)],
            "doc_id long, text string",
        )
        lm = train_ngram_lm(train, "text", str(tmp_path), n=2)
        mixed = spark.createDataFrame(
            [(0, "good clean sentence here"), (1, "xyzzy plugh foo")],
            "doc_id long, text string",
        )
        in_dom = lm.score_docs(
            mixed.where("doc_id = 0"), "text", "doc_id"
        ).first()["ppl"]
        kept = lm.perplexity_filter(
            mixed, "text", "doc_id", max_ppl=in_dom * 2
        ).collect()
        assert [r["doc_id"] for r in kept] == [0]

    def test_keep_unscored_passes_null_text_through(self, spark, tmp_path):
        """Default: NULL-text rows are dropped (unscoreable ≠
        in-domain). keep_unscored=True left-joins them through with
        ppl NULL (ADVICE r6)."""
        train = spark.createDataFrame(
            [(i, "good clean sentence here") for i in range(4)],
            "doc_id long, text string",
        )
        lm = train_ngram_lm(train, "text", str(tmp_path), n=2)
        mixed = spark.createDataFrame(
            [(0, "good clean sentence here"), (1, None)],
            "doc_id long, text string",
        )
        default_ids = {
            r["doc_id"]
            for r in lm.perplexity_filter(
                mixed, "text", "doc_id", max_ppl=1e9
            ).collect()
        }
        assert default_ids == {0}
        kept = lm.perplexity_filter(
            mixed, "text", "doc_id", max_ppl=1e9, keep_unscored=True
        ).collect()
        assert {r["doc_id"] for r in kept} == {0, 1}
        assert [r["ppl"] for r in kept if r["doc_id"] == 1] == [None]

    def test_save_load_roundtrip(self, spark, lm_and_corpus):
        lm, corpus = lm_and_corpus
        re_lm = NGramLM.load(lm.path)
        assert (re_lm.n, re_lm.total_tokens, re_lm.alpha) == (
            lm.n,
            lm.total_tokens,
            lm.alpha,
        )
        a = lm.score_docs(corpus, "text", "doc_id").collect()
        b = re_lm.score_docs(corpus, "text", "doc_id").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_no_python_eval_in_plan(self, spark, lm_and_corpus):
        """The whole scoring pipeline is Catalyst exprs + joins — no
        Python UDF boundary (the 100 TB contract)."""
        lm, corpus = lm_and_corpus
        plan = (
            lm.score_docs(corpus, "text", "doc_id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "EvalPython" not in plan


class TestWindowKernel:
    def test_null_and_short_inputs_yield_no_grams(self, spark):
        """The shared ngram_windows guard: NULL and sub-width token
        arrays produce EMPTY windows — the naive sequence bound would
        emit junk [1,0]-descending slices into the counts table."""
        from lantern_spark.functions.text import ngram_windows

        df = spark.createDataFrame(
            [(0, ["a", "b", "c"]), (1, ["a"]), (2, None)],
            "i long, toks array<string>",
        )
        got = {
            r["i"]: r["g"]
            for r in df.select(
                "i", ngram_windows(F.col("toks"), 2).alias("g")
            ).collect()
        }
        assert got[0] == ["a b", "b c"]
        assert got[1] == []
        assert got[2] == []

    def test_null_text_does_not_pollute_counts(self, spark, tmp_path):
        corpus = spark.createDataFrame(
            [(0, "a b a b"), (1, None)], "doc_id long, text string"
        )
        lm = train_ngram_lm(corpus, "text", str(tmp_path), n=2)
        grams = [r["gram"] for r in lm.counts(spark).collect()]
        assert all(g is not None for g in grams)


class TestPplBuckets:
    """CCNet head/middle/tail bucketing: per-group quantile cutoffs,
    NULL-safe, composable with the mixture machinery."""

    def _scored(self, spark):
        rows = []
        # language A: ppl 1..90; language B: ppl 1001..1090 — what is
        # 'head' must be RELATIVE to the language, not global
        for i in range(90):
            rows.append((i, "a", float(i + 1)))
        for i in range(90):
            rows.append((100 + i, "b", float(1001 + i)))
        rows.append((999, "a", None))  # unscoreable
        return spark.createDataFrame(
            rows, "doc_id long, lang string, ppl double"
        )

    def test_per_group_thirds(self, spark):
        from pyspark.sql import functions as F

        from lantern_spark.operators.ngram_lm import ppl_buckets

        out = ppl_buckets(self._scored(spark), group_col="lang")
        counts = {
            (r.lang, r.ppl_bucket): r["count"]
            for r in out.groupBy("lang", "ppl_bucket").count().collect()
        }
        for lang in ("a", "b"):
            for b in ("head", "middle", "tail"):
                assert 25 <= counts[(lang, b)] <= 35, (lang, b, counts)
        # head really is the LOW-ppl side, per language
        agg = {
            (r.lang, r.ppl_bucket): r.mx
            for r in out.where(F.col("ppl").isNotNull())
            .groupBy("lang", "ppl_bucket")
            .agg(F.max("ppl").alias("mx"))
            .collect()
        }
        assert agg[("a", "head")] < agg[("a", "middle")] < agg[("a", "tail")]
        assert agg[("b", "head")] < agg[("b", "middle")] < agg[("b", "tail")]
        assert agg[("b", "head")] > agg[("a", "tail")]  # grouping mattered

    def test_null_ppl_gets_null_bucket(self, spark):
        from lantern_spark.operators.ngram_lm import ppl_buckets

        out = ppl_buckets(self._scored(spark), group_col="lang")
        row = out.where("doc_id = 999").first()
        assert row.ppl_bucket is None

    def test_global_mode_and_label_validation(self, spark):
        import pytest

        from lantern_spark.operators.ngram_lm import ppl_buckets

        out = ppl_buckets(self._scored(spark))
        assert set(
            r.ppl_bucket for r in out.where("ppl is not null").collect()
        ) == {"head", "middle", "tail"}
        with pytest.raises(ValueError, match="labels"):
            ppl_buckets(self._scored(spark), labels=("only", "two"))

    def test_composes_with_mixture(self, spark):
        from pyspark.sql import functions as F

        from lantern_spark.operators.ngram_lm import ppl_buckets
        from lantern_spark.operators.pack import mixture_sample

        out = ppl_buckets(self._scored(spark), group_col="lang").where(
            F.col("ppl_bucket").isNotNull()
        )
        # CCNet recipe: all of head, half of middle, no tail
        kept = mixture_sample(
            out, "ppl_bucket", "doc_id",
            {"head": 1.0, "middle": 0.5, "tail": 0.0},
        )
        got = {
            r.ppl_bucket: r["count"]
            for r in kept.groupBy("ppl_bucket").count().collect()
        }
        assert "tail" not in got
        assert got["head"] >= 55  # all of both languages' heads
        assert 10 <= got.get("middle", 0) <= 50

    def test_null_group_keeps_its_own_cutoffs(self, spark):
        from lantern_spark.operators.ngram_lm import ppl_buckets

        rows = [(i, None, float(i + 1)) for i in range(90)]
        rows += [(100 + i, "None", float(1001 + i)) for i in range(90)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, ppl double")
        out = ppl_buckets(df, group_col="lang")
        assert out.count() == 180  # no duplication from a 'None' clash
        got = {
            (r.lang, r.ppl_bucket): r["count"]
            for r in out.groupBy("lang", "ppl_bucket").count().collect()
        }
        # the NULL-lang group got its OWN thirds, not blanket 'tail'
        for lang in (None, "None"):
            for b in ("head", "middle", "tail"):
                assert 25 <= got[(lang, b)] <= 35, (lang, b, got)
