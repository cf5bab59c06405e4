"""Training-set assembly: hash splits, mixture sampling, packing."""

import pytest
from pyspark.sql import functions as F

from lantern_spark.operators.pack import (
    hash_split,
    mixture_sample,
    pack_sequences,
    pack_stats,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


class TestHashSplit:
    def test_fractions_and_determinism(self, docs):
        out = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        counts = {
            r["split"]: r["n"]
            for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
        }
        n = docs.count()
        assert set(counts) == {"train", "val", "test"}
        assert counts["train"] / n == pytest.approx(0.8, abs=0.1)
        # deterministic: identical assignment on re-run
        a = {(r["doc_id"], r["split"]) for r in out.collect()}
        b = {
            (r["doc_id"], r["split"])
            for r in hash_split(
                docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
            ).collect()
        }
        assert a == b

    def test_salt_changes_assignment(self, docs):
        a = {
            (r["doc_id"], r["split"])
            for r in hash_split(docs, "doc_id", {"a": 0.5, "b": 0.5}).collect()
        }
        c = {
            (r["doc_id"], r["split"])
            for r in hash_split(
                docs, "doc_id", {"a": 0.5, "b": 0.5}, salt="epoch2"
            ).collect()
        }
        assert a != c

    def test_bad_fractions_raise(self, docs):
        with pytest.raises(ValueError, match="sum to 1"):
            hash_split(docs, "doc_id", {"a": 0.5, "b": 0.2})

    def test_split_is_map_only(self, docs):
        out = hash_split(docs, "doc_id", {"a": 0.5, "b": 0.5})
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "EvalPython" not in plan


class TestMixtureSample:
    def test_rates_respected(self, docs):
        rates = {"web": 0.3, "wiki": 1.0}
        out = mixture_sample(docs, "source", "doc_id", rates, default_rate=0.5)
        n_in = {
            r["source"]: r["n"]
            for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        n_out = {
            r["source"]: r["n"]
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        for src, n in n_in.items():
            rate = rates.get(src, 0.5)
            kept = n_out.get(src, 0)
            assert kept / n == pytest.approx(rate, abs=0.25)
        # deterministic
        a = {r["doc_id"] for r in out.collect()}
        b = {
            r["doc_id"]
            for r in mixture_sample(
                docs, "source", "doc_id", rates, default_rate=0.5
            ).collect()
        }
        assert a == b


class TestPackSequences:
    def test_partition_and_budget_contract(self, spark):
        rows = [(i, " ".join(["w"] * t)) for i, t in enumerate([60, 60, 60, 30, 250, 10])]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        packed = pack_sequences(df, "text", "doc_id", max_tokens=100, chunks=1)
        got = {r["doc_id"]: r["pack_id"] for r in packed.collect()}
        assert len(got) == 6  # every doc in exactly one pack
        # start-offset binning: totals exceed the budget by < one doc
        stats = pack_stats(packed, "text").collect()
        for r in stats:
            assert r["total_tokens"] < 2 * 100 + 250  # bounded overflow
        # docs 0,1 start at offsets 0 and 60 → same bin; doc 2 starts
        # at 120 → next bin
        assert got[0] == got[1]
        assert got[1] != got[2]

    def test_deterministic_and_complete(self, docs):
        a = {(r["doc_id"], r["pack_id"]) for r in pack_sequences(docs, "text", "doc_id", 512).collect()}
        b = {(r["doc_id"], r["pack_id"]) for r in pack_sequences(docs, "text", "doc_id", 512).collect()}
        assert a == b
        assert len(a) == docs.count()

    def test_fill_rate_reasonable(self, docs):
        packed = pack_sequences(docs, "text", "doc_id", max_tokens=2048, chunks=8)
        stats = pack_stats(packed, "text")
        row = stats.agg(F.avg("total_tokens").alias("avg")).first()
        # multi-doc bins fill near the budget (docs are ~100-500 toks)
        assert row["avg"] > 1024

    def test_pack_stats_reports_in_the_packing_unit(self, docs):
        """r10 (review r9 nit 1): pack_stats accepts the same
        token_count the bins were built with, so fill rates and bin
        budgets share a unit — a 2× counter doubles total_tokens bin
        for bin, never silently reverting to whitespace counts."""
        from lantern_spark.operators.textstats import token_count_ws

        tc = token_count_ws("text") * 2
        packed = pack_sequences(
            docs, "text", "doc_id", max_tokens=2048, chunks=8,
            token_count=tc,
        )
        ws = {
            r["pack_id"]: r["total_tokens"]
            for r in pack_stats(packed, "text").collect()
        }
        custom = {
            r["pack_id"]: r["total_tokens"]
            for r in pack_stats(packed, "text", token_count=tc).collect()
        }
        assert set(ws) == set(custom)
        assert all(custom[k] == 2 * ws[k] for k in ws)

    def test_one_shuffle(self, docs):
        packed = pack_sequences(docs, "text", "doc_id", 512, chunks=8)
        plan = packed._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange ") <= 1


class TestTokenBudgetSampling:
    def _corpus(self, spark):
        rows = []
        for i in range(300):
            src = ["web", "code", "wiki"][i % 3]
            rows.append((i, src, 10 + (i % 7)))  # tokens 10..16
        return spark.createDataFrame(rows, "doc_id long, source string, n_tok int")

    def test_expected_mode_hits_budget(self, spark):
        from pyspark.sql import functions as F

        from lantern_spark.operators.pack import sample_to_token_budget

        df = self._corpus(spark)
        budgets = {"web": 400.0, "code": 200.0}
        out = sample_to_token_budget(
            df, "source", "doc_id", budgets, token_count="n_tok"
        )
        got = {
            r["source"]: r["t"]
            for r in out.groupBy("source").agg(F.sum("n_tok").alias("t")).collect()
        }
        # wiki unbudgeted: kept whole (100 docs * ~13 tokens)
        assert got["wiki"] == df.filter("source='wiki'").agg(F.sum("n_tok")).first()[0]
        # budgeted sources land near budget (expectation; generous band)
        assert 0.4 * 400 <= got.get("web", 0) <= 1.8 * 400
        assert 0.4 * 200 <= got.get("code", 0) <= 1.8 * 200

    def test_exact_mode_overshoot_below_one_doc(self, spark):
        from pyspark.sql import functions as F

        from lantern_spark.operators.pack import sample_to_token_budget

        df = self._corpus(spark)
        budgets = {"web": 333.0, "code": 150.0}
        out = sample_to_token_budget(
            df, "source", "doc_id", budgets, token_count="n_tok", exact=True
        )
        got = {
            r["source"]: r["t"]
            for r in out.groupBy("source").agg(F.sum("n_tok").alias("t")).collect()
        }
        for s, b in budgets.items():
            assert got[s] >= b  # admitted while under budget
            assert got[s] < b + 16  # overshoot < max doc tokens

    def test_deterministic_and_drop_unbudgeted(self, spark):
        from lantern_spark.operators.pack import sample_to_token_budget

        df = self._corpus(spark)
        kw = dict(budgets={"web": 300.0}, token_count="n_tok",
                  exact=True, keep_unbudgeted=False)
        a = sorted(r["doc_id"] for r in sample_to_token_budget(
            df, "source", "doc_id", **kw).collect())
        b = sorted(r["doc_id"] for r in sample_to_token_budget(
            df.repartition(7), "source", "doc_id", **kw).collect())
        assert a == b and len(a) > 0
        srcs = {r["source"] for r in sample_to_token_budget(
            df, "source", "doc_id", **kw).select("source").distinct().collect()}
        assert srcs == {"web"}

    def test_budget_above_total_keeps_everything(self, spark):
        from lantern_spark.operators.pack import sample_to_token_budget

        df = self._corpus(spark)
        out = sample_to_token_budget(
            df, "source", "doc_id", {"web": 1e9}, token_count="n_tok"
        )
        assert out.count() == df.count()


class TestUpsampling:
    """Multi-epoch upsampling: budgets larger than a source repeat it
    (rate = k + f -> k copies + one at probability f), map-only."""

    def _docs(self, spark):
        rows = [(i, "small", " ".join(f"s{i}w{j}" for j in range(10)))
                for i in range(40)]
        rows += [(100 + i, "big", " ".join(f"b{i}w{j}" for j in range(10)))
                 for i in range(200)]
        return spark.createDataFrame(rows, "doc_id long, source string, text string")

    def test_rates_cap_vs_upsample(self, spark):
        from lantern_spark.operators.pack import rates_for_token_budgets
        from lantern_spark.operators.textstats import token_count_ws

        docs = self._docs(spark)
        tc = token_count_ws("text")
        capped = rates_for_token_budgets(
            docs, "source", {"small": 1000.0}, tc
        )
        assert capped["small"] == 1.0  # 400 tokens available, capped
        up = rates_for_token_budgets(
            docs, "source", {"small": 1000.0}, tc, allow_upsample=True
        )
        assert abs(up["small"] - 2.5) < 1e-9
        assert rates_for_token_budgets(
            docs, "source", {"small": 1e12}, tc,
            allow_upsample=True, max_rate=8.0,
        )["small"] == 8.0

    def test_upsample_hits_budget_in_expectation(self, spark):
        from lantern_spark.operators.pack import sample_to_token_budget
        from lantern_spark.operators.textstats import token_count_ws
        from pyspark.sql import functions as F

        docs = self._docs(spark)
        tc = token_count_ws("text")
        out = sample_to_token_budget(
            docs, "source", "doc_id",
            {"small": 1000.0, "big": 500.0}, tc,
            allow_upsample=True,
        )
        got = {
            r["source"]: r["t"]
            for r in out.groupBy("source").agg(F.sum(tc).alias("t")).collect()
        }
        # small upsampled toward 1000 (2-3 epochs/doc), big downsampled
        # toward 500; expectation-exact with ~1/sqrt(n) noise
        assert 700 <= got["small"] <= 1300
        assert 300 <= got["big"] <= 700
        # epochs tagged: every small doc appears with epoch 0..k
        eps = out.where(F.col("source") == "small").groupBy("doc_id").count()
        assert eps.agg(F.min("count")).first()[0] >= 2
        unb = out.where(F.col("source") == "big").select("epoch").distinct().collect()
        assert {r.epoch for r in unb} <= {0, 1}

    def test_deterministic_and_unbudgeted_epoch0(self, spark):
        from lantern_spark.operators.pack import sample_to_token_budget
        from lantern_spark.operators.textstats import token_count_ws
        from pyspark.sql import functions as F

        docs = self._docs(spark)
        tc = token_count_ws("text")
        kwargs = dict(allow_upsample=True)
        a = sample_to_token_budget(
            docs, "source", "doc_id", {"small": 900.0}, tc, **kwargs
        )
        b = sample_to_token_budget(
            docs, "source", "doc_id", {"small": 900.0}, tc, **kwargs
        )
        ka = sorted((r.doc_id, r.epoch) for r in a.collect())
        kb = sorted((r.doc_id, r.epoch) for r in b.collect())
        assert ka == kb
        # unbudgeted source kept whole at epoch 0
        big = [x for x in ka if x[0] >= 100]
        assert len(big) == 200 and all(e == 0 for _, e in big)

    def test_exact_mode_rejects_upsample(self, spark):
        import pytest
        from lantern_spark.operators.pack import sample_to_token_budget

        docs = self._docs(spark)
        with pytest.raises(ValueError, match="allow_upsample"):
            sample_to_token_budget(
                docs, "source", "doc_id", {"small": 900.0},
                "doc_id", exact=True, allow_upsample=True,
            )

    def test_no_shuffle_in_upsample_plan(self, spark):
        from lantern_spark.operators.pack import sample_to_token_budget
        from lantern_spark.operators.textstats import token_count_ws

        docs = self._docs(spark)
        out = sample_to_token_budget(
            docs, "source", "doc_id", {"small": 900.0},
            token_count_ws("text"), allow_upsample=True,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # broadcast joins only — no shuffle Exchange on the data side
        import re
        assert not re.search(r"Exchange hashpartitioning", plan)

    def test_upsample_subset_consistent_with_downsample(self, spark):
        """For a rate < 1 source, allow_upsample=True must select the
        IDENTICAL doc subset as the plain mode (same coin) — toggling
        the flag cannot silently reshuffle a downsampled source."""
        from lantern_spark.operators.pack import sample_to_token_budget
        from lantern_spark.operators.textstats import token_count_ws

        docs = self._docs(spark)
        tc = token_count_ws("text")
        plain = sample_to_token_budget(
            docs, "source", "doc_id", {"big": 500.0}, tc
        )
        up = sample_to_token_budget(
            docs, "source", "doc_id", {"big": 500.0}, tc,
            allow_upsample=True,
        )
        a = sorted(r.doc_id for r in plain.where("source = 'big'").collect())
        b = sorted(r.doc_id for r in up.where("source = 'big'").collect())
        assert a == b


class TestExportPackedIds:
    """Last-mile export: packed token-id training sequences."""

    @pytest.fixture(scope="class")
    def tok(self, spark):
        from lantern_spark.operators.bpe import train_bpe

        docs = spark.createDataFrame(
            [(i, f"alpha beta gamma delta token{i % 7} epsilon") for i in range(40)],
            "doc_id long, text string",
        )
        return docs, train_bpe(docs, "text", num_merges=50)

    def test_token_ids_roundtrip_encode(self, spark, tok):
        from pyspark.sql import functions as F

        docs, bpe = tok
        vocab = bpe.id_vocab()
        inv = {v: k for k, v in vocab.items()}
        both = docs.select(
            "doc_id",
            bpe.encode_expr("text").alias("toks"),
            bpe.token_ids_expr("text").alias("ids"),
        ).collect()
        for r in both:
            assert [inv[i] for i in r.ids] == r.toks

    def test_specials_get_low_stable_ids(self, tok):
        _, bpe = tok
        v = bpe.id_vocab(specials=("<pad>", "<eos>"))
        assert v["<pad>"] == 0 and v["<eos>"] == 1

    def test_packed_sequences_shape_and_boundaries(self, spark, tok):
        from pyspark.sql import functions as F

        from lantern_spark.operators.pack import export_packed_ids

        docs, bpe = tok
        v = bpe.id_vocab(specials=("<pad>", "<eos>"))
        out = export_packed_ids(
            docs, "text", "doc_id", bpe, seq_len=64,
            eos_id=v["<eos>"], pad_id=v["<pad>"],
            specials=("<pad>", "<eos>"),
        ).collect()
        assert len(out) >= 2
        for r in out:
            assert len(r.input_ids) == 64          # padded to seq_len
            assert r.n_tokens <= 64
            assert r.n_docs >= 1
            assert len(r.doc_starts) >= 1
            assert r.doc_starts[0] == 0
            assert all(a < b for a, b in zip(r.doc_starts, r.doc_starts[1:]))
            assert all(s < 64 for s in r.doc_starts)
            # eos separator present at each doc boundary - 1
            for s in r.doc_starts[1:]:
                assert r.input_ids[s - 1] == v["<eos>"]

    def test_token_conservation_with_wide_bins(self, spark, tok):
        """With bins wide enough that nothing truncates, every doc's
        ids (+1 eos each) must appear across the packs exactly once."""
        from pyspark.sql import functions as F

        from lantern_spark.operators.pack import export_packed_ids

        docs, bpe = tok
        n_total = docs.select(
            F.sum(F.size(bpe.token_ids_expr("text"))).alias("t")
        ).first().t
        out = export_packed_ids(
            docs, "text", "doc_id", bpe, seq_len=10_000, eos_id=99_999,
        )
        from pyspark.sql import functions as SF

        got = out.agg(SF.sum("n_tokens").alias("t"),
                      SF.sum("n_docs").alias("d")).first()
        assert got.d == 40
        assert got.t == n_total + 40  # every token once + one eos/doc

    def test_deterministic(self, spark, tok):
        from lantern_spark.operators.pack import export_packed_ids

        docs, bpe = tok
        a = export_packed_ids(docs, "text", "doc_id", bpe, seq_len=64).collect()
        b = export_packed_ids(docs, "text", "doc_id", bpe, seq_len=64).collect()
        ka = sorted((r.pack_id, tuple(r.input_ids)) for r in a)
        kb = sorted((r.pack_id, tuple(r.input_ids)) for r in b)
        assert ka == kb

    def test_empty_docs_never_export_phantom_eos(self, spark, tok):
        """A zero-token doc (non-Latin text through the ascii BPE
        front end) must be dropped, not exported as a lone-eos
        'document' (review finding)."""
        from pyspark.sql import functions as F

        from lantern_spark.operators.pack import export_packed_ids

        docs, bpe = tok
        with_junk = docs.union(
            spark.createDataFrame(
                [(1000, "中文文本"), (1001, "!!! ???")],
                "doc_id long, text string",
            )
        )
        out = export_packed_ids(
            with_junk, "text", "doc_id", bpe, seq_len=10_000, eos_id=77_777
        )
        agg = out.agg(F.sum("n_docs").alias("d")).first()
        assert agg.d == 40  # the two junk docs contributed nothing
        # and no lone-eos runs: every doc boundary is preceded by
        # real ids (a phantom doc would put two eos ids adjacent)
        for r in out.collect():
            for a, b in zip(r.input_ids, r.input_ids[1:]):
                assert not (a == 77_777 and b == 77_777)
