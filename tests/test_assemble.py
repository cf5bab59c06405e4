"""End-to-end pretraining-corpus assembly (operators/assemble, r9):
curate → dedup tiers → decontaminate → token-budget mixture → pack,
composed — the cross-stage contract test no unit test sees."""

import dataclasses

import pytest
from pyspark.sql import functions as F


def _corpus(spark):
    """3 sources × 30 docs with planted hazards: exact duplicates,
    a shared boilerplate span (substring dedup prey), and docs that
    quote the held-out eval set (decontamination prey)."""
    boiler = " ".join(f"b{i}" for i in range(14))  # >= 12-token span
    eval_quote = " ".join(f"q{i}" for i in range(15))
    rows = []
    did = 0
    for s in range(3):
        for i in range(30):
            body = " ".join(
                f"w{s}x{(i * 7 + j) % 31}" for j in range(40)
            )
            if i % 10 == 3:
                body = f"{body} {boiler}"
            if i % 15 == 4:
                body = f"{eval_quote} {body}"
            if i % 9 == 5:
                body = "the exact duplicated document body here"
            rows.append((did, body, f"src{s}"))
            did += 1
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _heldout(spark):
    eval_quote = " ".join(f"q{i}" for i in range(15))
    return spark.createDataFrame(
        [(0, f"eval set doc containing {eval_quote} verbatim")],
        "doc_id long, text string",
    )


def _cfg():
    from lantern_spark.operators.curate import CurationConfig

    return CurationConfig(
        min_tokens=5, min_quality=0.0,
        substr_dedup_min_tokens=12, substr_dedup_salt=3,
        exact_dedup=True, near_dedup=True, near_threshold=0.8,
    )


class TestAssemble:
    @pytest.mark.slow
    def test_end_to_end_accounting(self, spark, tmp_path):
        from lantern_spark.operators.assemble import (
            assemble_pretraining_corpus,
        )

        docs = _corpus(spark)
        res = assemble_pretraining_corpus(
            spark, docs, "text", "doc_id",
            str(tmp_path / "ckpt"),
            curation=_cfg(),
            heldout=_heldout(spark),
            source_col="source",
            token_budgets={"src0": 400.0, "src1": 600.0},
            seq_tokens=128,
        )
        sr = res.stage_rows
        assert sr["input"] == 90
        # exact dedup removed the planted identical docs (3 sources x
        # ~3 each -> one survivor corpus-wide)
        assert sr["exact_dedup"] < sr["heuristics"]
        # decontamination dropped every eval-quoting doc
        assert sr["decontaminated"] < sr["near_dedup"]
        # the budget step only shrinks budgeted sources
        assert sr["budgeted"] <= sr["decontaminated"]
        assert res.tokens_out <= res.tokens_in
        assert res.n_packs >= 1
        out = res.df
        assert "pack_id" in out.columns
        # substring dedup excised the boilerplate span from survivors
        boiler = " ".join(f"b{i}" for i in range(14))
        assert out.filter(F.col("text").contains(boiler)).count() <= 1
        # no contaminated doc survives
        q = " ".join(f"q{i}" for i in range(15))
        assert out.filter(F.col("text").contains(q)).count() == 0
        # budgets respected in expectation terms: budgeted sources lost
        # tokens, unbudgeted src2 kept all its (surviving) rows
        kept_by_src = {
            r["source"]: r["n"]
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert set(kept_by_src) <= {"src0", "src1", "src2"}

    def test_bpe_token_count_threads_through(self, spark, tmp_path):
        """r10 (review r9 item 4): one token_count expression drives
        budgets, bins, AND the report — assembly with a real learned
        BPE counter accounts in BPE tokens end-to-end (tokens_in
        equals the corpus's own BPE total, not the whitespace one)."""
        from lantern_spark.operators.assemble import (
            assemble_pretraining_corpus,
        )
        from lantern_spark.operators.bpe import train_bpe
        from lantern_spark.operators.textstats import token_count_ws

        docs = _corpus(spark)
        bpe = train_bpe(docs, "text", num_merges=50)
        tc = bpe.token_count_expr("text")
        res = assemble_pretraining_corpus(
            spark, docs, "text", "doc_id",
            str(tmp_path / "ckpt"),
            curation=_cfg(),
            source_col="source",
            token_budgets={"src0": 800.0},
            seq_tokens=256,
            token_count=tc,
        )
        want_in = int(docs.agg(F.sum(tc).alias("t")).first()["t"])
        ws_in = int(
            docs.agg(F.sum(token_count_ws("text")).alias("t")).first()["t"]
        )
        assert res.tokens_in == want_in != ws_in
        assert res.tokens_out <= res.tokens_in
        assert res.n_packs >= 1
        # the packed output's per-bin BPE totals respect the bin
        # budget up to the start-offset overshoot contract (< one doc
        # beyond seq_tokens, docs clamped to one bin width)
        from lantern_spark.operators.pack import pack_stats

        stats = pack_stats(res.df, "text", token_count=tc)
        max_doc = int(
            res.df.agg(F.max(F.least(tc, F.lit(256))).alias("m"))
            .first()["m"]
        )
        top = stats.agg(F.max("total_tokens").alias("m")).first()["m"]
        assert top < 256 + max_doc

    def test_resume_and_late_knob(self, spark, tmp_path):
        """Second run resumes (same output); changing near_threshold
        recomputes only near_dedup forward — the per-stage fingerprint
        contract surviving through the composition."""
        import glob
        import os

        from lantern_spark.operators.assemble import (
            assemble_pretraining_corpus,
        )

        docs = _corpus(spark)
        ck = str(tmp_path / "ckpt")

        def run(cfg):
            return assemble_pretraining_corpus(
                spark, docs, "text", "doc_id", ck, curation=cfg,
                seq_tokens=128,
            )

        first = run(_cfg())
        mt1 = {
            os.path.basename(d): os.path.getmtime(d)
            for d in glob.glob(f"{ck}/*") if os.path.isdir(d)
        }
        second = run(_cfg())
        mt2 = {
            os.path.basename(d): os.path.getmtime(d)
            for d in glob.glob(f"{ck}/*") if os.path.isdir(d)
        }
        assert mt1 == mt2  # full resume, nothing recomputed
        assert sorted(map(tuple, first.df.collect())) == sorted(
            map(tuple, second.df.collect())
        )
        cfg3 = dataclasses.replace(_cfg(), near_threshold=0.7)
        run(cfg3)
        mt3 = {
            os.path.basename(d): os.path.getmtime(d)
            for d in glob.glob(f"{ck}/*") if os.path.isdir(d)
        }
        changed = {k for k in mt3 if mt3[k] != mt2.get(k)}
        assert changed == {
            k for k in mt3 if k.endswith("near_dedup")
        }, changed

    def test_plan_drives_tier_selection_end_to_end(self, spark, tmp_path):
        """A plan that skips the near-dup tier disables exactly that
        stage on a config copy and is recorded in the report."""
        from lantern_spark.operators.assemble import (
            AssemblyPlan,
            assemble_pretraining_corpus,
        )

        docs = _corpus(spark)
        plan = AssemblyPlan(
            run=["exact_dedup", "substr_dedup"],
            skip=["near_dedup"],
            predicted_tokens_out=3000,
            predicted_cost_s=1.0,
            feasible=True,
            decision="test plan",
        )
        cfg = _cfg()
        res = assemble_pretraining_corpus(
            spark, docs, "text", "doc_id", str(tmp_path / "ckpt"),
            curation=cfg, plan=plan,
        )
        assert res.plan is plan
        assert "near_dedup" not in res.stage_rows
        assert "exact_dedup" in res.stage_rows
        assert cfg.near_dedup is True  # caller's config untouched

    def test_plan_refuses_unconfigured_tier(self, spark, tmp_path):
        from lantern_spark.operators.assemble import (
            AssemblyPlan,
            assemble_pretraining_corpus,
        )
        from lantern_spark.operators.curate import CurationConfig

        plan = AssemblyPlan(
            run=["url_dedup"], skip=[], predicted_tokens_out=0,
            predicted_cost_s=0.0, feasible=True, decision="",
        )
        with pytest.raises(ValueError, match="url_dedup"):
            assemble_pretraining_corpus(
                spark, _corpus(spark), "text", "doc_id",
                str(tmp_path / "ckpt"),
                curation=CurationConfig(), plan=plan,
            )

    def test_budgets_require_source_col(self, spark, tmp_path):
        from lantern_spark.operators.assemble import (
            assemble_pretraining_corpus,
        )

        with pytest.raises(ValueError, match="source_col"):
            assemble_pretraining_corpus(
                spark, _corpus(spark), "text", "doc_id",
                str(tmp_path / "c2"), token_budgets={"src0": 10.0},
            )


class TestPlanAssembly:
    """Tier selection over synthetic drop/cost profiles (r10, review
    r9 item 8): the reference autotune's rule — min cost among
    variants meeting the target, else max drop."""

    def _profiles(self):
        from lantern_spark.operators.assemble import StageProfile

        # pipeline order: cheap/high-drop first, expensive last
        return [
            StageProfile("url_dedup", drop_rate=0.20, cost_per_mtok=1.0),
            StageProfile("exact_dedup", drop_rate=0.10, cost_per_mtok=2.0),
            StageProfile("near_dedup", drop_rate=0.15, cost_per_mtok=20.0),
            StageProfile("substr_dedup", drop_rate=0.10, cost_per_mtok=50.0),
        ]

    def test_loose_budget_skips_expensive_tiers(self):
        from lantern_spark.operators.assemble import plan_assembly

        # 10M tokens, budget 7.5M: url alone (drop 20% -> 8M) misses;
        # url+exact (-> 7.2M) reaches it — the cheapest feasible pair
        p = plan_assembly(10_000_000, 7_500_000, self._profiles())
        assert p.feasible
        assert p.run == ["url_dedup", "exact_dedup"]
        assert set(p.skip) == {"near_dedup", "substr_dedup"}
        assert p.predicted_tokens_out <= 7_500_000
        # cost = 10.0 (url) + 8M/1e6*2 (exact) = 26.0
        assert p.predicted_cost_s == 26.0

    def test_budget_already_met_runs_nothing(self):
        from lantern_spark.operators.assemble import plan_assembly

        p = plan_assembly(1_000_000, 2_000_000, self._profiles())
        assert p.feasible and p.run == [] and p.predicted_cost_s == 0.0

    def test_infeasible_budget_takes_max_drop(self):
        from lantern_spark.operators.assemble import plan_assembly

        # even all four tiers only reach 10M*0.8*0.9*0.85*0.9 = 5.508M
        p = plan_assembly(10_000_000, 1_000_000, self._profiles())
        assert not p.feasible
        assert p.run == [
            "url_dedup", "exact_dedup", "near_dedup", "substr_dedup"
        ]
        assert p.predicted_tokens_out == 5_508_000
        assert "mixture sampler" in p.decision

    def test_required_tier_always_runs(self):
        from lantern_spark.operators.assemble import plan_assembly

        p = plan_assembly(
            10_000_000, 7_500_000, self._profiles(),
            required=["near_dedup"],
        )
        assert p.feasible and "near_dedup" in p.run
        # with near forced (20% + 15% composes past the budget), the
        # cheapest completion drops exact, not url (url is cheaper
        # per-token AND higher-drop)
        assert "url_dedup" in p.run and "exact_dedup" not in p.run

    def test_unknown_required_raises(self):
        import pytest as _pytest

        from lantern_spark.operators.assemble import plan_assembly

        with _pytest.raises(ValueError, match="nope"):
            plan_assembly(1, 1, self._profiles(), required=["nope"])


class TestFuzzyDecontamTier:
    def test_fuzzy_tier_drops_paraphrased_leak(self, spark, tmp_path):
        import random

        from lantern_spark.operators.assemble import (
            assemble_pretraining_corpus,
        )
        from lantern_spark.operators.curate import CurationConfig

        rng = random.Random(3)
        words = [f"v{i:03d}" for i in range(300)]
        eval_toks = [words[rng.randrange(300)] for _ in range(120)]
        para = list(eval_toks)
        for i in range(0, len(para), 10):
            para[i] = f"sw{i}"   # kills every 13-gram, keeps ~70% shingles
        docs = spark.createDataFrame(
            [
                (0, " ".join(para)),                                  # fuzzy leak
                (1, " ".join(words[200 + i % 100] for i in range(90))),  # clean
            ],
            "doc_id long, text string",
        )
        heldout = spark.createDataFrame(
            [(0, " ".join(eval_toks))], "doc_id long, text string"
        )
        res = assemble_pretraining_corpus(
            spark, docs, "text", "doc_id", str(tmp_path / "ck"),
            curation=CurationConfig(min_tokens=5),
            heldout=heldout,
            decontaminate_fuzzy_threshold=0.5,
            seq_tokens=128,
        )
        # exact tier keeps both (no verbatim 13-gram); fuzzy drops doc 0
        assert res.stage_rows["decontaminated"] == 2
        assert res.stage_rows["decontaminated_fuzzy"] == 1


class TestPlanValidatesUrlCol:
    def test_url_dedup_tier_requires_url_col(self):
        import pytest

        from lantern_spark.operators.assemble import AssemblyPlan
        from lantern_spark.operators.curate import CurationConfig

        plan = AssemblyPlan(
            run=["url_dedup"], skip=[], predicted_tokens_out=1,
            predicted_cost_s=0.0, feasible=True, decision="t",
        )
        cfg = CurationConfig(url_dedup=True)  # url_col left None
        with pytest.raises(ValueError, match="url_col"):
            plan.apply_to(cfg)


class TestExportShards:
    def test_assembly_emits_trainer_shards(self, spark, tmp_path):
        from lantern_spark.operators.assemble import (
            assemble_pretraining_corpus,
        )
        from lantern_spark.operators.bpe import train_bpe
        from lantern_spark.operators.curate import CurationConfig

        docs = _corpus(spark)
        bpe = train_bpe(docs, "text", num_merges=60)
        v = bpe.id_vocab(specials=("<pad>", "<eos>"))
        res = assemble_pretraining_corpus(
            spark, docs, "text", "doc_id", str(tmp_path / "ck"),
            curation=CurationConfig(min_tokens=5, exact_dedup=True),
            seq_tokens=128,
            export_tokenizer=bpe,
            export_eos_id=v["<eos>"], export_pad_id=v["<pad>"],
            export_specials=("<pad>", "<eos>"),
        )
        rows = res.df.collect()
        assert rows and set(res.df.columns) == {
            "pack_id", "input_ids", "n_tokens", "n_docs", "doc_starts"
        }
        assert all(len(r.input_ids) == 128 for r in rows)
        assert res.n_packs == len(rows)
        assert res.tokens_out == sum(r.n_tokens for r in rows)
        # the per-stage accounting is still there
        assert res.stage_rows["exact_dedup"] < res.stage_rows["input"]

    def test_export_defaults_accounting_to_tokenizer_units(
        self, spark, tmp_path
    ):
        """One-counter contract under export: tokens_in and tokens_out
        are both in tokenizer ids (review finding: whitespace budgets
        vs BPE shards silently overshot)."""
        from pyspark.sql import functions as F

        from lantern_spark.operators.assemble import (
            assemble_pretraining_corpus,
        )
        from lantern_spark.operators.bpe import train_bpe
        from lantern_spark.operators.curate import CurationConfig

        docs = _corpus(spark)
        bpe = train_bpe(docs, "text", num_merges=60)
        res = assemble_pretraining_corpus(
            spark, docs, "text", "doc_id", str(tmp_path / "ck2"),
            curation=CurationConfig(min_tokens=5),
            seq_tokens=10_000,   # wide bins: nothing truncates
            export_tokenizer=bpe,
        )
        n_bpe_in = docs.agg(
            F.sum(bpe.token_count_expr("text")).alias("t")
        ).first().t
        assert res.tokens_in == n_bpe_in            # counted in ids
        assert 0 < res.tokens_out <= res.tokens_in  # same unit, comparable
        # and tokens_out is exactly the ids delivered in the shards
        got = res.df.agg(F.sum("n_tokens").alias("t")).first().t
        assert res.tokens_out == got
