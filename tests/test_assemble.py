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

    def test_budgets_require_source_col(self, spark, tmp_path):
        from lantern_spark.operators.assemble import (
            assemble_pretraining_corpus,
        )

        with pytest.raises(ValueError, match="source_col"):
            assemble_pretraining_corpus(
                spark, _corpus(spark), "text", "doc_id",
                str(tmp_path / "c2"), token_budgets={"src0": 10.0},
            )
