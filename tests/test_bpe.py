"""BPE tokenizer: exact merge learning over the distributed
word-frequency table, greedy apply parity, determinism, persistence."""

import pytest
from pyspark.sql import functions as F

from lantern_spark.operators.bpe import (
    EOW,
    BPETokenizer,
    apply_bpe_word,
    train_bpe,
    train_bpe_from_counts,
)


class TestMergeLoop:
    def test_textbook_example(self):
        # the Sennrich et al. running example: {low, lower, newest,
        # widest} — 'es' then 'est' ('newest'+'widest' pairs dominate)
        counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
        merges = train_bpe_from_counts(counts, 4)
        assert merges[0] == ("e", "s")
        assert merges[1] == ("es", "t" + EOW)
        # encode a training word exactly
        tok = BPETokenizer(merges)
        assert apply_bpe_word("newest", tok.ranks)[-1] == "est" + EOW

    def test_tie_break_deterministic(self):
        # 'ab' and 'cd' pairs tie — lexicographically smaller wins
        counts = [("ab", 3), ("cd", 3)]
        merges = train_bpe_from_counts(counts, 1)
        assert merges == [("a", "b" + EOW)]

    def test_stops_when_nothing_repeats(self):
        counts = [("abc", 1), ("xyz", 1)]
        assert train_bpe_from_counts(counts, 50) == []

    def test_weighting_by_count(self):
        # 'zz' appears in one word with huge count → beats the pair
        # spread across many distinct rare words
        counts = [("zz", 100)] + [(w, 1) for w in ("qa", "qb", "qc")]
        merges = train_bpe_from_counts(counts, 1)
        assert merges == [("z", "z" + EOW)]

    def test_greedy_apply_matches_replay(self):
        counts = [("banana", 4), ("bandana", 3), ("cabana", 2)]
        merges = train_bpe_from_counts(counts, 6)
        tok = BPETokenizer(merges)
        # replay the merges in order over a word (reference semantics)
        for word in ("banana", "bandana", "cabana", "ban"):
            syms = list(word[:-1]) + [word[-1] + EOW]
            for a, b in merges:
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == a
                        and syms[i + 1] == b
                    ):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            assert apply_bpe_word(word, tok.ranks) == syms


class TestSparkSurface:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [
            (0, "the lowest low is lower than the lowest ever"),
            (1, "newest widest lowest the the the"),
            (2, "low low low new new wide wide west"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_train_encode_roundtrip(self, spark, corpus):
        tok = train_bpe(corpus, "text", num_merges=30)
        assert len(tok.merges) > 0
        out = corpus.select(
            "doc_id", tok.encode_expr("text").alias("toks")
        ).orderBy("doc_id").collect()
        # every doc encodes; decode recovers the normalized text
        texts = [r["text"] for r in corpus.orderBy("doc_id").collect()]
        for r, text in zip(out, texts):
            assert len(r["toks"]) > 0
            import re

            norm = " ".join(
                w for w in re.split(r"[^a-z0-9]+", text.lower()) if w
            )
            assert BPETokenizer.decode_tokens(r["toks"]) == norm

    def test_training_matches_local(self, spark, corpus):
        """Distributed counting ≡ local counting: the merge table from
        train_bpe equals training driver-side on the concatenated
        corpus (exactness of the one-pass compression)."""
        import re
        from collections import Counter

        local: Counter = Counter()
        for r in corpus.collect():
            for w in re.split(r"[^a-z0-9]+", r["text"].lower()):
                if w:
                    local[w] += 1
        want = train_bpe_from_counts(sorted(local.items()), 30)
        got = train_bpe(corpus, "text", num_merges=30).merges
        assert got == want

    def test_deterministic_across_runs(self, spark, corpus):
        t1 = train_bpe(corpus, "text", num_merges=20)
        t2 = train_bpe(
            corpus.repartition(7), "text", num_merges=20
        )  # layout must not matter
        assert t1.merges == t2.merges

    def test_max_distinct_words_bound(self, spark, corpus):
        tok = train_bpe(
            corpus, "text", num_merges=20, max_distinct_words=3
        )
        # trains only on the top-3 words — still valid merges
        assert isinstance(tok.merges, list)

    def test_save_load(self, spark, corpus, tmp_path):
        tok = train_bpe(corpus, "text", num_merges=15)
        tok.save(str(tmp_path))
        re_tok = BPETokenizer.load(str(tmp_path))
        assert re_tok.merges == tok.merges
        a = corpus.select(tok.encode_expr("text").alias("t")).collect()
        b = corpus.select(re_tok.encode_expr("text").alias("t")).collect()
        assert [r["t"] for r in a] == [r["t"] for r in b]

    def test_token_count_expr(self, spark, corpus):
        tok = train_bpe(corpus, "text", num_merges=10)
        rows = corpus.select(
            tok.token_count_expr("text").alias("n")
        ).collect()
        assert all(r["n"] > 0 for r in rows)

    def test_corpus_scale_smoke(self, spark, sf_dir):
        """Documents table end-to-end: train on the corpus, encode the
        corpus, count total tokens — the pipeline shape at 100 TB (one
        count shuffle + one map-only encode)."""
        from lantern_spark.types import load_table

        docs = load_table(spark, sf_dir, "documents")
        tok = train_bpe(
            docs, "text", num_merges=200, max_distinct_words=20000
        )
        total = (
            docs.select(tok.token_count_expr("text").alias("n"))
            .agg(F.sum("n"))
            .first()[0]
        )
        assert total > 0
        # subword compression: BPE tokens ≤ raw characters, ≥ words
        n_words = (
            docs.select(
                F.size(F.split(F.lower("text"), "[^a-z0-9]+")).alias("w")
            )
            .agg(F.sum("w"))
            .first()[0]
        )
        assert total >= 0.5 * n_words  # sane magnitude


class TestBpePackingIntegration:
    def test_pack_with_bpe_counts(self, spark, sf_dir):
        """The full training-assembly composition: BPE-tokenize the
        corpus and pack with REAL subword counts — bins budgeted in
        the same units the trainer consumes."""
        from lantern_spark.operators.pack import pack_sequences
        from lantern_spark.types import load_table

        docs = load_table(spark, sf_dir, "documents")
        tok = train_bpe(
            docs, "text", num_merges=100, max_distinct_words=20000
        )
        packed = pack_sequences(
            docs, "text", "doc_id", max_tokens=512, chunks=8,
            token_count=tok.token_count_expr("text"),
        )
        stats = (
            packed.withColumn("__n", tok.token_count_expr("text"))
            .groupBy("pack_id")
            .agg(
                F.sum(F.least(F.col("__n"), F.lit(512))).alias("total"),
                F.count("*").alias("docs"),
            )
            .collect()
        )
        assert len(stats) > 1
        # start-offset binning contract: a bin overshoots by less than
        # one (clamped) document, so total < 2 x budget always
        assert all(r["total"] < 2 * 512 for r in stats)
        # determinism
        p2 = pack_sequences(
            docs, "text", "doc_id", max_tokens=512, chunks=8,
            token_count=tok.token_count_expr("text"),
        )
        a = {(r["doc_id"], r["pack_id"]) for r in packed.collect()}
        b = {(r["doc_id"], r["pack_id"]) for r in p2.collect()}
        assert a == b
