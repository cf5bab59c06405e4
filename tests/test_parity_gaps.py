"""Round-2 parity-gap coverage: Unicode tokenization (stemmers.rs
is_alphanumeric semantics), the ts stemmer-engine variant, the
drop_quantization analog, and the embedding SQL-surface aliases."""

import pytest
from pyspark.sql import functions as F


class TestUnicodeTokenize:
    def test_unicode_goldens(self, spark):
        """Golden parity with rust is_alphanumeric (stemmers.rs:97-120):
        Unicode letters/digits survive; punctuation and symbols split."""
        from lantern_spark.functions.text import tokenize

        rows = [
            ("Café Zürich!",),
            ("北京 2024年 data",),
            ("naïve—approach (straße)",),
            ("ASCII only words",),
        ]
        df = spark.createDataFrame(rows, "text string")
        got = [
            r[0]
            for r in df.select(tokenize("text", unicode=True).alias("t")).collect()
        ]
        assert got[0] == ["café", "zürich"]
        assert got[1] == ["北京", "2024年", "data"]
        assert got[2] == ["naïve", "approach", "straße"]
        assert got[3] == ["ascii", "only", "words"]

    def test_ascii_mode_unchanged(self, spark):
        """The ASCII fast path (oracle corpus) drops non-ASCII letters —
        the documented fast-path behavior existing queries rely on."""
        from lantern_spark.functions.text import tokenize

        df = spark.createDataFrame([("Café ok",)], "text string")
        got = df.select(tokenize("text").alias("t")).first()[0]
        assert got == ["caf", "ok"]

    def test_engine_variants(self, spark):
        """rust engine filters stopwords on the STEMMED form
        (stemmers.rs:110-113); ts engine filters pre-stem (Postgres
        dictionary order). 'this' stems to 'thi' — kept by rust
        (stemmed form not in the list), dropped by ts (original is)."""
        from lantern_spark.functions.text import text_to_stem_array

        df = spark.createDataFrame([("this jumps lazily",)], "text string")
        rust = df.select(text_to_stem_array("text").alias("s")).first()[0]
        ts = df.select(
            text_to_stem_array("text", engine="ts").alias("s")
        ).first()[0]
        assert "jump" in rust and "jump" in ts
        assert "thi" in rust  # stemmed 'this' escapes the stem-form filter
        assert "thi" not in ts  # pre-stem filter catches 'this'
        with pytest.raises(ValueError, match="unknown stemmer engine"):
            df.select(text_to_stem_array("text", engine="nope"))


class TestDropQuantization:
    def test_drops_codes_and_codebook(self, spark, tmp_path):
        from lantern_spark.operators.pq import (
            drop_quantization,
            encode_pq,
            train_codebook,
        )
        from lantern_spark.types import PQSpec

        spec = PQSpec(dim=4, splits=2, clusters=2, seed=1)
        df = spark.createDataFrame(
            [(i, [float(i), 0.0, 1.0, float(i % 3)]) for i in range(20)],
            "id long, v array<double>",
        )
        cb = train_codebook(df, "v", spec)
        cb_path = str(tmp_path / "cb")
        cb.repartition(1).write.parquet(cb_path)
        enc = encode_pq(df, "v", spark.read.parquet(cb_path), spec)
        assert "v_pq" in enc.columns
        out = drop_quantization(enc, "v", codebook_path=cb_path)
        assert "v_pq" not in out.columns
        assert "v" in out.columns  # raw vectors were never replaced
        import os

        assert not os.path.exists(cb_path)
        assert out.count() == 20


class TestEmbeddingAliases:
    def test_aliases_match_llm_embedding(self, spark):
        from lantern_spark.operators.embed import (
            cohere_embedding,
            llm_embedding,
            openai_embedding,
            text_embedding,
        )

        df = spark.createDataFrame([("hello",), ("world",)], "t string")
        base = [r[0] for r in df.select(llm_embedding("t", dim=8)).collect()]
        for alias in (text_embedding, openai_embedding, cohere_embedding):
            got = [
                r[0]
                for r in df.select(alias("any-model", "t", dim=8)).collect()
            ]
            assert got == base  # offline runtime: model routes, hash embeds
