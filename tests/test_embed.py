"""Embedding pipeline tests (FIXTURES.md F6, embeddings/mod.rs parity)."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lantern_spark.operators.embed import (
    RuntimeSpec,
    embed_column,
    embed_with_failures,
    get_available_models,
    get_available_runtimes,
    hash_embed_batch,
    llm_completion,
    llm_embedding,
)


def test_hash_embed_deterministic():
    a = hash_embed_batch(["hello world"], 16)
    b = hash_embed_batch(["hello world"], 16)
    assert a == b
    assert len(a[0]) == 16
    # different text → different vector
    c = hash_embed_batch(["goodbye world"], 16)
    assert a[0] != c[0]


def test_null_and_empty_skipped():
    out = hash_embed_batch([None, "", "  ", "ok"], 8)
    assert out[0] is None and out[1] is None and out[2] is None
    assert out[3] is not None


def test_embed_column_batch(spark, sf_dir):
    parts = spark.read.parquet(f"{sf_dir}/part.parquet").limit(20)
    rt = RuntimeSpec(name="hash", dim=16, batch_size=7)  # force re-chunking
    out = embed_column(parts, "p_name", "embedding", rt)
    rows = out.collect()
    assert len(rows) == 20
    assert all(len(r.embedding) == 16 for r in rows)
    # deterministic across runs
    rows2 = embed_column(parts, "p_name", "embedding", rt).collect()
    assert {r.p_partkey: tuple(r.embedding) for r in rows} == {
        r.p_partkey: tuple(r.embedding) for r in rows2
    }


def test_embed_with_failures_split(spark):
    df = spark.createDataFrame(
        [Row(id=1, t="hello"), Row(id=2, t=None), Row(id=3, t="")],
        "id int, t string",
    )
    ok, failed = embed_with_failures(df, "t", "v", RuntimeSpec("hash", 8))
    assert [r.id for r in ok.collect()] == [1]
    assert sorted(r.id for r in failed.collect()) == [2, 3]


def test_llm_embedding_column(spark):
    df = spark.createDataFrame([Row(t="apple banana")])
    v = df.select(llm_embedding("t", dim=16).alias("v")).first().v
    assert len(v) == 16
    assert v == pytest.approx(hash_embed_batch(["apple banana"], 16)[0], rel=1e-6)


def test_llm_completion_echo(spark):
    df = spark.createDataFrame([Row(t="hi")])
    out = df.select(llm_completion("t", system_prompt="sys").alias("c")).first().c
    assert out == "[sys] hi"
    with pytest.raises(NotImplementedError):
        llm_completion("t", model="gpt-4o")


def test_runtime_registry():
    assert "hash" in get_available_runtimes()
    assert get_available_models()["BAAI/bge-small-en"] == 300


def test_ort_runtime_gated(spark):
    df = spark.createDataFrame([Row(t="x")])
    out = embed_column(df, "t", "v", RuntimeSpec("ort", 384))
    with pytest.raises(Exception) as exc:
        out.collect()
    assert "NotImplementedError" in str(exc.value) or "onnxruntime" in str(exc.value)


def test_incremental_embedding_stream(spark, tmp_path):
    """Daemon parity: new rows embedded exactly once across triggers."""
    from lantern_spark.streaming.embed_stream import incremental_embedding_job

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("txt", T.StringType())]
    )
    spark.createDataFrame([(1, "alpha"), (2, "beta")], schema).write.mode(
        "append"
    ).parquet(src)

    q = incremental_embedding_job(
        spark, src, schema, "txt", "emb", out, ckpt,
        RuntimeSpec("hash", 8),
    )
    try:
        q.processAllAvailable()
        got1 = spark.read.parquet(out).collect()
        assert sorted(r.id for r in got1) == [1, 2]

        # second file arrives → only NEW rows processed
        spark.createDataFrame([(3, "gamma")], schema).write.mode("append").parquet(src)
        q.processAllAvailable()
        got2 = spark.read.parquet(out).collect()
        assert sorted(r.id for r in got2) == [1, 2, 3]  # exactly once each
        assert all(r.emb is not None for r in got2)
    finally:
        q.stop()


def test_windowed_event_stats_batch(spark, sf_dir):
    from lantern_spark.streaming.embed_stream import windowed_event_stats

    from lantern_spark.types import load_events

    events = load_events(spark, sf_dir)
    out = windowed_event_stats(events).collect()
    assert len(out) > 0
    total = sum(r.n_events for r in out)
    assert total == events.count()


class TestMd5Runtime:
    def test_expr_matches_batch(self, spark):
        """The Catalyst-expression embedding must equal the python
        runtime fn (the SQL-replayability contract of the md5 runtime)."""
        import numpy as np

        from lantern_spark.operators.embed import (
            md5_embed_batch,
            md5_embed_expr,
        )

        texts = ["Spark Vector search", "hello   world", None, "  ", "one"]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        got = [
            r[0] for r in df.select(md5_embed_expr("text", 8).alias("e")).collect()
        ]
        exp = md5_embed_batch(texts, 8)
        for g, e in zip(got, exp):
            if g is None or e is None:
                assert g == e
            else:
                assert np.allclose(g, e, atol=1e-12)

    def test_md5_runtime_registered(self, spark):
        from lantern_spark.operators.embed import (
            RuntimeSpec,
            embed_column,
            get_available_runtimes,
        )

        assert "md5" in get_available_runtimes()
        df = spark.createDataFrame([(1, "a b"), (2, "c")], "id long, t string")
        out = embed_column(df, "t", "emb", RuntimeSpec(name="md5", dim=4))
        rows = out.collect()
        assert all(len(r["emb"]) == 4 for r in rows)

    def test_expr_stays_jvm_side(self, spark):
        """No Python workers in the embedding plan — md5 + folds are
        Catalyst expressions."""
        from lantern_spark.operators.embed import md5_embed_expr

        df = spark.createDataFrame([("x y",)], "text string")
        plan = (
            df.select(md5_embed_expr("text", 4).alias("e"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "EvalPython" not in plan
