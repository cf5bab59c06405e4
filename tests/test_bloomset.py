"""Corpus-scale Bloom membership set (Dolma-style): batch build/probe
+ the bounded-state streaming dedup gate."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lantern_spark.operators.bloomset import (
    bloom_fpr,
    build_bloom_set,
    probe_bloom_set,
)

PARAMS = dict(n_shards=8, m_bits=8 * 4096 * 8, k=7)  # 256 Kib total


def _members(spark, n=500):
    return spark.range(n).select(
        F.concat(F.lit("member-doc-"), F.col("id")).alias("text")
    )


class TestBloomSet:
    def test_no_false_negatives(self, spark):
        members = _members(spark)
        bloom = build_bloom_set(members, "text", **PARAMS)
        probed = probe_bloom_set(members, bloom, "text", **PARAMS)
        assert probed.filter(~F.col("probable_member")).count() == 0

    def test_fpr_near_theoretical(self, spark):
        members = _members(spark, 500)
        bloom = build_bloom_set(members, "text", **PARAMS)
        outsiders = spark.range(4000).select(
            F.concat(F.lit("outsider-"), F.col("id")).alias("text")
        )
        hits = (
            probe_bloom_set(outsiders, bloom, "text", **PARAMS)
            .filter("probable_member")
            .count()
        )
        theo = bloom_fpr(500, PARAMS["m_bits"], PARAMS["k"])
        # generous ceiling: sharding + small-sample noise
        assert hits / 4000 <= max(5 * theo, 0.01), (hits, theo)

    def test_empty_history_probes_false(self, spark):
        empty = _members(spark, 0)
        bloom = build_bloom_set(empty, "text", **PARAMS)
        probed = probe_bloom_set(_members(spark, 50), bloom, "text", **PARAMS)
        assert probed.filter("probable_member").count() == 0

    def test_null_keys_probe_false_and_survive(self, spark):
        members = _members(spark)
        bloom = build_bloom_set(members, "text", **PARAMS)
        with_null = spark.createDataFrame(
            [(1, None), (2, "member-doc-3")], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r["probable_member"]
            for r in probe_bloom_set(
                with_null, bloom, "text", **PARAMS
            ).collect()
        }
        assert got == {1: False, 2: True}

    def test_deterministic_under_repartition(self, spark):
        members = _members(spark)
        a = {
            r["shard"]: bytes(r["bits"])
            for r in build_bloom_set(members, "text", **PARAMS).collect()
        }
        b = {
            r["shard"]: bytes(r["bits"])
            for r in build_bloom_set(
                members.repartition(13), "text", **PARAMS
            ).collect()
        }
        assert a == b

    def test_probe_is_cogrouped_not_joined(self, spark):
        """The bitset must reach each task once per shard — a per-row
        equi-join copy of a multi-MB bitset is the anti-pattern."""
        members = _members(spark, 50)
        bloom = build_bloom_set(members, "text", **PARAMS)
        probed = probe_bloom_set(members, bloom, "text", **PARAMS)
        plan = probed._jdf.queryExecution().executedPlan().toString()
        assert "CoGroup" in plan
        for node in ("BroadcastHashJoin", "SortMergeJoin", "CartesianProduct"):
            assert node not in plan

    def test_incremental_ingestion_shape(self, spark):
        """The operating loop: build over day-1 corpus, probe day-2,
        keep only unseen docs."""
        day1 = spark.createDataFrame(
            [(1, "alpha doc"), (2, "beta doc")], "doc_id long, text string"
        )
        day2 = spark.createDataFrame(
            [(3, "alpha doc"), (4, "gamma doc")], "doc_id long, text string"
        )
        bloom = build_bloom_set(day1, "text", **PARAMS)
        fresh = (
            probe_bloom_set(day2, bloom, "text", **PARAMS)
            .filter(~F.col("probable_member"))
            .select("doc_id")
        )
        assert [r["doc_id"] for r in fresh.collect()] == [4]

    def test_m_shard_validation(self, spark):
        with pytest.raises(ValueError, match="byte-aligned"):
            build_bloom_set(_members(spark, 1), "text", n_shards=3, m_bits=64)


class TestStreamingBloomDedup:
    def _fake_batch(self, ids, texts, m_shard, k, seed=42):
        """Build the (__h1, __h2) frame the stream operator would feed
        the stateful fn, using the same JVM-free hash derivation."""
        import hashlib

        h1s, h2s = [], []
        for t in texts:
            hx = hashlib.md5(f"{seed}:{t}".encode()).hexdigest()
            h1s.append(int(hx[0:15], 16))
            h2s.append(int(hx[16:31], 16))
        return pd.DataFrame(
            {"doc_id": ids, "text": texts, "__h1": h1s, "__h2": h2s}
        )

    def test_fn_drops_cross_batch_duplicates(self):
        from lantern_spark.streaming.dedup_stream import make_bloom_deduper
        from tests.test_streaming import FakeState

        m_shard, k = 4096 * 8, 7
        fn = make_bloom_deduper("doc_id", "text", m_shard, k)
        st = FakeState()
        b1 = self._fake_batch([1, 2], ["alpha", "beta"], m_shard, k)
        out1 = pd.concat(list(fn((0,), iter([b1]), st)))
        assert sorted(out1["text"]) == ["alpha", "beta"]
        assert len(st.get[0]) == m_shard // 8  # bounded state

        b2 = self._fake_batch([3, 4], ["alpha", "gamma"], m_shard, k)
        out2 = pd.concat(list(fn((0,), iter([b2]), st)))
        assert list(out2["text"]) == ["gamma"]
        assert len(st.get[0]) == m_shard // 8  # still the same bound

    def test_fn_in_batch_duplicate_min_id_wins(self):
        from lantern_spark.streaming.dedup_stream import make_bloom_deduper
        from tests.test_streaming import FakeState

        m_shard, k = 4096 * 8, 7
        fn = make_bloom_deduper("doc_id", "text", m_shard, k)
        st = FakeState()
        b = self._fake_batch([9, 3], ["same", "same"], m_shard, k)
        out = pd.concat(list(fn((0,), iter([b]), st)))
        assert list(out["doc_id"]) == [3]

    def test_fn_min_id_wins_across_arrow_chunks(self):
        """A shard group may arrive as multiple Arrow chunks; the
        min-id winner must hold across chunk boundaries (r8 ADVICE:
        per-chunk sorting let a higher-id row survive when the lower
        id landed in a later chunk)."""
        from lantern_spark.streaming.dedup_stream import make_bloom_deduper
        from tests.test_streaming import FakeState

        m_shard, k = 4096 * 8, 7
        fn = make_bloom_deduper("doc_id", "text", m_shard, k)
        st = FakeState()
        # duplicate's LOWER id arrives in the SECOND chunk
        c1 = self._fake_batch([9, 10], ["same", "other"], m_shard, k)
        c2 = self._fake_batch([3], ["same"], m_shard, k)
        out = pd.concat(list(fn((0,), iter([c1, c2]), st)))
        assert sorted(out["doc_id"]) == [3, 10]

    def test_file_stream_end_to_end(self, spark, tmp_path):
        from lantern_spark.streaming.dedup_stream import streaming_bloom_dedup

        src = tmp_path / "src"
        src.mkdir()
        chk = str(tmp_path / "chk")
        schema = "doc_id long, text string"
        spark.createDataFrame(
            [(1, "alpha"), (2, "alpha"), (3, "beta")], schema
        ).repartition(1).write.mode("overwrite").parquet(str(src / "b1"))

        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(str(src) + "/*")
        out = streaming_bloom_dedup(
            stream, "text", "doc_id", n_shards=4, m_bits=4 * 1024 * 8
        )
        q = (
            out.writeStream.format("memory")
            .queryName("bloom_dedup_t")
            .option("checkpointLocation", chk)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            got1 = {
                (r["doc_id"], r["text"])
                for r in spark.sql("select * from bloom_dedup_t").collect()
            }
            assert got1 == {(1, "alpha"), (3, "beta")}

            spark.createDataFrame(
                [(4, "alpha"), (5, "gamma")], schema
            ).repartition(1).write.mode("overwrite").parquet(str(src / "b2"))
            q.processAllAvailable()
            got2 = {
                (r["doc_id"], r["text"])
                for r in spark.sql("select * from bloom_dedup_t").collect()
            }
            assert got2 == {(1, "alpha"), (3, "beta"), (5, "gamma")}
        finally:
            q.stop()


class TestSaturationGuard:
    """r9 (review r8 item 6): past saturation a Bloom filter's FPR -> 1
    and it silently drops everything as 'seen' — the probe path and the
    streaming twin must fail loudly instead, and fill diagnostics must
    be queryable."""

    def test_fill_stats_values(self, spark):
        import numpy as np

        from lantern_spark.operators.bloomset import bloom_fill_stats

        half = np.zeros(64, dtype=np.uint8)
        half[:32] = 0xFF  # exactly half the bits set
        bloom = spark.createDataFrame(
            [(0, bytes(half)), (1, b"\xff" * 64), (2, b"\x00" * 64)],
            "shard int, bits binary",
        )
        got = {
            r["shard"]: (r["fill_ratio"], r["fpr_estimate"])
            for r in bloom_fill_stats(bloom, k=7).collect()
        }
        assert got[0][0] == 0.5 and abs(got[0][1] - 0.5**7) < 1e-12
        assert got[1] == (1.0, 1.0)
        assert got[2] == (0.0, 0.0)

    def test_probe_refuses_saturated_shard(self, spark):
        import pytest as _pytest

        from lantern_spark.operators.bloomset import probe_bloom_set

        n_shards, m_bits = 4, 4 * 64 * 8
        bloom = spark.createDataFrame(
            [(s, b"\xff" * 64) for s in range(n_shards)],
            "shard int, bits binary",
        )
        probes = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
        )
        out = probe_bloom_set(
            probes, bloom, "text", n_shards=n_shards, m_bits=m_bits
        )
        with _pytest.raises(Exception, match="saturated"):
            out.collect()
        # None disables the guard (diagnostics-only mode)
        ok = probe_bloom_set(
            probes, bloom, "text", n_shards=n_shards, m_bits=m_bits,
            max_fill_ratio=None,
        ).collect()
        assert all(r["probable_member"] for r in ok)

    def test_probe_passes_healthy_filter(self, spark):
        from lantern_spark.operators.bloomset import (
            build_bloom_set,
            probe_bloom_set,
        )

        n_shards, m_bits = 4, 4 * 1024 * 8
        members = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(20)], "doc_id long, text string"
        )
        bloom = build_bloom_set(
            members, "text", n_shards=n_shards, m_bits=m_bits
        )
        out = probe_bloom_set(
            members, bloom, "text", n_shards=n_shards, m_bits=m_bits
        ).collect()  # default guard on — healthy fill sails through
        assert all(r["probable_member"] for r in out)

    def test_streaming_deduper_refuses_saturated_state(self):
        import numpy as np
        import pytest as _pytest

        from lantern_spark.streaming.dedup_stream import make_bloom_deduper
        from tests.test_streaming import FakeState

        m_shard, k = 512 * 8, 7
        fn = make_bloom_deduper("doc_id", "text", m_shard, k)
        st = FakeState()
        st.update((b"\xff" * 512,))  # saturated prior state
        b = pd.DataFrame(
            {"doc_id": [1], "text": ["x"], "__h1": [123], "__h2": [45]}
        )
        with _pytest.raises(ValueError, match="saturated"):
            list(fn((0,), iter([b]), st))
