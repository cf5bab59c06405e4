"""Document chunking: goldens, invariants, DuckDB replay, plan shape."""

import pytest
from pyspark.sql import functions as F

from lantern_spark.operators.chunk import chunk_count, chunk_text


def _ref_chunks(text, max_tokens, overlap):
    """Independent python reference."""
    toks = text.split() if text else []
    n = len(toks)
    if n == 0:
        return []
    stride = max_tokens - overlap
    k = -(-max(n - max_tokens, 0) // stride) + 1
    out = []
    for i in range(k):
        s = i * stride
        e = min(s + max_tokens, n)
        out.append((i, " ".join(toks[s:e]), s, e))
    return out


class TestChunkGoldens:
    def test_hand_golden(self, spark):
        text = "a b c d e f g h i j"  # 10 tokens
        df = spark.createDataFrame([(1, text)], "doc_id int, text string")
        got = [
            (r["chunk_id"], r["chunk_text"], r["start_token"], r["end_token"])
            for r in chunk_text(df, "text", "doc_id", max_tokens=4, overlap=1)
            .orderBy("chunk_id")
            .collect()
        ]
        assert got == [
            (0, "a b c d", 0, 4),
            (1, "d e f g", 3, 7),
            (2, "g h i j", 6, 10),
        ]

    def test_short_doc_single_chunk(self, spark):
        df = spark.createDataFrame([(1, "x y z")], "doc_id int, text string")
        got = chunk_text(df, "text", "doc_id", max_tokens=8, overlap=2).collect()
        assert len(got) == 1
        assert got[0]["chunk_text"] == "x y z"
        assert (got[0]["start_token"], got[0]["end_token"]) == (0, 3)

    def test_empty_null_whitespace_yield_nothing(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, None), (3, "   \n\t ")],
            "doc_id int, text string",
        )
        assert chunk_text(df, "text", "doc_id", max_tokens=4, overlap=1).count() == 0

    def test_whitespace_normalized(self, spark):
        df = spark.createDataFrame(
            [(1, "  a\n\nb\t c  ")], "doc_id int, text string"
        )
        got = chunk_text(df, "text", "doc_id", max_tokens=8, overlap=0).collect()
        assert got[0]["chunk_text"] == "a b c"

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, "a")], "doc_id int, text string")
        with pytest.raises(ValueError):
            chunk_text(df, "text", "doc_id", max_tokens=0, overlap=0)
        with pytest.raises(ValueError):
            chunk_text(df, "text", "doc_id", max_tokens=4, overlap=4)
        with pytest.raises(ValueError):
            chunk_text(df, "text", "doc_id", max_tokens=4, overlap=-1)


class TestChunkInvariants:
    def test_matches_reference_across_sizes(self, spark):
        import random

        rng = random.Random(11)
        rows, want = [], {}
        for doc_id in range(60):
            n = rng.choice([0, 1, 3, 7, 8, 9, 15, 16, 17, 40, 100])
            text = " ".join(f"t{doc_id}_{j}" for j in range(n))
            rows.append((doc_id, text))
            want[doc_id] = _ref_chunks(text, 8, 3)
        df = spark.createDataFrame(rows, "doc_id int, text string")
        got = {}
        for r in chunk_text(df, "text", "doc_id", max_tokens=8, overlap=3).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["chunk_id"], r["chunk_text"], r["start_token"], r["end_token"])
            )
        for doc_id, chunks in want.items():
            assert sorted(got.get(doc_id, [])) == chunks, f"doc {doc_id}"

    def test_full_token_coverage_and_overlap(self, spark):
        text = " ".join(f"w{j}" for j in range(57))
        df = spark.createDataFrame([(1, text)], "doc_id int, text string")
        spans = sorted(
            (r["start_token"], r["end_token"])
            for r in chunk_text(df, "text", "doc_id", max_tokens=10, overlap=4).collect()
        )
        covered = set()
        for s, e in spans:
            covered.update(range(s, e))
        assert covered == set(range(57))
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 == s1 + 6  # stride
            assert e1 - s2 == 4 or e2 == 57  # overlap (final may be short)

    def test_chunk_count_matches(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        both = (
            chunk_text(docs, "text", "doc_id", max_tokens=16, overlap=4)
            .groupBy("doc_id")
            .agg(F.count("*").alias("observed"))
            .join(
                docs.select(
                    "doc_id",
                    chunk_count("text", 16, 12).alias("predicted"),
                ),
                "doc_id",
            )
        )
        bad = both.filter(F.col("observed") != F.col("predicted")).count()
        assert bad == 0


class TestChunkOracleAndPlan:
    def test_duckdb_replay_on_documents(self, spark, duck, sf_dir):
        from tests.conftest import assert_matches_oracle

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = chunk_text(docs, "text", "doc_id", max_tokens=16, overlap=4)
        mx, st = 16, 12
        sql = f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
          FROM documents),
        nz AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
        c AS (SELECT doc_id, t, n,
                     (ceil(greatest(n - {mx}, 0)::DOUBLE / {st}))::INT + 1 AS k
              FROM nz)
        SELECT doc_id, i::INT AS chunk_id,
               array_to_string(t[i*{st}+1 : i*{st}+{mx}], ' ') AS chunk_text,
               (i*{st})::INT AS start_token,
               least(i*{st}+{mx}, n)::INT AS end_token
        FROM c, unnest(generate_series(0, k - 1)) AS u(i)
        """
        assert_matches_oracle(out, duck, sql)

    def test_map_only_plan(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        plan = (
            chunk_text(docs, "text", "doc_id", max_tokens=16, overlap=4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "EvalPython" not in plan


class TestChunkRagComposition:
    """The RAG serving shape end-to-end: chunk -> embed (md5 runtime,
    pure exprs) -> IVF index over CHUNKS with doc provenance stored as
    extra columns -> query-text search -> the hit carries
    (doc_id, chunk_id, start_token) so answers join back to documents
    without re-reading the corpus."""

    def test_chunk_embed_index_search(self, spark, sf_dir, tmp_path):
        from lantern_spark.operators.chunk import chunk_text
        from lantern_spark.operators.embed import (
            md5_embed_batch,
            md5_embed_expr,
        )
        from lantern_spark.operators.index import IVFIndex

        # r15: a 120-doc slice keeps every contract this composition
        # exercises (multi-chunk docs, provenance columns through the
        # index, exact self-hit at full probe) — the full-corpus form
        # was 281 s of md5-embedding ~20k overlapping chunks, by far
        # the slowest test in the suite
        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .where(F.col("doc_id") < 120)
        )
        chunks = chunk_text(docs, "text", "doc_id", max_tokens=12, overlap=4)
        emb = chunks.select(
            (F.col("doc_id") * 100000 + F.col("chunk_id")).alias("chunk_key"),
            "doc_id",
            "chunk_id",
            "start_token",
            md5_embed_expr("chunk_text", 32).alias("emb"),
        ).where(F.col("emb").isNotNull())
        idx = IVFIndex.build(
            emb, "emb", "chunk_key", str(tmp_path / "chunk_ivf"),
            metric="cos",
            extra_columns=["doc_id", "chunk_id", "start_token"],
        )

        # probe with the exact text of a known mid-document chunk: its
        # embedding is identical, so full-probe top-1 must be that chunk
        probe = (
            chunks.filter(F.col("chunk_id") == 1)
            .orderBy("doc_id")
            .first()
        )
        qvec = md5_embed_batch([probe["chunk_text"]], 32)[0]
        hit = (
            idx.search(
                spark, qvec, k=1,
                nprobe=len(idx.manifest.centroids),
                select_columns=["doc_id", "chunk_id", "start_token"],
            )
            .first()
        )
        assert hit["doc_id"] == probe["doc_id"]
        assert hit["chunk_id"] == 1
        assert hit["start_token"] == probe["start_token"]
        assert hit["dist"] == pytest.approx(0.0, abs=1e-6)


def _ref_sent_chunks(text, max_tokens, ov):
    """Independent python reference for sentence packing."""
    import re

    sents = [
        s for s in re.split(r"(?<=[.!?…])\s+", text.strip()) if s.strip()
    ] if text and text.strip() else []
    counts = [len(s.split()) for s in sents]
    starts, acc = [], 0
    for c in counts:
        starts.append(acc)
        acc += c
    out, i, cid = [], 0, 0
    while i < len(sents):
        lo = i
        if cid > 0 and ov > 0:
            lo = max(0, i - ov)
            while lo < i and sum(counts[lo : i + 1]) > max_tokens:
                lo += 1
        total = sum(counts[lo : i + 1])
        j = i + 1
        while j < len(sents) and total + counts[j] <= max_tokens:
            total += counts[j]
            j += 1
        out.append(
            (cid, " ".join(sents[lo:j]), starts[lo],
             starts[j - 1] + counts[j - 1])
        )
        i, cid = j, cid + 1
    return out


class TestChunkSentences:
    def test_hand_golden(self, spark):
        from lantern_spark.operators.chunk import chunk_sentences

        text = (
            "One two three. Four five. Six seven eight nine! "
            "Ten? Eleven twelve."
        )
        df = spark.createDataFrame([(1, text)], "doc_id int, text string")
        got = [
            (r["chunk_id"], r["chunk_text"], r["start_token"], r["end_token"])
            for r in chunk_sentences(
                df, "text", "doc_id", max_tokens=6, overlap_sentences=1
            ).orderBy("chunk_id").collect()
        ]
        # pack: [One two three. | Four five.] (5 toks) ; next starts
        # with overlap "Four five." + "Six...nine!" (2+4=6) ; then
        # overlap (4) + "Ten?" (1) + "Eleven twelve." (2) hits 7 > 6 so
        # overlap carries "Six seven eight nine!" + Ten? only... assert
        # against the reference instead of hand-deriving the tail:
        assert got == _ref_sent_chunks(text, 6, 1)
        assert got[0][1] == "One two three. Four five."
        assert got[1][1].startswith("Four five.")  # sentence overlap

    def test_never_splits_sentences(self, spark):
        from lantern_spark.operators.chunk import chunk_sentences

        sents = [f"Sentence number {i} has exactly six words." for i in range(12)]
        df = spark.createDataFrame(
            [(1, " ".join(sents))], "doc_id int, text string"
        )
        rows = chunk_sentences(
            df, "text", "doc_id", max_tokens=20, overlap_sentences=0
        ).collect()
        for r in rows:
            # every chunk is a concatenation of whole sentences
            for part in r["chunk_text"].split("words."):
                assert part == "" or part.strip().startswith("Sentence number")

    def test_oversized_sentence_emitted_alone(self, spark):
        from lantern_spark.operators.chunk import chunk_sentences

        big = " ".join(f"w{j}" for j in range(30)) + "."
        text = f"Short one. {big} Short two."
        df = spark.createDataFrame([(1, text)], "doc_id int, text string")
        rows = chunk_sentences(
            df, "text", "doc_id", max_tokens=10, overlap_sentences=1
        ).orderBy("chunk_id").collect()
        assert rows[0]["chunk_text"] == "Short one."
        assert rows[1]["chunk_text"] == big  # alone, over budget
        assert rows[2]["chunk_text"].endswith("Short two.")

    def test_matches_reference_sweep(self, spark):
        import random

        from lantern_spark.operators.chunk import chunk_sentences

        rng = random.Random(13)
        rows, want = [], {}
        for doc_id in range(40):
            n_sents = rng.randint(0, 12)
            text = " ".join(
                " ".join(f"s{doc_id}w{i}x{j}" for j in range(rng.randint(1, 9)))
                + rng.choice([".", "!", "?"])
                for i in range(n_sents)
            )
            rows.append((doc_id, text))
            want[doc_id] = _ref_sent_chunks(text, 12, 1)
        df = spark.createDataFrame(rows, "doc_id int, text string")
        got = {}
        for r in chunk_sentences(
            df, "text", "doc_id", max_tokens=12, overlap_sentences=1
        ).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["chunk_id"], r["chunk_text"], r["start_token"], r["end_token"])
            )
        for doc_id in want:
            assert sorted(got.get(doc_id, [])) == want[doc_id], doc_id

    def test_empty_null_and_determinism(self, spark):
        from lantern_spark.operators.chunk import chunk_sentences

        df = spark.createDataFrame(
            [(1, None), (2, "   "), (3, "A fine sentence. Another one.")],
            "doc_id int, text string",
        )
        a = sorted(
            map(tuple, chunk_sentences(df, "text", "doc_id", 4, 1).collect())
        )
        b = sorted(
            map(
                tuple,
                chunk_sentences(
                    df.repartition(5), "text", "doc_id", 4, 1
                ).collect(),
            )
        )
        assert a == b
        assert {t[0] for t in a} == {3}
