"""WARC / WET ingestion source tests.

The fast WET path (JVM lineSep record split + Catalyst header regex)
must agree record-for-record with the strict binary Content-Length
parser; the strict parser must be byte-exact on binary payloads and
multi-member gzip (Common Crawl's real layout); the WET plan must stay
entirely JVM-side (no Python eval node).
"""

import gzip

import pytest

from lantern_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    read_wet,
    wet_documents,
    write_warc,
)

WET_RECORDS = [
    {
        "warc_type": "warcinfo",
        "payload": "software: lantern-spark-tests\r\nformat: WARC File Format 1.0\r\n",
        "content_type": "application/warc-fields",
        "record_id": "<urn:uuid:00000000-0000-0000-0000-000000000001>",
    },
    {
        "warc_type": "conversion",
        "url": "https://example.com/a",
        "payload": "Hello world.\nThis is the first converted document.\n",
        "warc_date": "2026-02-03T04:05:06Z",
        "record_id": "<urn:uuid:00000000-0000-0000-0000-00000000000a>",
    },
    {
        "warc_type": "conversion",
        "url": "https://example.org/b?q=1",
        # Unicode + a literal WARC/1.0 mid-line (must NOT false-split:
        # the record separator requires the CRLFCRLF terminator before
        # the version line).
        "payload": "Résumé naïve 中文 text mentioning WARC/1.0 inline.\nSecond line.\n",
        "warc_date": "2026-02-03T04:05:07Z",
        "record_id": "<urn:uuid:00000000-0000-0000-0000-00000000000b>",
    },
    {
        "warc_type": "conversion",
        "url": "https://example.net/c",
        # Blank-line gaps (LF only — what text extraction emits).
        "payload": "para one\n\npara two\n\n\npara three",
        "warc_date": "2026-02-03T04:05:08Z",
        "record_id": "<urn:uuid:00000000-0000-0000-0000-00000000000c>",
    },
    {
        "warc_type": "conversion",
        "url": "https://example.net/empty",
        "payload": "",
        "warc_date": "2026-02-03T04:05:09Z",
        "record_id": "<urn:uuid:00000000-0000-0000-0000-00000000000d>",
    },
]

CONVERSIONS = [r for r in WET_RECORDS if r["warc_type"] == "conversion"]


@pytest.fixture(scope="module")
def wet_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("wet") / "part-00000.warc.wet"
    write_warc(str(p), WET_RECORDS)
    return str(p)


class TestParseWarcBytes:
    def test_roundtrip_headers_and_payloads(self, wet_path):
        with open(wet_path, "rb") as f:
            buf = f.read()
        recs = list(parse_warc_bytes(buf))
        assert len(recs) == len(WET_RECORDS)
        for (hdrs, payload), want in zip(recs, WET_RECORDS):
            assert hdrs["warc-type"] == want["warc_type"]
            assert payload == want["payload"].encode("utf-8")
            assert int(hdrs["content-length"]) == len(payload)
            if "url" in want:
                assert hdrs["warc-target-uri"] == want["url"]

    def test_binary_payload_exact(self, tmp_path):
        blob = bytes(range(256)) * 7 + b"\r\n\r\nWARC/1.0\r\n" + bytes([255])
        p = tmp_path / "bin.warc"
        write_warc(
            str(p),
            [
                {
                    "warc_type": "response",
                    "url": "https://example.com/img",
                    "payload": blob,
                    "content_type": "application/octet-stream",
                },
                {"warc_type": "conversion", "payload": "after binary"},
            ],
        )
        recs = list(parse_warc_bytes(p.read_bytes()))
        assert len(recs) == 2
        assert recs[0][1] == blob  # byte-exact despite embedded separator
        assert recs[1][1] == b"after binary"

    def test_multi_member_gzip(self, tmp_path):
        p = tmp_path / "multi.warc.wet.gz"
        write_warc(str(p), WET_RECORDS, gzip_per_record=True)
        recs = list(parse_warc_bytes(p.read_bytes()))
        assert [h["warc-type"] for h, _ in recs] == [
            r["warc_type"] for r in WET_RECORDS
        ]

    def test_truncated_payload_raises(self, tmp_path):
        p = tmp_path / "trunc.warc"
        write_warc(str(p), [{"warc_type": "conversion", "payload": "full text"}])
        buf = p.read_bytes()[:-8]  # chop into the payload
        with pytest.raises(ValueError, match="truncated"):
            list(parse_warc_bytes(buf))

    def test_garbage_raises(self):
        with pytest.raises(ValueError, match="version line"):
            list(parse_warc_bytes(b"HTTP/1.1 200 OK\r\n\r\n"))


class TestReadWet:
    def test_conversion_records(self, spark, wet_path):
        rows = read_wet(spark, wet_path).orderBy("record_id").collect()
        assert len(rows) == len(CONVERSIONS)
        for row, want in zip(rows, CONVERSIONS):
            assert row.warc_type == "conversion"
            assert row.url == want["url"]
            assert row.text == want["payload"]
            assert row.content_length == len(want["payload"].encode("utf-8"))
            assert row.warc_date is not None

    def test_all_record_types(self, spark, wet_path):
        rows = read_wet(spark, wet_path, record_types=None).collect()
        assert {r.warc_type for r in rows} == {"warcinfo", "conversion"}
        assert len(rows) == len(WET_RECORDS)

    def test_gzip_file(self, spark, tmp_path):
        p = tmp_path / "one.warc.wet.gz"
        write_warc(str(p), WET_RECORDS, gzip_file=True)
        rows = read_wet(spark, str(p)).collect()
        assert len(rows) == len(CONVERSIONS)
        assert {r.url for r in rows} == {r["url"] for r in CONVERSIONS}

    def test_plan_is_jvm_only(self, spark, wet_path):
        plan = read_wet(spark, wet_path)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "MapInArrow" not in plan

    def test_fast_path_equals_strict_parser(self, spark, wet_path):
        fast = {
            r.record_id: r
            for r in read_wet(spark, wet_path, record_types=None).collect()
        }
        strict = {
            r.record_id: r
            for r in read_warc(spark, wet_path).collect()
        }
        assert fast.keys() == strict.keys()
        for rid, s in strict.items():
            f = fast[rid]
            assert f.warc_type == s.warc_type
            assert f.url == s.url
            assert f.content_length == s.content_length
            assert f.text.encode("utf-8") == s.payload


class TestReadWarc:
    def test_filter_and_binary(self, spark, tmp_path):
        blob = bytes(range(256))
        p = tmp_path / "mixed.warc"
        write_warc(
            str(p),
            [
                {"warc_type": "response", "payload": blob, "url": "https://x/1"},
                {"warc_type": "conversion", "payload": "text doc", "url": "https://x/2"},
            ],
        )
        resp = read_warc(spark, str(p), record_types=["response"]).collect()
        assert len(resp) == 1
        assert bytes(resp[0].payload) == blob
        conv = read_warc(spark, str(p), record_types=["conversion"]).collect()
        assert len(conv) == 1 and bytes(conv[0].payload) == b"text doc"

    def test_multi_member_gzip_via_spark(self, spark, tmp_path):
        p = tmp_path / "cc-style.warc.wet.gz"
        write_warc(str(p), WET_RECORDS, gzip_per_record=True)
        rows = read_warc(spark, str(p), record_types=["conversion"]).collect()
        assert len(rows) == len(CONVERSIONS)

    def test_many_files_distribute(self, spark, tmp_path):
        for i in range(4):
            write_warc(
                str(tmp_path / f"part-{i}.warc.wet"),
                [
                    {
                        "warc_type": "conversion",
                        "url": f"https://shard{i}.example.com/",
                        "payload": f"doc from shard {i}",
                        "record_id": f"<urn:uuid:shard-{i}>",
                    }
                ],
            )
        df = read_warc(spark, str(tmp_path), record_types=["conversion"])
        rows = df.collect()
        assert len(rows) == 4
        assert len({r.path for r in rows}) == 4

    def test_batch_flush_cap(self, spark, tmp_path):
        p = tmp_path / "big.warc"
        write_warc(
            str(p),
            [
                {"warc_type": "conversion", "payload": "x" * 1000,
                 "record_id": f"<urn:uuid:big-{i}>"}
                for i in range(10)
            ],
        )
        # Tiny cap forces multiple Arrow batches; results unchanged.
        rows = read_warc(spark, str(p), batch_bytes=2500).collect()
        assert len(rows) == 10


class TestWetDocuments:
    def test_shape_and_stable_ids(self, spark, wet_path):
        docs = wet_documents(read_wet(spark, wet_path))
        assert [f.name for f in docs.schema.fields] == [
            "doc_id", "url", "fetched_at", "text",
        ]
        assert dict(docs.dtypes)["doc_id"] == "bigint"
        a = {r.doc_id: r.url for r in docs.collect()}
        b = {r.doc_id: r.url for r in docs.collect()}
        assert a == b and len(a) == len(CONVERSIONS)

    def test_feeds_curation(self, spark, wet_path):
        # The adapter output drops straight into the dedup/curation
        # operators' expected (doc_id, text) contract.
        from lantern_spark.operators.dedup import exact_dedup

        docs = wet_documents(read_wet(spark, wet_path))
        survivors = exact_dedup(docs, text_col="text", id_col="doc_id")
        assert survivors.count() == len(CONVERSIONS)


class TestStreamWet:
    def test_landing_dir_stream(self, spark, tmp_path):
        from lantern_spark.sources.warc import stream_wet

        landing = tmp_path / "landing"
        landing.mkdir()
        write_warc(str(landing / "shard-0.warc.wet"), WET_RECORDS)

        stream = stream_wet(spark, str(landing), max_files_per_trigger=1)
        assert stream.isStreaming
        q = (
            stream.writeStream.format("memory")
            .queryName("wet_stream_t")
            .option(
                "checkpointLocation", str(tmp_path / "chk")
            )
            .start()
        )
        try:
            q.processAllAvailable()
            got = spark.sql("SELECT url, text FROM wet_stream_t").collect()
            assert len(got) == len(CONVERSIONS)
            # A newly-landed shard arrives in the next micro-batch.
            write_warc(
                str(landing / "shard-1.warc.wet"),
                [
                    {
                        "warc_type": "conversion",
                        "url": "https://late.example.com/",
                        "payload": "late-arriving shard",
                        "record_id": "<urn:uuid:late-1>",
                    }
                ],
            )
            q.processAllAvailable()
            got = spark.sql("SELECT url, text FROM wet_stream_t").collect()
            assert len(got) == len(CONVERSIONS) + 1
            assert {r.url for r in got} >= {"https://late.example.com/"}
        finally:
            q.stop()

    def test_stream_matches_batch(self, spark, tmp_path):
        from lantern_spark.sources.warc import stream_wet

        landing = tmp_path / "landing2"
        landing.mkdir()
        write_warc(str(landing / "a.warc.wet"), WET_RECORDS)
        stream = stream_wet(spark, str(landing))
        q = (
            stream.writeStream.format("memory")
            .queryName("wet_stream_b")
            .start()
        )
        try:
            q.processAllAvailable()
            got = {
                r.record_id: (r.url, r.text, r.content_length)
                for r in spark.sql("SELECT * FROM wet_stream_b").collect()
            }
        finally:
            q.stop()
        want = {
            r.record_id: (r.url, r.text, r.content_length)
            for r in read_wet(spark, str(landing / "a.warc.wet")).collect()
        }
        assert got == want


class TestWetToAssembly:
    """End-to-end integration: WET crawl shards → documents adapter →
    full pretraining assembly (curation → dedup → decontamination →
    packing). The crawl front door must feed the whole pipeline."""

    def test_crawl_to_packed_sequences(self, spark, tmp_path):
        import random

        from lantern_spark.operators.assemble import (
            assemble_pretraining_corpus,
        )
        from lantern_spark.operators.curate import CurationConfig
        from lantern_spark.sources.warc import read_wet, wet_documents

        rng = random.Random(11)
        words = [f"tok{i:03d}" for i in range(300)]

        def doc(n):
            return " ".join(words[rng.randrange(300)] for _ in range(n))

        body = doc(80)
        recs = []
        for i in range(20):
            recs.append(
                {
                    "warc_type": "conversion",
                    "url": f"https://site{i % 7}.example.com/p{i}",
                    "payload": doc(60) if i != 3 else body,
                    "record_id": f"<urn:uuid:e2e-{i:04d}>",
                }
            )
        # planted exact duplicate (same text, different URL) — the
        # exact-dedup tier must collapse it
        recs.append(
            {
                "warc_type": "conversion",
                "url": "https://mirror.example.org/copy",
                "payload": body,
                "record_id": "<urn:uuid:e2e-dup>",
            }
        )
        landing = tmp_path / "crawl"
        landing.mkdir()
        write_warc(str(landing / "shard-0.warc.wet"), recs[:11])
        write_warc(str(landing / "shard-1.warc.wet.gz"), recs[11:],
                   gzip_file=True)

        docs = wet_documents(read_wet(spark, str(landing)))
        assert docs.count() == 21

        res = assemble_pretraining_corpus(
            spark,
            docs,
            "text",
            "doc_id",
            str(tmp_path / "chk"),
            curation=CurationConfig(exact_dedup=True, min_tokens=5),
            seq_tokens=256,
        )
        # the duplicate collapsed, everything else survived
        assert res.stage_rows["exact_dedup"] == 20
        packed = res.df
        assert packed.count() > 0
        assert res.tokens_in > res.tokens_out > 0


class TestRecordBoundaryEdgeCases:
    """Review findings: the trailing-terminator strip must be
    Content-Length-guarded (a blind strip corrupts non-final records
    with empty or CRLFCRLF-ending payloads), and the record separator
    must be version-agnostic (a WARC/1.1 archive previously ingested
    as zero rows with no error)."""

    EDGE = [
        {"warc_type": "conversion", "url": "https://e/1",
         "payload": "", "record_id": "<urn:uuid:edge-empty-mid>"},
        {"warc_type": "conversion", "url": "https://e/2",
         "payload": "ends with terminator bytes\r\n\r\n",
         "record_id": "<urn:uuid:edge-crlf-mid>"},
        {"warc_type": "conversion", "url": "https://e/3",
         "payload": "normal middle doc",
         "record_id": "<urn:uuid:edge-normal>"},
        {"warc_type": "conversion", "url": "https://e/4",
         "payload": "", "record_id": "<urn:uuid:edge-empty-final>"},
    ]

    def _check(self, spark, path):
        fast = {
            r.record_id: r.text
            for r in read_wet(spark, str(path)).collect()
        }
        strict = {
            r.record_id: bytes(r.payload).decode("utf-8")
            for r in read_warc(
                spark, str(path), record_types=["conversion"]
            ).collect()
        }
        assert fast == strict
        want = {r["record_id"]: r["payload"] for r in self.EDGE}
        assert fast == want

    def test_empty_and_terminator_payloads_mid_file(self, spark, tmp_path):
        p = tmp_path / "edge.warc.wet"
        write_warc(str(p), self.EDGE)
        self._check(spark, p)

    def test_warc_1_1(self, spark, tmp_path):
        p = tmp_path / "v11.warc.wet"
        write_warc(str(p), self.EDGE, version="1.1")
        self._check(spark, p)
        rows = read_wet(spark, str(p)).collect()
        assert len(rows) == len(self.EDGE)  # not one giant dropped row


class TestSeparatorFalseSplit:
    def test_prose_about_warc_does_not_split(self, spark, tmp_path):
        # A blank line followed by 'WARC/' prose (pages ABOUT web
        # archiving) must not split the record: the separator requires
        # the full version LINE, not the bare prefix.
        body = (
            "intro paragraph.\r\n\r\nWARC/ files have headers; "
            "also\r\n\r\nWARC/1.1 adds fields but this line does not "
            "end after the version."
        )
        p = tmp_path / "prose.warc.wet"
        write_warc(
            str(p),
            [
                {"warc_type": "conversion", "url": "https://a/1",
                 "payload": body, "record_id": "<urn:uuid:prose-1>"},
                {"warc_type": "conversion", "url": "https://a/2",
                 "payload": "second record", "record_id": "<urn:uuid:prose-2>"},
            ],
        )
        rows = {r.record_id: r.text for r in read_wet(spark, str(p)).collect()}
        assert rows == {
            "<urn:uuid:prose-1>": body,
            "<urn:uuid:prose-2>": "second record",
        }

    def test_version_autodetect_and_pin(self, spark, tmp_path):
        p = tmp_path / "v11b.warc.wet"
        write_warc(
            str(p),
            [{"warc_type": "conversion", "url": "https://a/x",
              "payload": "doc", "record_id": "<urn:uuid:v11-1>"}],
            version="1.1",
        )
        assert read_wet(spark, str(p)).count() == 1          # auto
        assert read_wet(spark, str(p), version="1.1").count() == 1
        with pytest.raises(ValueError, match="not a WARC"):
            q = tmp_path / "junk.txt"
            q.write_text("hello world\r\nnot warc")
            read_wet(spark, str(q))


class TestWriteWet:
    """r11: distributed WET export — one shard per partition written
    worker-side, spec-conformant, round-tripping through read_wet."""

    def test_roundtrip_and_manifest(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from lantern_spark.sources.warc import read_wet, write_wet

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select(
            "doc_id",
            F.concat(F.lit("https://e/"), F.col("doc_id")).alias("url"),
            "text",
        ).repartition(3)
        out = str(tmp_path / "wet_out")
        manifest = write_wet(docs, out).collect()
        assert 1 <= len(manifest) <= 3
        assert sum(m.n_records for m in manifest) == docs.count()
        for m in manifest:
            assert m.shard_path.endswith(".warc.wet.gz")
            assert m.n_bytes > 0

        back = read_wet(spark, out)
        want = {
            (f"<urn:doc:{r.doc_id}>", r.url, r.text)
            for r in docs.collect()
        }
        got = {
            (r.record_id, r.url, r.text) for r in back.collect()
        }
        assert got == want

    def test_cr_text_raises(self, spark, tmp_path):
        from lantern_spark.sources.warc import write_wet

        docs = spark.createDataFrame(
            [(1, "https://x/1", "bad\r\nline endings")],
            "doc_id long, url string, text string",
        )
        with pytest.raises(Exception, match="CR"):
            write_wet(docs, str(tmp_path / "cr_out")).collect()

    def test_failed_task_leaves_no_staged_file(self, spark, tmp_path):
        """r13 advice: a task failing mid-shard (here the CR guard, on
        the SECOND record so a shard is already open) must close the
        handle and remove its `.inprogress.<pid>` staged file instead
        of leaking it into the output directory."""
        import os as _os

        from lantern_spark.sources.warc import write_wet

        out = tmp_path / "fail_out"
        docs = spark.createDataFrame(
            [(1, "https://x/1", "fine"), (2, "https://x/2", "bad\r\n")],
            "doc_id long, url string, text string",
        ).coalesce(1)
        with pytest.raises(Exception, match="CR"):
            write_wet(docs, str(out)).collect()
        leftovers = [
            f
            for f in (_os.listdir(out) if out.exists() else [])
            if ".inprogress." in f
        ]
        assert leftovers == [], leftovers

    def test_streaming_write_per_record(self, tmp_path):
        """r11 review nit 3: the sink must write records AS batches
        drain, not accumulate the partition in a list. A counting file
        proves it: with gzip off, every record lands as its own
        write() call — an accumulate-then-write sink shows one giant
        write. Exercises _write_wet_partition directly (the mapInArrow
        closure's core, minus TaskContext)."""
        import pyarrow as pa

        from lantern_spark.sources.warc import _write_wet_partition

        writes = []

        class _CountingFile:
            def __init__(self, path):
                self._fh = open(path, "wb")

            def write(self, b):
                writes.append(len(b))
                return self._fh.write(b)

            def close(self):
                self._fh.close()

        def batches():
            for lo in (0, 3):
                ids = [str(i) for i in range(lo, lo + 3)]
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(ids),
                        pa.array([f"https://e/{i}" for i in ids]),
                        pa.array([None] * 3, type=pa.string()),
                        pa.array([f"text-{i} " * 20 for i in ids]),
                    ],
                    names=["__id", "__url", "__date", "__text"],
                )

        manifest = list(
            _write_wet_partition(
                batches(), str(tmp_path), 0, gz=False,
                roll_bytes=None, open_fn=_CountingFile,
            )
        )
        assert len(manifest) == 1
        path, n, nbytes = manifest[0]
        assert n == 6
        # one write per record — never one accumulated blob
        assert len(writes) == 6
        assert max(w for w in writes) < nbytes

    def test_target_shard_mb_rolls(self, spark, tmp_path):
        """One giant partition must not make one giant shard: with a
        tiny target every few records roll into a new part-00000-SSS
        shard, and the union still round-trips record-for-record."""
        from pyspark.sql import functions as F

        from lantern_spark.sources.warc import read_wet, write_wet

        docs = spark.createDataFrame(
            [(i, "x" * 2000) for i in range(50)],
            "doc_id long, text string",
        ).select(
            "doc_id",
            F.concat(F.lit("https://e/"), F.col("doc_id")).alias("url"),
            "text",
        ).coalesce(1)
        out = str(tmp_path / "wet_rolled")
        manifest = write_wet(
            docs, out, target_shard_mb=0.01  # ~10 KB → ~5 records/shard
        ).collect()
        assert len(manifest) > 3
        assert sum(m.n_records for m in manifest) == 50
        names = sorted(m.shard_path for m in manifest)
        assert all("part-00000-" in p for p in names)
        back = read_wet(spark, out)
        assert back.count() == 50
        assert {r.record_id for r in back.collect()} == {
            f"<urn:doc:{i}>" for i in range(50)
        }

    def test_roll_boundary_conserves_records(self, tmp_path):
        """Property-flavored boundary check on the partition writer:
        for a sweep of roll thresholds (including one smaller than a
        single record and one larger than everything), every record
        lands in exactly one shard, shard sequence numbers are dense,
        and each non-final shard crossed the threshold."""
        import gzip as _gz

        import pyarrow as pa

        from lantern_spark.sources.warc import (
            _warc_record_bytes,
            _write_wet_partition,
            read_warc,
        )

        texts = [f"doc {i} " + "x" * (37 * (i % 7)) for i in range(23)]
        rec_sizes = [
            len(_warc_record_bytes({
                "warc_type": "conversion",
                "record_id": f"<urn:doc:{i}>",
                "url": f"https://e/{i}",
                "warc_date": "2026-01-01T00:00:00Z",
                "payload": t,
            }))
            for i, t in enumerate(texts)
        ]

        def batches():
            for lo in range(0, len(texts), 5):
                chunk = texts[lo:lo + 5]
                ids = [str(lo + j) for j in range(len(chunk))]
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(ids),
                        pa.array([f"https://e/{i}" for i in ids]),
                        pa.array([None] * len(chunk), type=pa.string()),
                        pa.array(chunk),
                    ],
                    names=["__id", "__url", "__date", "__text"],
                )

        for case, roll in enumerate(
            [1, 64, 200, 1000, sum(rec_sizes) + 1]
        ):
            out = str(tmp_path / f"case{case}")
            manifest = list(
                _write_wet_partition(batches(), out, 0, gz=False,
                                     roll_bytes=roll)
            )
            assert sum(n for _, n, _ in manifest) == len(texts)
            # dense shard sequence, one file per manifest row
            import os as _os

            names = sorted(p for p, _, _ in manifest)
            assert names == [
                _os.path.join(out, f"part-00000-{s:03d}.warc.wet")
                for s in range(len(manifest))
            ]
            # every non-final shard crossed the threshold (gz=False →
            # file bytes == uncompressed record bytes, the roll meter)
            for p, n, nbytes in manifest[:-1]:
                assert nbytes >= roll
            # all records present, in order, byte-exact framing
            all_ids = []
            for p, _, _ in manifest:
                with open(p, "rb") as fh:
                    data = fh.read()
                for line in data.split(b"\r\n"):
                    if line.startswith(b"WARC-Record-ID"):
                        all_ids.append(line.split(b":")[-1])
            assert len(all_ids) == len(texts)

    def test_export_then_reingest_feeds_curation(self, spark, tmp_path):
        """The interchange contract: an exported corpus re-enters the
        pipeline through the standard front door."""
        from pyspark.sql import functions as F

        from lantern_spark.operators.dedup import exact_dedup
        from lantern_spark.sources.warc import (
            read_wet,
            wet_documents,
            write_wet,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select(
            "doc_id",
            F.concat(F.lit("https://e/"), F.col("doc_id")).alias("url"),
            "text",
        )
        out = str(tmp_path / "wet_cycle")
        write_wet(docs, out).collect()
        reingested = wet_documents(read_wet(spark, out))
        survivors = exact_dedup(reingested, "text", "doc_id")
        assert survivors.count() <= docs.count()
        assert survivors.count() > 0


class TestFusedDocumentsPath:
    """r14 (review r13 stretch item 7 continued): warc_documents_fused
    — the one-Python-crossing crawl→documents tier — must be
    ROW-IDENTICAL to the staged warc_response_documents(read_warc())
    composition on every branch the staged path takes: gzip and
    chunked codings, corrupt bodies (dropped), non-200 statuses,
    non-HTML content types, non-response records, non-HTTP payloads
    under statuses=None, and charset sniffing."""

    def _archive(self, tmp_path):
        from lantern_spark.sources.warc import (
            build_http_response,
            write_warc,
        )

        latin = "café résumé".encode("latin-1")
        recs = [
            {"warc_type": "response", "url": "https://x.org/plain",
             "record_id": "<urn:t:1>",
             "content_type": "application/http; msgtype=response",
             "payload": build_http_response("<p>plain body</p>")},
            {"warc_type": "response", "url": "https://x.org/gz",
             "record_id": "<urn:t:2>",
             "content_type": "application/http; msgtype=response",
             "payload": build_http_response("<p>gzipped</p>",
                                            gzip_body=True)},
            {"warc_type": "response", "url": "https://x.org/chunk",
             "record_id": "<urn:t:3>",
             "content_type": "application/http; msgtype=response",
             "payload": build_http_response("<p>chunked</p>",
                                            chunked=True, gzip_body=True)},
            # corrupt gzip body -> staged path nulls+drops
            {"warc_type": "response", "url": "https://x.org/corrupt",
             "record_id": "<urn:t:4>",
             "content_type": "application/http; msgtype=response",
             "payload": (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                         b"Content-Encoding: gzip\r\n\r\nnot-gzip")},
            # 404 -> dropped under statuses=(200,)
            {"warc_type": "response", "url": "https://x.org/404",
             "record_id": "<urn:t:5>",
             "content_type": "application/http; msgtype=response",
             "payload": build_http_response("<p>gone</p>", status=404)},
            # css content type -> dropped under html_only
            {"warc_type": "response", "url": "https://x.org/css",
             "record_id": "<urn:t:6>",
             "content_type": "application/http; msgtype=response",
             "payload": build_http_response("body{}",
                                            content_type="text/css")},
            # non-response record -> never a document
            {"warc_type": "request", "url": "https://x.org/req",
             "record_id": "<urn:t:7>",
             "payload": b"GET / HTTP/1.1\r\n\r\n"},
            # latin-1 charset declared in the header
            {"warc_type": "response", "url": "https://x.org/latin",
             "record_id": "<urn:t:8>",
             "content_type": "application/http; msgtype=response",
             "payload": build_http_response(
                 latin, content_type="text/html; charset=latin-1")},
            # non-HTTP response payload (kept only when statuses=None)
            {"warc_type": "response", "url": "https://x.org/raw",
             "record_id": "<urn:t:9>",
             "content_type": "application/octet-stream",
             "payload": b"raw resource bytes, not an http message"},
        ]
        p = str(tmp_path / "fused.warc.gz")
        write_warc(p, recs, gzip_per_record=True)
        return p

    def _rows(self, df):
        return [
            (r.doc_id, r.url, r.fetched_at, r.text)
            for r in df.orderBy("doc_id").collect()
        ]

    def test_row_identical_to_staged(self, spark, tmp_path):
        from lantern_spark.functions.html import regex_text_extractor
        from lantern_spark.sources.warc import (
            read_warc,
            warc_documents_fused,
            warc_response_documents,
        )

        p = self._archive(tmp_path)
        ex = regex_text_extractor()
        for kw in (
            {},
            {"statuses": None},
            {"html_only": False},
            {"statuses": None, "html_only": False},
        ):
            staged = self._rows(
                warc_response_documents(
                    read_warc(spark, p), extractor=ex, **kw
                )
            )
            fused = self._rows(
                warc_documents_fused(spark, p, extractor=ex, **kw)
            )
            assert fused == staged, kw
            assert staged  # fixture actually produces documents
        # the default config keeps exactly the 200/html-ish docs
        got = {
            r[1]
            for r in self._rows(
                warc_documents_fused(spark, p, extractor=ex)
            )
        }
        assert got == {
            "https://x.org/plain", "https://x.org/gz",
            "https://x.org/chunk", "https://x.org/latin",
        }

    def test_default_extractor_matches_catalyst_tier(self, spark, tmp_path):
        """extractor=None: fused uses the byte-identical Python replay
        of EXTRACT_STEPS, staged uses the Catalyst expressions — the
        outputs must still agree (the corpus-equality contract)."""
        from lantern_spark.sources.warc import (
            read_warc,
            warc_documents_fused,
            warc_response_documents,
        )

        p = self._archive(tmp_path)
        staged = self._rows(
            warc_response_documents(read_warc(spark, p))
        )
        fused = self._rows(warc_documents_fused(spark, p))
        assert fused == staged

    def test_single_python_stage(self, spark, tmp_path):
        """The plan contains exactly ONE Python boundary (the fused
        mapInArrow) — no pandas-UDF stages downstream of it."""
        from lantern_spark.sources.warc import warc_documents_fused

        p = self._archive(tmp_path)
        plan = (
            warc_documents_fused(spark, p)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        import re as _re

        assert len(_re.findall(r"MapInArrow|PythonMapInArrow", plan)) >= 1
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
