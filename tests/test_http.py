"""HTTP message envelope for raw WARC ``response`` records, and the
bounded-memory streaming WARC parse.

Real Common Crawl ``response`` payloads are FULL HTTP messages
(status line + headers + CRLFCRLF + entity body, possibly gzipped or
chunked) — the r10 review found header lines leaking into extracted
text because the composition cast the payload straight to string.
These tests pin the fixed path end-to-end with real HTTP-message
fixtures in all three codings, and pin the parser's incremental-read
contract (peak buffer O(read_size + one record), never O(file))."""

import gzip
import io
import zlib

import pytest

from lantern_spark.sources.warc import (
    build_http_response,
    http_message,
    parse_warc_bytes,
    parse_warc_stream,
    read_warc,
    split_http_response,
    warc_response_documents,
    write_warc,
)

HTML = (
    "<html><head><title>T</title><script>var x=1;</script></head>"
    "<body><p>First paragraph of real article text.</p>"
    "<p>Second paragraph, still article text.</p></body></html>"
)
WANT_TEXT = "First paragraph of real article text."


class TestSplitHttpResponse:
    def test_identity(self):
        msg = build_http_response(HTML)
        headers, body = split_http_response(msg)
        assert headers["__status"] == "200"
        assert headers["content-type"].startswith("text/html")
        assert body == HTML.encode("utf-8")

    def test_gzip_content_encoding(self):
        msg = build_http_response(HTML, gzip_body=True)
        assert b"\x1f\x8b" in msg  # body really is compressed on the wire
        headers, body = split_http_response(msg)
        assert headers["content-encoding"] == "gzip"
        assert body == HTML.encode("utf-8")

    def test_chunked(self):
        msg = build_http_response(HTML, chunked=True)
        headers, body = split_http_response(msg)
        assert "chunked" in headers["transfer-encoding"]
        assert body == HTML.encode("utf-8")

    def test_chunked_gzip_combined(self):
        # sender applies content- then transfer-coding; receiver
        # removes transfer- then content-coding
        msg = build_http_response(HTML, gzip_body=True, chunked=True)
        _, body = split_http_response(msg)
        assert body == HTML.encode("utf-8")

    def test_deflate_zlib_and_raw(self):
        raw = b"deflated body bytes"
        # zlib-wrapped
        msg = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n"
            + zlib.compress(raw)
        )
        assert split_http_response(msg)[1] == raw
        # raw deflate (the wild's broken-but-common variant)
        co = zlib.compressobj(wbits=-zlib.MAX_WBITS)
        msg = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n"
            + co.compress(raw) + co.flush()
        )
        assert split_http_response(msg)[1] == raw

    def test_non_http_passthrough(self):
        blob = bytes(range(256))
        headers, body = split_http_response(blob)
        assert headers == {} and body == blob

    def test_headers_only_message(self):
        headers, body = split_http_response(b"HTTP/1.1 304 Not Modified")
        assert headers["__status"] == "304" and body == b""

    def test_lf_only_headers(self):
        msg = b"HTTP/1.0 200 OK\nContent-Type: text/plain\n\nbody here"
        headers, body = split_http_response(msg)
        assert headers["content-type"] == "text/plain"
        assert body == b"body here"

    def test_truncated_chunk_raises(self):
        msg = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nff\r\nshort"
        with pytest.raises(ValueError, match="truncated chunk"):
            split_http_response(msg)

    def test_chunk_missing_crlf_raises(self):
        # r11 advice: a wrong size line must fail AT the corrupt chunk,
        # not silently swallow adjacent bytes until a later size-line
        # parse happens to break
        msg = (
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
            b"3\r\nabcXX5\r\nhello\r\n0\r\n\r\n"
        )
        with pytest.raises(ValueError, match="not followed by"):
            split_http_response(msg)

    def test_unknown_coding_raises(self):
        # 'compress' (LZW) — genuinely unsupported regardless of
        # optional libraries ('br' has its own gated test below)
        msg = b"HTTP/1.1 200 OK\r\nContent-Encoding: compress\r\n\r\nxxxx"
        with pytest.raises(ValueError, match="unsupported"):
            split_http_response(msg)


class TestHttpMessageColumn:
    def test_struct_fields_and_corrupt_null(self, spark):
        rows = [
            (1, build_http_response(HTML)),
            (2, build_http_response(HTML, gzip_body=True)),
            # corrupt gzip body: must null out, not kill the job
            (3, b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnot gzip"),
            (4, None),
            (5, b"plain non-http payload"),
        ]
        df = spark.createDataFrame(rows, "id long, payload binary")
        got = {
            r.id: r
            for r in df.select(
                "id", http_message("payload").alias("h")
            ).select("id", "h.*").collect()
        }
        assert got[1].http_status == 200
        assert WANT_TEXT in got[1].http_body
        assert "HTTP/1.1" not in got[1].http_body
        assert WANT_TEXT in got[2].http_body
        assert got[3].http_body is None and got[3].http_status is None
        assert got[4].http_body is None
        assert got[5].http_status is None
        assert got[5].http_body == "plain non-http payload"

    def test_charset_from_content_type(self, spark):
        body = "café résumé".encode("latin-1")
        msg = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=ISO-8859-1\r\n\r\n" + body
        )
        df = spark.createDataFrame([(1, msg)], "id long, payload binary")
        row = df.select(http_message("payload").alias("h")).first()
        assert row.h.http_body == "café résumé"


class TestWarcResponseComposition:
    """The end-to-end raw-crawl → documents path on REAL HTTP-message
    payloads (identity + gzip + chunked variants), plus rows the
    filters must drop — no header text may survive into the corpus."""

    @pytest.fixture(scope="class")
    def crawl_path(self, tmp_path_factory):
        p = tmp_path_factory.mktemp("crawl") / "crawl.warc"
        ct = "application/http; msgtype=response"
        write_warc(
            str(p),
            [
                {
                    "warc_type": "response",
                    "url": "https://example.com/plain",
                    "payload": build_http_response(HTML),
                    "content_type": ct,
                    "record_id": "<urn:uuid:http-1>",
                },
                {
                    "warc_type": "response",
                    "url": "https://example.com/gzipped",
                    "payload": build_http_response(HTML, gzip_body=True),
                    "content_type": ct,
                    "record_id": "<urn:uuid:http-2>",
                },
                {
                    "warc_type": "response",
                    "url": "https://example.com/chunked",
                    "payload": build_http_response(HTML, chunked=True),
                    "content_type": ct,
                    "record_id": "<urn:uuid:http-3>",
                },
                {
                    "warc_type": "response",
                    "url": "https://example.com/404",
                    "payload": build_http_response(
                        "<html>not found</html>", status=404
                    ),
                    "content_type": ct,
                    "record_id": "<urn:uuid:http-4>",
                },
                {
                    "warc_type": "response",
                    "url": "https://example.com/img.jpg",
                    "payload": build_http_response(
                        b"\xff\xd8\xff\xe0JPEGBYTES", content_type="image/jpeg"
                    ),
                    "content_type": ct,
                    "record_id": "<urn:uuid:http-5>",
                },
                {
                    "warc_type": "request",
                    "url": "https://example.com/plain",
                    "payload": b"GET /plain HTTP/1.1\r\nHost: example.com\r\n\r\n",
                    "content_type": "application/http; msgtype=request",
                    "record_id": "<urn:uuid:http-6>",
                },
                # r11 advice: text/* subtypes that are NOT documents
                # must not slip through the html_only gate ...
                {
                    "warc_type": "response",
                    "url": "https://example.com/style.css",
                    "payload": build_http_response(
                        "body { color: red; }", content_type="text/css"
                    ),
                    "content_type": ct,
                    "record_id": "<urn:uuid:http-7>",
                },
                {
                    "warc_type": "response",
                    "url": "https://example.com/app.js",
                    "payload": build_http_response(
                        "function f() { return 1; }",
                        content_type="text/javascript",
                    ),
                    "content_type": ct,
                    "record_id": "<urn:uuid:http-8>",
                },
                # ... while text/plain IS a document
                {
                    "warc_type": "response",
                    "url": "https://example.com/readme.txt",
                    "payload": build_http_response(
                        "plain text document body",
                        content_type="text/plain; charset=utf-8",
                    ),
                    "content_type": ct,
                    "record_id": "<urn:uuid:http-9>",
                },
            ],
        )
        return str(p)

    def test_documents_have_no_header_text(self, spark, crawl_path):
        docs = warc_response_documents(
            read_warc(spark, crawl_path)
        ).collect()
        by_url = {r.url: r.text for r in docs}
        assert set(by_url) == {
            "https://example.com/plain",
            "https://example.com/gzipped",
            "https://example.com/chunked",
            "https://example.com/readme.txt",  # text/plain is a document
        }
        assert "plain text document" in by_url.pop(
            "https://example.com/readme.txt"
        )
        for text in by_url.values():
            assert WANT_TEXT in text
            assert "var x" not in text  # script stripped by html tier
            for leak in ("HTTP/1.1", "Content-Type", "Content-Encoding",
                         "Transfer-Encoding", "200 OK"):
                assert leak not in text

    def test_css_js_content_types_rejected(self, spark, crawl_path):
        """html_only admits html / text/plain / missing-header ONLY —
        stylesheet and script bodies are not training documents
        (r11 advice: a blanket text/* gate let them through)."""
        urls = {
            r.url
            for r in warc_response_documents(
                read_warc(spark, crawl_path)
            ).collect()
        }
        assert "https://example.com/style.css" not in urls
        assert "https://example.com/app.js" not in urls

    def test_statuses_none_keeps_error_pages(self, spark, crawl_path):
        docs = warc_response_documents(
            read_warc(spark, crawl_path), statuses=None
        )
        urls = {r.url for r in docs.collect()}
        assert "https://example.com/404" in urls


class _CountingReader(io.RawIOBase):
    """File-like wrapper that records how many bytes have been read —
    the injection point that proves the parser consumes its input
    incrementally instead of slurping it whole."""

    def __init__(self, raw: bytes):
        self._fp = io.BytesIO(raw)
        self.bytes_read = 0

    def read(self, n=-1):
        chunk = self._fp.read(n)
        self.bytes_read += len(chunk)
        return chunk

    def readable(self):
        return True


class TestStreamingParseMemoryBound:
    def _records(self, n=64, size=4096):
        import random

        rng = random.Random(42)  # incompressible: gzip can't collapse
        return [
            {
                "warc_type": "conversion",
                "url": f"https://m/{i}",
                "payload": rng.randbytes(size),
                "record_id": f"<urn:uuid:mem-{i}>",
            }
            for i in range(n)
        ]

    def test_plain_input_read_incrementally(self, tmp_path):
        p = tmp_path / "mem.warc"
        recs = self._records()
        write_warc(str(p), recs)
        raw = p.read_bytes()
        read_size = 8192
        fp = _CountingReader(raw)
        seen = 0
        for i, (hdrs, payload) in enumerate(
            parse_warc_stream(fp, read_size=read_size)
        ):
            assert payload == recs[i]["payload"]
            seen += len(payload)
            # at each yield the parser may only be one read_size + one
            # record ahead of what it has emitted — a slurped file
            # would show bytes_read == len(raw) at the FIRST yield
            assert fp.bytes_read <= seen + 3 * read_size + 512
        assert seen == sum(len(r["payload"]) for r in recs)

    def test_gzip_input_decompressed_incrementally(self, tmp_path):
        p = tmp_path / "mem.warc.gz"
        recs = self._records()
        write_warc(str(p), recs, gzip_per_record=True)
        compressed = p.read_bytes()
        fp = _CountingReader(compressed)
        gz = gzip.GzipFile(fileobj=fp)
        first_yield_read = None
        out = []
        for hdrs, payload in parse_warc_stream(gz, read_size=8192):
            if first_yield_read is None:
                first_yield_read = fp.bytes_read
            out.append(payload)
        # eager decompression would have read the WHOLE compressed
        # buffer before the first record came out
        assert first_yield_read < len(compressed) / 2
        assert out == [r["payload"] for r in recs]

    def test_bytes_path_matches_stream_path(self, tmp_path):
        p = tmp_path / "eq.warc.gz"
        recs = self._records(n=9, size=777)
        write_warc(str(p), recs, gzip_per_record=True)
        buf = p.read_bytes()
        via_bytes = [(h, b) for h, b in parse_warc_bytes(buf)]
        via_stream = [
            (h, b)
            for h, b in parse_warc_stream(gzip.GzipFile(fileobj=io.BytesIO(buf)))
        ]
        assert via_bytes == via_stream

    def test_record_much_larger_than_read_size(self, tmp_path):
        """A payload ≫ read_size must parse byte-exact through the
        list-accumulate ensure() (r11 advice: `buf += chunk` in a loop
        re-copied the growing buffer per chunk — quadratic for a
        100 MB media payload read in 1 MB chunks)."""
        import random

        payload = random.Random(7).randbytes(3 * 1024 * 1024)
        p = tmp_path / "big.warc"
        write_warc(
            str(p),
            [{
                "warc_type": "resource",
                "url": "https://m/big",
                "payload": payload,
                "record_id": "<urn:uuid:big-1>",
            }],
        )
        with open(str(p), "rb") as fh:
            recs = list(parse_warc_stream(fh, read_size=4096))
        assert len(recs) == 1
        assert recs[0][1] == payload

    def test_header_bomb_bounded(self):
        # a 'record' whose header block never terminates must error
        # instead of buffering without limit
        bomb = b"WARC/1.0\r\n" + b"X: y\r\n" * 100000
        with pytest.raises(ValueError, match="header block"):
            list(
                parse_warc_stream(
                    io.BytesIO(bomb), read_size=4096, max_header_bytes=65536
                )
            )


class TestStreamWarc:
    """r11: the raw-archive streaming twin — landing-dir archives
    parse per micro-batch through the same strict parser, and the
    full response → documents composition runs on the stream."""

    def _write_shard(self, path, i):
        write_warc(
            str(path),
            [
                {
                    "warc_type": "response",
                    "url": f"https://stream.example.com/{i}/{j}",
                    "payload": build_http_response(
                        HTML, gzip_body=(j % 2 == 0)
                    ),
                    "content_type": "application/http; msgtype=response",
                    "record_id": f"<urn:uuid:sw-{i}-{j}>",
                }
                for j in range(3)
            ],
            gzip_per_record=True,
        )

    def test_stream_matches_batch_and_picks_up_late_shards(
        self, spark, tmp_path
    ):
        from lantern_spark.sources.warc import read_warc, stream_warc

        land = tmp_path / "land"
        land.mkdir()
        self._write_shard(land / "a.warc.gz", 0)

        out = tmp_path / "out"
        q = (
            warc_response_documents(
                stream_warc(spark, str(land), max_files_per_trigger=1)
            )
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(tmp_path / "chk"))
            .start()
        )
        try:
            q.processAllAvailable()
            # a late shard lands mid-stream
            self._write_shard(land / "b.warc.gz", 1)
            q.processAllAvailable()
        finally:
            q.stop()

        got = spark.read.parquet(str(out))
        batch = warc_response_documents(read_warc(spark, str(land)))
        g = sorted((r.url, r.text) for r in got.collect())
        b = sorted((r.url, r.text) for r in batch.collect())
        assert g == b and len(g) == 6
        for _, text in g:
            assert WANT_TEXT in text
            assert "HTTP/1.1" not in text


class TestCharsetAndCodingFallbacks:
    def test_meta_charset_sniff_when_header_silent(self, spark):
        page = (
            '<html><head><meta charset="ISO-8859-1"></head>'
            "<body><p>café résumé</p></body></html>"
        ).encode("latin-1")
        msg = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + page
        row = (
            spark.createDataFrame([(1, msg)], "id long, payload binary")
            .select(http_message("payload").alias("h"))
            .first()
        )
        assert "café résumé" in row.h.http_body

    def test_header_charset_beats_meta(self, spark):
        # header says latin-1; a (stale) meta claims utf-8 — header wins
        page = (
            '<html><head><meta charset="utf-8"></head>'
            "<body>café</body></html>"
        ).encode("latin-1")
        msg = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=ISO-8859-1\r\n\r\n" + page
        )
        row = (
            spark.createDataFrame([(1, msg)], "id long, payload binary")
            .select(http_message("payload").alias("h"))
            .first()
        )
        assert "café" in row.h.http_body

    def test_brotli_gated_loudly(self):
        msg = b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\nxxxx"
        try:
            import brotli  # noqa: F401

            have = True
        except ImportError:
            have = False
        if have:
            with pytest.raises(Exception):  # xxxx is not valid brotli
                split_http_response(msg)
        else:
            with pytest.raises(ValueError, match="brotli"):
                split_http_response(msg)


class TestWarcMediaRecords:
    """r11: the multimodal branch of the crawl demux — image/audio
    responses land in the canonical media-table shape with byte-exact
    content; text/html and error rows are excluded."""

    def test_demux_to_media_table(self, spark, tmp_path):
        from lantern_spark.operators.multimodal import media_schema
        from lantern_spark.sources.warc import warc_media_records

        jpeg = b"\xff\xd8\xff\xe0" + bytes(range(64))
        wav = b"RIFF" + bytes(range(32))
        p = tmp_path / "media.warc"
        ct = "application/http; msgtype=response"
        write_warc(
            str(p),
            [
                {
                    "warc_type": "response",
                    "url": "https://m.example.com/a.jpg",
                    "payload": build_http_response(
                        jpeg, content_type="image/jpeg", gzip_body=True
                    ),
                    "content_type": ct,
                    "record_id": "<urn:uuid:m-1>",
                },
                {
                    "warc_type": "response",
                    "url": "https://m.example.com/b.wav",
                    "payload": build_http_response(
                        wav, content_type="audio/x-wav"
                    ),
                    "content_type": ct,
                    "record_id": "<urn:uuid:m-2>",
                },
                {
                    "warc_type": "response",
                    "url": "https://m.example.com/page",
                    "payload": build_http_response(HTML),
                    "content_type": ct,
                    "record_id": "<urn:uuid:m-3>",
                },
                {
                    "warc_type": "response",
                    "url": "https://m.example.com/404.png",
                    "payload": build_http_response(
                        b"x", content_type="image/png", status=404
                    ),
                    "content_type": ct,
                    "record_id": "<urn:uuid:m-4>",
                },
            ],
        )
        media = warc_media_records(read_warc(spark, str(p)))
        rows = {r.url: r for r in media.collect()}
        assert set(rows) == {
            "https://m.example.com/a.jpg",
            "https://m.example.com/b.wav",
        }
        a = rows["https://m.example.com/a.jpg"]
        assert bytes(a.content) == jpeg  # gzip coding removed, bytes exact
        assert a.meta.media_type == "image" and a.meta.format == "jpeg"
        b = rows["https://m.example.com/b.wav"]
        assert bytes(b.content) == wav
        assert b.meta.media_type == "audio" and b.meta.format == "x-wav"
        # schema-compatible with the multimodal operators
        core = media.select("media_id", "content", "meta")
        assert [f.name for f in core.schema.fields] == [
            f.name for f in media_schema().fields
        ]
        # per-field name + type (nullability differs harmlessly:
        # regexp_extract is non-nullable, a stricter subtype)
        got_meta = core.schema["meta"].dataType
        want_meta = media_schema()["meta"].dataType
        assert [(f.name, f.dataType) for f in got_meta.fields] == [
            (f.name, f.dataType) for f in want_meta.fields
        ]

    def test_feeds_multimodal_features(self, spark, tmp_path):
        """The demuxed table drives operators/multimodal directly —
        the plumbing contract (decode itself is that module's stub)."""
        from lantern_spark.operators.codecs import encode_bmp
        from lantern_spark.operators.multimodal import image_features
        import numpy as np

        px = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
        p = tmp_path / "bmp.warc"
        write_warc(
            str(p),
            [
                {
                    "warc_type": "response",
                    "url": "https://m.example.com/t.bmp",
                    "payload": build_http_response(
                        encode_bmp(px), content_type="image/bmp"
                    ),
                    "content_type": "application/http; msgtype=response",
                    "record_id": "<urn:uuid:m-bmp>",
                }
            ],
        )
        from lantern_spark.sources.warc import warc_media_records

        media = warc_media_records(read_warc(spark, str(p)))
        feats = image_features(media.select("media_id", "content", "meta"))
        row = feats.first()
        assert row is not None


class TestCdxIndex:
    """r11: the CDXJ capture index (Common Crawl cc-index shards) —
    the planning layer that turns '1% of a 100 TB crawl' into a
    filtered index scan plus range reads."""

    ROWS = [
        {
            "urlkey": "com,example)/page", "timestamp": "20260101120000",
            "url": "https://example.com/page", "mime": "text/html",
            "mime-detected": "text/html", "status": "200",
            "digest": "AAAABBBB", "length": "1234", "offset": "0",
            "filename": "crawl/part-0001.warc.gz", "languages": "eng",
        },
        {
            "urlkey": "com,example)/img.jpg", "timestamp": "20260101120001",
            "url": "https://example.com/img.jpg", "mime": "image/jpeg",
            "status": "200", "digest": "CCCCDDDD", "length": "999",
            "offset": "1234", "filename": "crawl/part-0001.warc.gz",
        },
        {
            "urlkey": "org,other)/x", "timestamp": "20260101120002",
            "url": "https://other.org/x", "mime": "text/html",
            "status": "404", "digest": "EEEEFFFF", "length": "50",
            "offset": "2233", "filename": "crawl/part-0002.warc.gz",
        },
    ]

    def test_read_typed_rows(self, spark, tmp_path):
        from lantern_spark.sources.warc import read_cdx, write_cdx

        p = tmp_path / "cdx-00000"
        write_cdx(str(p), self.ROWS)
        got = {r.urlkey: r for r in read_cdx(spark, str(p)).collect()}
        assert len(got) == 3
        pg = got["com,example)/page"]
        assert pg.status == 200 and pg.length == 1234 and pg.offset == 0
        assert pg.mime == "text/html" and pg.languages == "eng"
        assert pg.ts.strftime("%Y%m%d%H%M%S") == "20260101120000"
        assert got["org,other)/x"].status == 404

    def test_malformed_lines_null_rows_not_job(self, spark, tmp_path):
        """r11 advice (medium): under ANSI mode element_at threw on any
        line with < 3 space-separated fields — one blank or truncated
        line aborted the whole ~200 GB index scan. Malformed lines must
        drop; valid lines must survive."""
        from lantern_spark.sources.warc import read_cdx, write_cdx

        p = tmp_path / "cdx-00009"
        write_cdx(str(p), self.ROWS[:1])
        with open(str(p), "a", encoding="utf-8") as fh:
            fh.write("\n")                      # blank line
            fh.write("com,trunc)/only-urlkey\n")  # 1 field
            fh.write("com,trunc)/x 20260101120000\n")  # 2 fields, no JSON
            fh.write("com,trunc)/y 20260101120000 notjson\n")  # non-{ json
        got = read_cdx(spark, str(p)).collect()
        assert [r.urlkey for r in got] == ["com,example)/page"]

    def test_plan_selects_ranges(self, spark, tmp_path):
        # the crawl-planning query: html 200s only → (filename,
        # offset, length) fetch list
        from pyspark.sql import functions as F

        from lantern_spark.sources.warc import read_cdx, write_cdx

        p = tmp_path / "cdx-00001"
        write_cdx(str(p), self.ROWS)
        fetch = (
            read_cdx(spark, str(p))
            .where((F.col("status") == 200) & (F.col("mime") == "text/html"))
            .select("filename", "offset", "length")
            .collect()
        )
        assert [(r.filename, r.offset, r.length) for r in fetch] == [
            ("crawl/part-0001.warc.gz", 0, 1234)
        ]

    def test_jvm_only_plan(self, spark, tmp_path):
        from lantern_spark.sources.warc import read_cdx, write_cdx

        p = tmp_path / "cdx-00002"
        write_cdx(str(p), self.ROWS)
        plan = (
            read_cdx(spark, str(p))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "EvalPython" not in plan

    def test_surt_key_joins_against_urlkey(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from lantern_spark.operators.weburl import surt_key
        from lantern_spark.sources.warc import read_cdx, write_cdx

        p = tmp_path / "cdx-00003"
        rows = list(self.ROWS) + [{
            # cc-index canonical form: port kept on the host part,
            # query params alphabetized (r12 surt_key parity)
            "urlkey": "com,example:8080)/q?a=1&b=2",
            "timestamp": "20260101120003",
            "url": "http://example.com:8080/q?b=2&a=1",
            "mime": "text/html", "status": "200", "digest": "GGGGHHHH",
            "length": "77", "offset": "3000",
            "filename": "crawl/part-0002.warc.gz",
        }]
        write_cdx(str(p), rows)
        urls = spark.createDataFrame(
            [
                (1, "https://www.example.com/page"),
                (2, "https://missing.example.net/zzz"),
                (3, "http://example.com:8080/q?b=2&a=1"),
            ],
            "i long, u string",
        )
        hits = (
            urls.withColumn("urlkey", surt_key("u"))
            .join(read_cdx(spark, str(p)), "urlkey", "inner")
            .collect()
        )
        assert sorted(r.i for r in hits) == [1, 3]

    def test_surt_goldens(self, spark):
        from lantern_spark.operators.weburl import surt_key

        cases = [
            ("https://www.Example.co.uk/A/b?x=1", "uk,co,example)/a/b?x=1"),
            ("http://sub.test.com", "com,test,sub)/"),
            ("https://example.com/p#frag", "com,example)/p"),
            # r12 (advice): query params sort, non-default ports kept
            ("https://example.com/p?b=2&a=1", "com,example)/p?a=1&b=2"),
            ("http://example.com:8080/x", "com,example:8080)/x"),
            ("https://example.com:443/x", "com,example)/x"),
            ("http://example.com:80/x", "com,example)/x"),
            # r13 (advice): IA canonicalizer parity — empty path keys
            # as '/', empty query params from '&' runs are dropped
            ("https://example.com?b=2&a=1", "com,example)/?a=1&b=2"),
            ("https://example.com/p?&a=1", "com,example)/p?a=1"),
            ("https://example.com/p?a=1&&b=2&", "com,example)/p?a=1&b=2"),
            ("https://example.com/p?", "com,example)/p"),
            ("not a url", ""),
        ]
        df = spark.createDataFrame(
            [(i, u) for i, (u, _) in enumerate(cases)], "i long, u string"
        )
        got = {
            r.i: r.k
            for r in df.select(
                "i", surt_key("u").alias("k")
            ).collect()
        }
        for i, (u, want) in enumerate(cases):
            assert got[i] == want, (u, got[i], want)


class TestReadWarcRanges:
    """r11: index-planned range fetch — filter the CDX, read ONLY the
    selected per-record gzip members, byte-exact."""

    def test_cdx_planned_fetch_end_to_end(self, spark, tmp_path):
        import gzip as _gz

        from pyspark.sql import functions as F

        from lantern_spark.sources.warc import (
            read_cdx,
            read_warc_ranges,
            write_cdx,
        )

        # build a per-record-gzip archive BY HAND so we know each
        # member's exact (offset, length) — what the real index records
        archive = tmp_path / "part-0001.warc.gz"
        members = []
        rows = []
        off = 0
        for i, (url, ctype, body) in enumerate([
            ("https://a.example/pg1", "text/html",
             build_http_response(HTML)),
            ("https://a.example/img", "image/jpeg",
             build_http_response(b"JPEGBYTES", content_type="image/jpeg")),
            ("https://a.example/pg2", "text/html",
             build_http_response(HTML, gzip_body=True)),
        ]):
            single = tmp_path / f"one{i}.warc"
            write_warc(
                str(single),
                [{
                    "warc_type": "response", "url": url,
                    "payload": body,
                    "content_type": "application/http; msgtype=response",
                    "record_id": f"<urn:uuid:rng-{i}>",
                }],
            )
            member = _gz.compress(single.read_bytes())
            members.append(member)
            rows.append({
                "urlkey": f"example,a)/pg{i}", "timestamp": "20260101000000",
                "url": url, "mime": ctype, "status": "200",
                "digest": f"D{i}", "length": str(len(member)),
                "offset": str(off), "filename": "part-0001.warc.gz",
            })
            off += len(member)
        archive.write_bytes(b"".join(members))
        cdx = tmp_path / "cdx-0"
        write_cdx(str(cdx), rows)

        # plan: html-only → fetch only those 2 ranges
        plan = read_cdx(spark, str(cdx)).where(
            F.col("mime") == "text/html"
        ).select("filename", "offset", "length")
        fetched = read_warc_ranges(
            spark, plan, base_path=str(tmp_path)
        ).collect()
        assert sorted(r.url for r in fetched) == [
            "https://a.example/pg1", "https://a.example/pg2",
        ]
        # payloads byte-exact (incl. the gzip-coded body member)
        docs_text = {
            r.url: bytes(r.payload) for r in fetched
        }
        assert docs_text["https://a.example/pg1"] == build_http_response(HTML)

    def test_injected_ranged_opener_reads_only_ranges(self, spark, tmp_path):
        """r11 review item 3: the storage backend is pluggable
        (``open_fn``) so object-store ranged GETs slot in where a real
        crawl lives. A logging fake proves the fetch path does
        per-range seek+read — never a whole-archive read — and returns
        byte-identical records."""
        import gzip as _gz

        from lantern_spark.sources.warc import read_warc_ranges, write_warc

        members, rows = [], []
        off = 0
        for i in range(3):
            single = tmp_path / f"m{i}.warc"
            write_warc(
                str(single),
                [{
                    "warc_type": "resource",
                    "url": f"https://r.example/{i}",
                    "payload": (f"payload-{i}" * 50).encode(),
                    "record_id": f"<urn:uuid:opener-{i}>",
                }],
            )
            member = _gz.compress(single.read_bytes())
            members.append(member)
            rows.append((f"part-9.warc.gz", off, len(member)))
            off += len(member)
        (tmp_path / "part-9.warc.gz").write_bytes(b"".join(members))

        log = tmp_path / "reads.log"
        archive = str(tmp_path / "part-9.warc.gz")
        log_path = str(log)

        class _LoggingRangedFile:
            """Fake object-store file: every seek+read pair is logged
            like one ranged GET would be issued."""

            def __init__(self, path):
                self._fh = open(path, "rb")
                self._pos = 0

            def seek(self, o):
                self._pos = o
                return self._fh.seek(o)

            def read(self, n=-1):
                data = self._fh.read(n)
                with open(log_path, "a") as lf:
                    lf.write(f"{self._pos},{len(data)}\n")
                self._pos += len(data)
                return data

            def close(self):
                self._fh.close()

        # select only the MIDDLE member
        sel = spark.createDataFrame(
            [("part-9.warc.gz", rows[1][1], rows[1][2])],
            "filename string, offset long, length long",
        )
        got = read_warc_ranges(
            spark,
            sel,
            base_path=str(tmp_path),
            open_fn=_LoggingRangedFile,
        ).collect()
        assert [r.url for r in got] == ["https://r.example/1"]
        assert bytes(got[0].payload) == ("payload-1" * 50).encode()

        reads = [
            tuple(map(int, line.split(",")))
            for line in log.read_text().splitlines()
        ]
        total_archive = sum(len(m) for m in members)
        # only the selected member's bytes were read — one ranged GET
        assert reads == [(rows[1][1], rows[1][2])]
        assert sum(n for _, n in reads) < total_archive

    def test_missing_columns_and_corrupt_range(self, spark, tmp_path):
        from lantern_spark.sources.warc import read_warc_ranges

        bad = spark.createDataFrame([(1,)], "x long")
        with pytest.raises(ValueError, match="missing columns"):
            read_warc_ranges(spark, bad)

        f = tmp_path / "junk.warc.gz"
        f.write_bytes(b"not a gzip member at all")
        ranges = spark.createDataFrame(
            [("junk.warc.gz", 0, 10)], "filename string, offset long, length long"
        )
        with pytest.raises(Exception, match="corrupt range"):
            read_warc_ranges(
                spark, ranges, base_path=str(tmp_path)
            ).collect()


class TestCdxGzipShards:
    def test_read_gzipped_index(self, spark, tmp_path):
        import gzip as _gz

        from lantern_spark.sources.warc import read_cdx, write_cdx

        plain = tmp_path / "cdx-plain"
        write_cdx(str(plain), TestCdxIndex.ROWS)
        gz = tmp_path / "cdx-00000.gz"
        gz.write_bytes(_gz.compress(plain.read_bytes()))
        got = read_cdx(spark, str(gz)).collect()
        assert len(got) == 3  # Hadoop codec handles the shard
        assert {r.status for r in got} == {200, 404}
