"""WARC / WET (Common Crawl) ingestion sources.

WARC (ISO 28500, the IIPC warc-specifications) is THE bulk input
format for web-scale pretraining corpora: Common Crawl alone ships
~100 TB/crawl as ``*.warc.gz`` (raw fetches) and ``*.warc.wet.gz``
(extracted plain text, ``WARC-Type: conversion``). The reference
ingests vectors and text through files and HTTP (its dotvecs/FTP
fetchers, ``lantern_extras/src/dotvecs.rs``); a Spark training-data
pipeline ingests the crawl itself, so this module is the missing front
door to `operators/curate`, `operators/dedup`, and
`operators/assemble`.

Record grammar (WARC 1.0/1.1)::

    WARC/1.0\\r\\n
    <Name>: <value>\\r\\n ...          # headers
    \\r\\n                             # end of header block
    <Content-Length bytes of block>   # payload
    \\r\\n\\r\\n                       # record terminator

Two readers, two contracts:

- :func:`read_wet` — the FAST path for WET text. One
  ``spark.read.text`` with a multi-byte ``lineSep`` record splitter
  (the JVM scanner splits records, Python never touches the bytes)
  followed by pure Catalyst ``regexp_extract`` header parsing — the
  whole plan is scan + project inside whole-stage codegen, no UDF.
  ``.gz`` inputs decompress through the Hadoop codec (one task per
  file — gzip is unsplittable, which is why Common Crawl ships ~1 GB
  × 90k files per crawl; the FILE is the unit of parallelism).
  Splitting on the record separator instead of Content-Length is
  byte-exact unless a payload itself contains
  ``\\r\\n\\r\\nWARC/1.0\\r\\n`` (never produced by text extraction;
  the strict parser below is the fallback for hostile inputs).
- :func:`read_warc` — the STRICT, binary-safe parser for raw WARC:
  ``binaryFile`` listing + a ``mapInArrow`` generator over
  :func:`parse_warc_stream`, an INCREMENTAL Content-Length state
  machine (payloads may be arbitrary binary — images, gzip members,
  HTTP bodies — so no text decode of the block). Multi-member gzip
  (Common Crawl writes each record as its own gzip member so HTTP
  range reads can seek) streams member-by-member through
  ``gzip.GzipFile`` — peak task memory is O(read_size + one record),
  never O(decompressed archive) (r11).

Both readers have landing-dir STREAMING twins (:func:`stream_wet`,
:func:`stream_warc`) sharing the batch implementations.

:func:`wet_documents` adapts either reader's output to the
``documents`` table shape (doc_id/url/text) that every downstream
curation / dedup / assembly operator consumes;
:func:`warc_response_documents` (text) and :func:`warc_media_records`
(image/audio/video) demux raw ``response`` records from ONE
``read_warc`` scan.

Raw ``response`` records are FULL HTTP MESSAGES (WARC spec,
``Content-Type: application/http; msgtype=response``): status line +
headers + ``\\r\\n\\r\\n`` + entity body, with the body possibly
gzip-compressed (``Content-Encoding``) or chunked
(``Transfer-Encoding``). :func:`split_http_response` peels that
envelope and :func:`warc_response_documents` composes the whole
raw-crawl → documents path (read_warc → HTTP split → html_to_text →
documents) — without it, HTTP header lines leak into extracted text
(r10 review finding).
"""

from __future__ import annotations

import gzip
import io
import re
import uuid
import zlib
from typing import (
    BinaryIO,
    Callable,
    Iterable,
    Iterator,
    Mapping,
    Optional,
    Sequence,
    Tuple,
)

# module-level so pandas_udf type-hint inference (stringified under
# `from __future__ import annotations`) resolves against globals
import pandas as pd
import pyarrow as pa
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "read_wet",
    "stream_wet",
    "read_warc",
    "stream_warc",
    "wet_documents",
    "warc_response_documents",
    "warc_documents_fused",
    "warc_media_records",
    "read_cdx",
    "read_warc_ranges",
    "write_cdx",
    "write_warc",
    "write_wet",
    "parse_warc_bytes",
    "parse_warc_stream",
    "split_http_response",
    "http_body",
    "http_message",
    "build_http_response",
]

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"
_VERSION_PREFIX = b"WARC/"
# Record separator for the fast path: terminator + the FULL next
# version line. The full line keeps the false-split surface minimal
# (a payload would need to contain the terminator + exact version
# line; the bare 'WARC/' prefix alone fires on prose ABOUT warc
# files — review finding). The version digits are auto-detected from
# the archive's first line (hardcoding 1.0 made a 1.1 archive
# silently ingest as one giant filtered-out row).
def _wet_linesep(version: str) -> str:
    return f"\r\n\r\nWARC/{version}\r\n"


def _detect_warc_version(spark: SparkSession, path: str) -> str:
    """Read ONE line of the input (a tiny bounded job — the text scan
    stops at the first record) and take the version off the leading
    'WARC/x.y' line. Mixed-version directories are not a thing Common
    Crawl produces; pass ``version=`` explicitly if yours differ, or
    use the strict per-record parser (:func:`read_warc`)."""
    first = spark.read.text(path, lineSep="\r\n").limit(1).collect()
    if not first or not first[0].value.startswith("WARC/"):
        raise ValueError(
            f"not a WARC/WET input: first line is "
            f"{first[0].value[:32]!r}" if first else
            f"not a WARC/WET input: {path} is empty"
        )
    return first[0].value[len("WARC/"):].strip()

# Headers surfaced as columns (canonical names; matching is
# case-insensitive per the spec, section 4 "named fields are not
# case-sensitive").
_FIELDS = (
    ("WARC-Type", "warc_type"),
    ("WARC-Record-ID", "record_id"),
    ("WARC-Target-URI", "url"),
    ("WARC-Date", "warc_date"),
    ("Content-Type", "content_type"),
    ("Content-Length", "content_length"),
)


def _header_regex(name: str) -> str:
    """(?im) anchored 'Name: value' extractor for one header line."""
    escaped = name.replace("-", "\\-")
    return f"(?im)^{escaped}:[ \\t]*([^\\r\\n]*)"


# ---------------------------------------------------------------------------
# Fast path: WET via JVM record splitting + Catalyst header parsing
# ---------------------------------------------------------------------------


def _wet_records(raw: DataFrame, record_types) -> DataFrame:
    """Shared batch/streaming projection: lineSep-split rows →
    typed WET record columns. Pure Catalyst expressions throughout.

    Staged as THREE projections on purpose: Catalyst's CollapseProject
    does not inline a non-cheap expression referenced more than once,
    so the full-record passes (version strip, header split, payload
    substring) each run ONCE per record, and the six header regexes
    then scan the ~200 B header block instead of the whole record —
    measured ~4× scan throughput over the single-projection form on
    15 KB records."""
    # First record of each file keeps its full leading version line
    # (no preceding terminator to split on); subsequent rows keep the
    # version DIGITS (the lineSep ends at 'WARC/'). Strip either form
    # so every row is 'headers\r\n\r\npayload[\r\n\r\n]'.
    rec = F.regexp_replace(F.col("value"), "^(WARC/)?[0-9.]+\r\n", "")
    df = raw.where(F.col("value") != "").select(rec.alias("__rec"))
    # Raw payload = everything after the first header/payload gap.
    split = df.select(
        F.substring_index(F.col("__rec"), "\r\n\r\n", 1).alias("__hdr"),
        F.expr(
            "substring(__rec, instr(__rec, '\r\n\r\n') + 4)"
        ).alias("__raw"),
    ).where(F.col("__hdr") != "")
    # Only the file's FINAL record retains its \r\n\r\n terminator
    # (non-final terminators are consumed by the lineSep split), so a
    # blind strip would corrupt a non-final record whose payload is
    # empty or ends in \r\n\r\n. Content-Length disambiguates: strip
    # exactly when the raw payload carries 4 extra bytes (terminator
    # is ASCII, so a 4-char cut is byte-exact; the payload body is
    # never cut, only compared via octet_length).
    cl = F.regexp_extract(
        F.col("__hdr"), _header_regex("Content-Length"), 1
    ).cast("long")
    has_term = F.octet_length(F.col("__raw")) == cl + 4
    payload = F.when(
        cl.isNotNull() & has_term,
        F.expr("substring(__raw, 1, length(__raw) - 4)"),
    ).otherwise(F.col("__raw"))
    out = split.select(
        *[
            F.regexp_extract(F.col("__hdr"), _header_regex(name), 1).alias(col)
            for name, col in _FIELDS
        ],
        payload.alias("text"),
    )
    out = out.withColumn(
        "warc_date", F.to_timestamp(F.col("warc_date"))
    ).withColumn("content_length", F.col("content_length").cast("long"))
    if record_types is not None:
        out = out.where(F.lower(F.col("warc_type")).isin(
            [t.lower() for t in record_types]
        ))
    return out


def read_wet(
    spark: SparkSession,
    path: str,
    record_types: Optional[Sequence[str]] = ("conversion",),
    version: Optional[str] = None,
) -> DataFrame:
    """Read WET file(s) → one row per WARC record, text payload.

    Columns: ``warc_type, record_id, url, warc_date (timestamp),
    content_type, content_length (long), text``.

    The plan is a text scan (records pre-split JVM-side by
    ``lineSep``) plus codegen'd regexp projections — ``explain()``
    shows no Python eval node; at 100 TB this is a map-only pass whose
    cost is the decompress + regex scan itself. ``record_types``
    defaults to conversion records (the extracted text); pass ``None``
    to keep every record including ``warcinfo`` headers. ``version``
    pins the WARC version in the record separator; the default
    auto-detects it from the archive's first line.
    """
    if version is None:
        version = _detect_warc_version(spark, path)
    return _wet_records(
        spark.read.text(path, lineSep=_wet_linesep(version)), record_types
    )


def stream_wet(
    spark: SparkSession,
    path: str,
    record_types: Optional[Sequence[str]] = ("conversion",),
    max_files_per_trigger: Optional[int] = None,
    version: str = "1.0",
) -> DataFrame:
    """Streaming twin of :func:`read_wet`: a file-source readStream
    over a landing directory of WET archives — new crawl shards are
    picked up per micro-batch and flow straight into the streaming
    gates (``streaming/neardup_stream``, ``streaming_bloom_dedup``,
    ``embed_stream``), the continuous-ingestion shape of a live crawl.

    Same all-JVM record split + header projection as the batch path
    (one shared implementation). ``max_files_per_trigger`` bounds each
    micro-batch (a 1 GB-archive landing dir without it makes the first
    batch the whole backlog). ``version`` pins the record separator's
    WARC version line (no auto-detect here: the landing dir may be
    empty at stream start — pass the crawl's actual version)."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    raw = reader.option("lineSep", _wet_linesep(version)).format("text").load(path)
    return _wet_records(raw, record_types)


# ---------------------------------------------------------------------------
# Strict path: binary-safe Content-Length parser over binaryFile
# ---------------------------------------------------------------------------


def _parse_header_block(blk: bytes, where: str) -> dict:
    """Version line + 'Name: value' lines → lowercased dict. Shared by
    the WARC record parser; raises on a bad version line."""
    eol = blk.find(_CRLF)
    version_line = blk if eol < 0 else blk[:eol]
    if not version_line.startswith(_VERSION_PREFIX):
        raise ValueError(
            f"expected WARC version line {where}, got {blk[:16]!r}"
        )
    headers: dict = {}
    if eol >= 0:
        for line in blk[eol + 2 :].split(_CRLF):
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().decode("utf-8").lower()] = (
                    v.strip().decode("utf-8", errors="replace")
                )
    return headers


def parse_warc_stream(
    fp,
    read_size: int = 1 << 20,
    max_header_bytes: int = 1 << 20,
) -> Iterator[Tuple[dict, bytes]]:
    """Walk WARC records from a FILE-LIKE object by Content-Length
    arithmetic, reading incrementally — peak memory is
    O(``read_size`` + one record), never O(file) (r10 review nit: the
    eager form decompressed a whole ~1 GB archive to ~3-5 GB of task
    memory up front; 32 concurrent tasks of that OOM real executors).
    Pass a ``gzip.GzipFile`` for compressed input — it streams
    multi-member archives member-by-member, so the compressed →
    decompressed blow-up never materializes either.

    Yields ``(headers_lowercased, payload_bytes)`` per record. Raises
    ``ValueError`` on structural corruption (bad version line, header
    block over ``max_header_bytes``, missing Content-Length, truncated
    payload) — loud failure, never silent truncation of a corpus.
    """
    buf = b""
    eof = False
    consumed = 0  # bytes yielded/skipped so far, for error offsets

    def fill() -> None:
        nonlocal buf, eof
        chunk = fp.read(read_size)
        if not chunk:
            eof = True
        else:
            buf += chunk

    def ensure(n: int) -> None:
        # Gather chunks in a list and join ONCE: `buf += chunk` in a
        # loop re-copies the whole ever-growing buffer per chunk —
        # quadratic for a record much larger than read_size (a 100 MB
        # media payload read in 1 MB chunks would be ~100 re-copies).
        nonlocal buf, eof
        if len(buf) >= n:
            return
        parts = [buf]
        have = len(buf)
        while have < n and not eof:
            chunk = fp.read(read_size)
            if not chunk:
                eof = True
            else:
                parts.append(chunk)
                have += len(chunk)
        buf = b"".join(parts)

    while True:
        # Tolerate inter-record padding (stray CRLFs).
        ensure(2)
        while buf[:2] == _CRLF:
            buf = buf[2:]
            consumed += 2
            ensure(2)
        if not buf and eof:
            return
        # Accumulate until the header terminator is in the buffer.
        while True:
            i = buf.find(_HDR_END)
            if i >= 0:
                break
            if eof:
                raise ValueError(
                    f"unterminated header block at offset {consumed}"
                )
            if len(buf) > max_header_bytes:
                raise ValueError(
                    f"header block at offset {consumed} exceeds "
                    f"{max_header_bytes} bytes"
                )
            fill()
        headers = _parse_header_block(
            buf[:i], f"at offset {consumed}"
        )
        buf = buf[i + 4 :]
        consumed += i + 4
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(
                f"missing/invalid Content-Length at offset {consumed}"
            ) from None
        ensure(clen)
        if len(buf) < clen:
            raise ValueError(
                f"truncated payload at offset {consumed}: need {clen}, "
                f"have {len(buf)}"
            )
        payload = buf[:clen]
        buf = buf[clen:]
        consumed += clen
        yield headers, payload


def parse_warc_bytes(buf: bytes) -> Iterator[Tuple[dict, bytes]]:
    """:func:`parse_warc_stream` over an in-memory buffer (the
    ``binaryFile`` row shape). Gzip input (single- or multi-member —
    Common Crawl writes one member per record) streams through
    ``gzip.GzipFile`` so the DECOMPRESSED bytes never materialize
    whole; only the compressed buffer (what ``binaryFile`` already
    read) is resident."""
    fp: io.BufferedIOBase = io.BytesIO(buf)
    if buf[:2] == b"\x1f\x8b":
        fp = gzip.GzipFile(fileobj=fp)  # type: ignore[assignment]
    return parse_warc_stream(fp)


_WARC_SCHEMA = pa.schema(
    [
        ("path", pa.string()),
        ("warc_type", pa.string()),
        ("record_id", pa.string()),
        ("url", pa.string()),
        ("warc_date", pa.string()),
        ("content_type", pa.string()),
        ("content_length", pa.int64()),
        ("payload", pa.binary()),
    ]
)


def _warc_records(
    files: DataFrame,
    record_types: Optional[Sequence[str]],
    batch_bytes: int,
) -> DataFrame:
    """Shared batch/streaming projection: (path, content) binary rows
    → parsed WARC record rows via one ``mapInArrow`` generator whose
    output batches are capped at ``batch_bytes`` of payload."""
    wanted = (
        None
        if record_types is None
        else {t.lower() for t in record_types}
    )

    def _flush(rows: list) -> pa.RecordBatch:
        cols = list(zip(*rows))
        return pa.RecordBatch.from_arrays(
            [pa.array(c, type=f.type) for c, f in zip(cols, _WARC_SCHEMA)],
            schema=_WARC_SCHEMA,
        )

    def _parse(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            paths = batch.column("path").to_pylist()
            contents = batch.column("content").to_pylist()
            for p, buf in zip(paths, contents):
                rows: list = []
                size = 0
                for headers, payload in parse_warc_bytes(buf):
                    wtype = headers.get("warc-type", "")
                    if wanted is not None and wtype.lower() not in wanted:
                        continue
                    rows.append(
                        (
                            p,
                            wtype,
                            headers.get("warc-record-id", ""),
                            headers.get("warc-target-uri", ""),
                            headers.get("warc-date", ""),
                            headers.get("content-type", ""),
                            len(payload),
                            payload,
                        )
                    )
                    size += len(payload)
                    if size >= batch_bytes:
                        yield _flush(rows)
                        rows, size = [], 0
                if rows:
                    yield _flush(rows)

    return files.select("path", "content").mapInArrow(
        _parse,
        schema=(
            "path string, warc_type string, record_id string, url string, "
            "warc_date string, content_type string, content_length long, "
            "payload binary"
        ),
    )


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: Optional[Sequence[str]] = None,
    batch_bytes: int = 64 << 20,
) -> DataFrame:
    """Read raw WARC file(s) → binary-safe records.

    Columns: ``path, warc_type, record_id, url, warc_date (string —
    cast downstream), content_type, content_length, payload (binary)``.

    ``binaryFile`` lists files as (path, content) rows distributed
    across executors (one task per file — the crawl's own sharding);
    a ``mapInArrow`` generator parses each file and emits Arrow
    batches capped at ``batch_bytes`` of payload so a 1 GB archive
    never materializes as one batch (and the parse itself streams —
    :func:`parse_warc_stream` — so neither does the decompressed
    input). Payloads stay ``binary`` — response records carry
    images/gzip/HTTP bodies; decoding is the caller's multimodal/text
    stage (:func:`http_message`, :func:`warc_response_documents`),
    not the reader's.
    """
    files = spark.read.format("binaryFile").load(path)
    return _warc_records(files, record_types, batch_bytes)


#: binaryFile's fixed schema — streaming sources cannot infer it.
_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def stream_warc(
    spark: SparkSession,
    path: str,
    record_types: Optional[Sequence[str]] = None,
    batch_bytes: int = 64 << 20,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Streaming twin of :func:`read_warc` (r11): a binaryFile
    readStream over a landing directory of raw ``.warc.gz`` archives —
    newly landed shards parse per micro-batch and flow into
    :func:`warc_response_documents` and the streaming curation gates,
    completing the raw-crawl continuous-ingestion path the WET twin
    (:func:`stream_wet`) already has. Same parser, same record
    columns (one shared implementation). ``max_files_per_trigger``
    bounds each micro-batch — archives are ~1 GB each, so without it
    the first batch is the whole backlog."""
    reader = spark.readStream.format("binaryFile").schema(
        _BINARYFILE_SCHEMA
    )
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", int(max_files_per_trigger)
        )
    return _warc_records(reader.load(path), record_types, batch_bytes)


# ---------------------------------------------------------------------------
# HTTP message envelope (raw `response` records)
# ---------------------------------------------------------------------------

# Earliest header/body boundary wins; at a CRLFCRLF site the CRLF
# alternative matches first (alternation is ordered), so bare-LF
# header blocks (robustness-principle servers) split correctly too.
_HTTP_SEP_RX = re.compile(rb"\r\n\r\n|\n\n")
_CHARSET_RX = re.compile(r"charset=[\"']?([A-Za-z0-9_.:\-]+)", re.I)
# <meta charset="..."> / <meta http-equiv content="...charset=...">
# in the document head — the fallback when the HTTP header names no
# charset (common on real crawls; HTML5 defines this exact sniff)
_META_CHARSET_RX = re.compile(
    rb"<meta[^>]+charset\s*=\s*[\"']?([A-Za-z0-9_.:\-]+)", re.I
)


def _dechunk(body: bytes) -> bytes:
    """Decode RFC 9112 chunked transfer coding: hex-size line, chunk,
    CRLF, ... , 0-size terminator (trailers ignored). Raises on
    truncation — chunked bodies that end mid-chunk are corrupt."""
    out = []
    off = 0
    while True:
        eol = body.find(b"\r\n", off)
        if eol < 0:
            raise ValueError("truncated chunked body: no size line")
        size_field = body[off:eol].split(b";")[0].strip()
        try:
            size = int(size_field, 16)
        except ValueError:
            raise ValueError(
                f"bad chunk size line {body[off:eol][:16]!r}"
            ) from None
        off = eol + 2
        if size == 0:
            return b"".join(out)
        if off + size > len(body):
            raise ValueError(
                f"truncated chunk: need {size}, have {len(body) - off}"
            )
        out.append(body[off : off + size])
        # Verify the chunk's trailing CRLF before skipping it: a wrong
        # size line would otherwise silently swallow adjacent bytes
        # until a LATER size-line parse happens to fail (r11 advice) —
        # fail loudly at the exact corruption site instead.
        tail = body[off + size : off + size + 2]
        if tail != b"\r\n":
            raise ValueError(
                f"chunk at offset {off} (size {size}) not followed by "
                f"CRLF (got {tail!r}): corrupt size line or truncation"
            )
        off += size + 2  # chunk's own trailing CRLF


def split_http_response(payload: bytes) -> Tuple[dict, bytes]:
    """Split a ``response`` record's payload — a FULL HTTP message
    (status line + headers + blank line + entity body, per the WARC
    spec's ``application/http; msgtype=response``) — into
    ``(headers_lowercased, body_bytes)`` with the transfer/content
    codings removed:

    - ``Transfer-Encoding: chunked`` → de-chunked (removed first:
      the sender applied it last);
    - ``Content-Encoding: gzip/x-gzip/deflate`` → decompressed
      (deflate tries zlib-wrapped then raw, both occur in the wild);
    - identity/absent → passed through byte-exact.

    The pseudo-header ``__status`` carries the numeric status code.
    A payload that is NOT an HTTP message (no ``HTTP/`` status line —
    e.g. a ``resource`` record) passes through as ``({}, payload)``.
    Unknown content codings (``br`` without the library, …) and
    corrupt coded bodies raise ``ValueError`` — the Spark wrapper
    (:func:`http_message`) nulls those rows instead of killing a
    100 TB job; this function is the strict kernel."""
    if not payload.startswith(b"HTTP/"):
        return {}, payload
    m = _HTTP_SEP_RX.search(payload)
    if m is None:
        # headers-only message (e.g. 304) — legal, empty body
        head, body = payload, b""
    else:
        head, body = payload[: m.start()], payload[m.end() :]
    lines = head.replace(b"\r\n", b"\n").split(b"\n")
    status = lines[0].split()
    headers: dict = {
        "__status": status[1].decode("ascii", "replace")
        if len(status) > 1
        else ""
    }
    for line in lines[1:]:
        k, sep, v = line.partition(b":")
        if sep:
            headers[k.strip().decode("utf-8", "replace").lower()] = (
                v.strip().decode("utf-8", "replace")
            )
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    coding = headers.get("content-encoding", "identity").strip().lower()
    if coding in ("gzip", "x-gzip"):
        body = gzip.decompress(body)
    elif coding == "deflate":
        try:
            body = zlib.decompress(body)
        except zlib.error:
            body = zlib.decompress(body, -zlib.MAX_WBITS)  # raw deflate
    elif coding == "br":
        # brotli is real on the modern web but the library is an
        # optional dependency — decode when present, fail loudly (not
        # silently as mojibake) when absent
        try:
            import brotli  # type: ignore
        except ImportError:
            raise ValueError(
                "unsupported Content-Encoding: 'br' (install the "
                "'brotli' package to decode brotli responses)"
            ) from None
        try:
            body = brotli.decompress(body)
        except Exception as e:  # brotli.error — normalize so the
            # Spark wrapper's corrupt-body nulling catches it
            raise ValueError(f"corrupt brotli body: {e}") from None
    elif coding not in ("", "identity"):
        raise ValueError(f"unsupported Content-Encoding: {coding!r}")
    return headers, body


def _http_charset(headers: dict, body: bytes = b"") -> str:
    """Charset resolution order: HTTP Content-Type parameter, then an
    HTML ``<meta charset=…>`` sniff over the first 2 KB (the HTML5
    prescan — headers frequently omit it on real crawls), then
    utf-8."""
    m = _CHARSET_RX.search(headers.get("content-type", ""))
    if m:
        return m.group(1)
    m = _META_CHARSET_RX.search(body[:2048])
    if m:
        return m.group(1).decode("ascii", "replace")
    return "utf-8"


def http_message(col, column_prefix: str = "http_"):
    """Arrow-batched decode of a binary HTTP-message payload column →
    ``struct<{prefix}status int, {prefix}content_type string,
    {prefix}body string>`` — the Spark-side wrapper over
    :func:`split_http_response`. Body text decodes with the message's
    own ``charset=`` (fallback utf-8, errors replaced — crawl bytes
    are never trusted). Rows whose coded body is corrupt (truncated
    chunk, bad gzip) come back NULL-bodied rather than failing the
    job: at 100 TB a handful of corrupt fetches per archive is the
    norm, and a null body is filterable while a dead job is not.
    Non-HTTP payloads (``{}`` headers) pass through with a null
    status and the raw bytes decoded as text."""
    from pyspark.sql.functions import pandas_udf

    p = column_prefix

    @pandas_udf(
        f"{p}status int, {p}content_type string, {p}body string"
    )
    def _decode(s: pd.Series) -> pd.DataFrame:
        stat, ctype, body = [], [], []
        for payload in s:
            if payload is None:
                stat.append(None), ctype.append(None), body.append(None)
                continue
            try:
                headers, raw = split_http_response(bytes(payload))
            except (ValueError, zlib.error, EOFError, gzip.BadGzipFile):
                stat.append(None), ctype.append(None), body.append(None)
                continue
            code = headers.get("__status", "")
            stat.append(int(code) if code.isdigit() else None)
            ctype.append(headers.get("content-type"))
            try:
                body.append(
                    raw.decode(_http_charset(headers, raw), "replace")
                )
            except LookupError:  # unknown charset label
                body.append(raw.decode("utf-8", "replace"))
        return pd.DataFrame(
            {f"{p}status": pd.array(stat, dtype="Int32"),
             f"{p}content_type": ctype,
             f"{p}body": body}
        )

    return _decode(_col(col))


def http_body(col):
    """Decoded body TEXT of a binary HTTP-message payload column
    (:func:`http_message`'s ``http_body`` field alone) — the drop-in
    step between :func:`read_warc` and
    :func:`~lantern_spark.functions.html.html_to_text`."""
    return http_message(col).getField("http_body")


def _col(x):
    return x if isinstance(x, Column) else F.col(x)


# ---------------------------------------------------------------------------
# Adapter to the documents-table shape
# ---------------------------------------------------------------------------


def wet_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adapt a :func:`read_wet`/:func:`read_warc` result to the
    ``documents`` shape the curation/dedup/assembly operators consume:
    ``doc_id (long), url, fetched_at (timestamp), text``.

    ``doc_id`` is ``xxhash64(record_id)`` — stable across re-reads and
    partitionings (``monotonically_increasing_id`` is neither), so
    downstream dedup survivor sets and attribute sidecars stay joinable
    across pipeline re-runs over the same crawl.
    """
    text = (
        F.col(text_col)
        if dict(df.dtypes).get(text_col) == "string"
        else F.col(text_col).cast("string")
    )
    date = (
        F.col("warc_date")
        if dict(df.dtypes).get("warc_date") == "timestamp"
        else F.to_timestamp(F.col("warc_date"))
    )
    return df.select(
        F.xxhash64(F.col("record_id")).alias("doc_id"),
        F.col("url"),
        date.alias("fetched_at"),
        text.alias("text"),
    )


def warc_response_documents(
    raw: DataFrame,
    extractor=None,
    statuses: Optional[Sequence[int]] = (200,),
    html_only: bool = True,
) -> DataFrame:
    """The raw-crawl → documents composition done RIGHT: a
    :func:`read_warc` result's ``response`` records through the HTTP
    envelope (:func:`http_message` — status/headers split off, gzip /
    chunked codings removed) and the HTML tier
    (:func:`~lantern_spark.functions.html.html_to_text`, or a real
    DOM ``extractor`` via the pandas-UDF hook) to the ``documents``
    shape (``doc_id, url, fetched_at, text``).

    Casting ``payload`` straight to string instead feeds
    ``HTTP/1.1 200 OK`` + header lines into the corpus — html_to_text
    strips tags, not header lines (r10 review finding; real Common
    Crawl ``response`` payloads are always full HTTP messages).

    ``statuses`` keeps only those HTTP status codes (default 200 —
    error pages are not training text; ``None`` keeps all).
    ``html_only`` additionally requires an HTML content type,
    ``text/plain``, or no content-type header at all (mislabeled
    text/html is common — a missing header is not evidence of
    non-HTML). Other ``text/*`` subtypes (css, javascript, csv) are
    REJECTED: stylesheet/script bodies are not documents (r11
    advice)."""
    from lantern_spark.functions.html import extract_text_udf_hook

    recs = raw.where(F.lower(F.col("warc_type")) == "response")
    msg = recs.withColumn("__http", http_message("payload")).select(
        "*",
        F.col("__http.http_status").alias("http_status"),
        F.col("__http.http_content_type").alias("http_content_type"),
        F.col("__http.http_body").alias("http_body"),
    ).drop("__http")
    if statuses is not None:
        msg = msg.where(F.col("http_status").isin([int(s) for s in statuses]))
    if html_only:
        ct = F.lower(F.coalesce(F.col("http_content_type"), F.lit("")))
        msg = msg.where(
            (ct == "") | ct.contains("html") | ct.startswith("text/plain")
        )
    extracted = extract_text_udf_hook(
        msg.where(F.col("http_body").isNotNull()),
        "http_body",
        out_col="text",
        extractor=extractor,
    )
    return wet_documents(extracted, text_col="text")


_FUSED_SCHEMA = pa.schema(
    [
        pa.field("record_id", pa.string()),
        pa.field("url", pa.string()),
        pa.field("warc_date", pa.string()),
        pa.field("text", pa.string()),
    ]
)


def warc_documents_fused(
    spark: SparkSession,
    path: str,
    extractor=None,
    statuses: Optional[Sequence[int]] = (200,),
    html_only: bool = True,
    batch_bytes: int = 64 << 20,
) -> DataFrame:
    """The crawl→documents tier in ONE Python crossing (r14, review
    r13 stretch item 7 — the profile-honest continuation): the staged
    composition ``warc_response_documents(read_warc(...))`` crosses
    the JVM↔Python Arrow boundary THREE times with payload-sized data
    (mapInArrow parse out+in, the ``http_message`` pandas UDF, the
    extractor pandas UDF — six payload-sized serializations end to
    end), and with the r14 extraction kernel at ~28 ms/task those
    crossings ARE the remaining ingest cost. This fast path runs the
    SAME strict kernels — :func:`parse_warc_bytes`,
    :func:`split_http_response`, :func:`_http_charset`, and the
    Arrow-batched extractor (default
    :func:`~lantern_spark.functions.html.regex_text_extractor`, the
    byte-identical fast replay of ``EXTRACT_STEPS``) — inside one
    ``mapInArrow`` generator per WARC file, so compressed archive
    bytes enter Python once and only the finished document text comes
    back. Output and semantics are ROW-IDENTICAL to the staged
    composition (same status/content-type filters, same corrupt-body
    nulling-to-drop, same ``wet_documents`` adapter — pinned in
    tests/test_warc.py); the staged form stays the default for
    pipelines that need the intermediate HTTP columns.

    Scale shape: one task per archive file (the crawl's own ~1 GB
    sharding), O(batch_bytes + one record) task memory, zero
    JVM round trips of payload bytes — on a 1000-executor read of a
    full crawl this is the difference between shipping each page's
    bytes across the Arrow boundary six times and once."""
    from lantern_spark.functions.html import regex_text_extractor

    ex = extractor or regex_text_extractor()
    wanted = (
        None if statuses is None else {int(s) for s in statuses}
    )
    files = spark.read.format("binaryFile").load(path)

    def _flush(rows: list) -> pa.RecordBatch:
        rid, url, date, html = zip(*rows)
        texts = list(ex(pd.Series(html, dtype=object)))
        return pa.RecordBatch.from_arrays(
            [
                pa.array(rid, type=pa.string()),
                pa.array(url, type=pa.string()),
                pa.array(date, type=pa.string()),
                pa.array(texts, type=pa.string()),
            ],
            schema=_FUSED_SCHEMA,
        )

    def _gen(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            paths = batch.column("path").to_pylist()
            contents = batch.column("content").to_pylist()
            for _p, buf in zip(paths, contents):
                rows: list = []
                size = 0
                for headers, payload in parse_warc_bytes(buf):
                    if headers.get("warc-type", "").lower() != "response":
                        continue
                    try:
                        h, body = split_http_response(payload)
                    except (
                        ValueError,
                        zlib.error,
                        EOFError,
                        gzip.BadGzipFile,
                    ):
                        continue  # the staged path nulls then drops
                    code = h.get("__status", "")
                    st = int(code) if code.isdigit() else None
                    if wanted is not None and st not in wanted:
                        continue
                    ct = (h.get("content-type") or "").lower()
                    if html_only and not (
                        ct == ""
                        or "html" in ct
                        or ct.startswith("text/plain")
                    ):
                        continue
                    text = body.decode(_http_charset(h, body), "replace")
                    rows.append(
                        (
                            headers.get("warc-record-id", ""),
                            headers.get("warc-target-uri", ""),
                            headers.get("warc-date", ""),
                            text,
                        )
                    )
                    size += len(text)
                    if size >= batch_bytes:
                        yield _flush(rows)
                        rows, size = [], 0
                if rows:
                    yield _flush(rows)

    recs = files.select("path", "content").mapInArrow(
        _gen,
        schema="record_id string, url string, warc_date string, "
        "text string",
    )
    return wet_documents(recs)


#: HTTP content-type prefix → multimodal media_type label.
_MEDIA_PREFIXES = (("image/", "image"), ("audio/", "audio"),
                   ("video/", "video"))


def warc_media_records(raw: DataFrame) -> DataFrame:
    """The multimodal branch of the raw-crawl split (r11): ``response``
    records whose HTTP content type is image/audio/video, adapted to
    the canonical media-table shape
    (:func:`lantern_spark.operators.multimodal.media_schema`):
    ``media_id (long), content (binary), meta (media_type, format,
    width, height, duration_ms), url``. The decoded HTTP body stays
    BYTES end to end (decode/feature-extraction is
    ``operators/multimodal``'s job, per that module's contract);
    ``format`` carries the content-type subtype (``jpeg``, ``mpeg``);
    pixel/duration meta is NULL until a decode stage fills it.

    Together with :func:`warc_response_documents` (the text branch)
    this completes the crawl demux: one ``read_warc`` scan feeds both
    the documents table and the media table."""
    recs = raw.where(F.lower(F.col("warc_type")) == "response")
    p = "http_"
    msg = recs.withColumn("__http", _http_message_binary("payload")).select(
        "url",
        "record_id",
        F.col(f"__http.{p}status").alias("http_status"),
        F.lower(
            F.coalesce(F.col(f"__http.{p}content_type"), F.lit(""))
        ).alias("__ct"),
        F.col(f"__http.{p}body_bytes").alias("__body"),
    )
    media_type = F.lit(None).cast("string")
    for prefix, label in reversed(_MEDIA_PREFIXES):
        media_type = F.when(
            F.col("__ct").startswith(prefix), F.lit(label)
        ).otherwise(media_type)
    fmt = F.regexp_extract(F.col("__ct"), r"^[a-z]+/([a-z0-9.+\-]+)", 1)
    out = (
        msg.withColumn("__mt", media_type)
        .where(
            F.col("__mt").isNotNull()
            & (F.col("http_status") == 200)
            & F.col("__body").isNotNull()
        )
        .select(
            F.xxhash64(F.col("record_id")).alias("media_id"),
            F.col("__body").alias("content"),
            F.struct(
                F.col("__mt").alias("media_type"),
                fmt.alias("format"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("int").alias("duration_ms"),
            ).alias("meta"),
            F.col("url"),
        )
    )
    return out


def _http_message_binary(col, column_prefix: str = "http_"):
    """:func:`http_message` twin that keeps the body as BYTES
    (``{prefix}body_bytes binary``) — media payloads must never round
    -trip through a text decode."""
    from pyspark.sql.functions import pandas_udf

    p = column_prefix

    @pandas_udf(
        f"{p}status int, {p}content_type string, {p}body_bytes binary"
    )
    def _decode(s: pd.Series) -> pd.DataFrame:
        stat, ctype, body = [], [], []
        for payload in s:
            if payload is None:
                stat.append(None), ctype.append(None), body.append(None)
                continue
            try:
                headers, raw = split_http_response(bytes(payload))
            except (ValueError, zlib.error, EOFError, gzip.BadGzipFile):
                stat.append(None), ctype.append(None), body.append(None)
                continue
            code = headers.get("__status", "")
            stat.append(int(code) if code.isdigit() else None)
            ctype.append(headers.get("content-type"))
            body.append(raw)
        return pd.DataFrame(
            {f"{p}status": pd.array(stat, dtype="Int32"),
             f"{p}content_type": ctype,
             f"{p}body_bytes": body}
        )

    return _decode(_col(col))


# ---------------------------------------------------------------------------
# CDXJ capture index (Common Crawl's cc-index files)
# ---------------------------------------------------------------------------

#: Fields of the CDXJ JSON blob surfaced as typed columns. `length`
#: and `offset` are STRINGS in the wild format — cast here.
_CDX_JSON_SCHEMA = (
    "url string, mime string, `mime-detected` string, status string, "
    "digest string, length string, offset string, filename string, "
    "languages string, encoding string, redirect string"
)


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """Read CDXJ capture-index lines (Common Crawl's ``cc-index``
    shards: ``<SURT urlkey> <14-digit timestamp> <JSON>``) → typed
    rows: ``urlkey, ts (timestamp), url, mime, mime_detected, status
    (int), digest, length (long), offset (long), filename, languages,
    encoding, redirect``.

    This is how a real crawl job PLANS its reads: filter the index
    (host/prefix via ``urlkey``, ``status = 200``, ``mime``), then
    fetch only the matching (filename, offset, length) ranges —
    selecting 1% of a 100 TB crawl costs a scan of the ~200 GB index,
    not the archives. The whole parse is JVM-side (one text scan,
    two splits, ``from_json``); ``.gz`` shards stream through the
    Hadoop codec.

    Pairs with :func:`~lantern_spark.operators.weburl.surt_key` to
    build prefix predicates from plain URLs."""
    raw = spark.read.text(path)
    # try_element_at, not element_at: under Spark 4's ANSI mode a
    # blank/truncated index line (< 3 space-separated fields) would
    # make element_at THROW and abort the whole ~200 GB index scan;
    # the module contract is null-the-row, never kill-the-job.
    parts = raw.select(
        F.substring_index(F.col("value"), " ", 1).alias("urlkey"),
        F.try_element_at(F.split(F.col("value"), " ", 3), F.lit(2)).alias(
            "__ts"
        ),
        F.try_element_at(F.split(F.col("value"), " ", 3), F.lit(3)).alias(
            "__json"
        ),
    ).where(F.col("__json").isNotNull() & F.col("__json").startswith("{"))
    j = parts.withColumn(
        "__j", F.from_json(F.col("__json"), _CDX_JSON_SCHEMA)
    )
    return j.select(
        "urlkey",
        F.to_timestamp(F.col("__ts"), "yyyyMMddHHmmss").alias("ts"),
        F.col("__j.url").alias("url"),
        F.col("__j.mime").alias("mime"),
        F.col("__j.`mime-detected`").alias("mime_detected"),
        F.col("__j.status").cast("int").alias("status"),
        F.col("__j.digest").alias("digest"),
        F.col("__j.length").cast("long").alias("length"),
        F.col("__j.offset").cast("long").alias("offset"),
        F.col("__j.filename").alias("filename"),
        F.col("__j.languages").alias("languages"),
        F.col("__j.encoding").alias("encoding"),
        F.col("__j.redirect").alias("redirect"),
    )


def _local_open(path: str) -> BinaryIO:
    """Default :func:`read_warc_ranges` backend: local/NFS files."""
    return open(path, "rb")


def read_warc_ranges(
    spark: SparkSession,
    ranges: DataFrame,
    base_path: str = "",
    record_types: Optional[Sequence[str]] = None,
    batch_bytes: int = 64 << 20,
    open_fn: Optional[Callable[[str], BinaryIO]] = None,
) -> DataFrame:
    """Fetch ONLY the selected records of a crawl: ``ranges`` is a
    (``filename, offset, length``) DataFrame — exactly what a
    filtered :func:`read_cdx` query produces — and each row reads one
    per-record gzip member by seek+read (Common Crawl writes each
    record as its own member precisely so ranges decompress
    standalone). Output schema matches :func:`read_warc`.

    This is the CDX planning story completed: filter the index,
    then touch only the selected bytes of the archives — a 1%
    selection of a 100 TB crawl reads ~1 TB, not 100.

    Scale shape: ranges repartition by ``filename`` so each task
    opens its files once (handles sorted ranges sequentially —
    forward seeks, no re-opens); ``base_path`` prefixes relative
    index filenames. Corrupt members raise loudly with the
    (file, offset) coordinates.

    ``open_fn(path) -> seekable binary file-like`` is the storage
    backend (default: local/NFS ``open(path, "rb")``). For object
    stores — where a real crawl lives — pass a lazily-ranging opener;
    each ``seek(offset); read(length)`` pair then becomes one ranged
    GET, never a whole-archive download::

        import fsspec  # s3://, gs://, abfs://, http:// ...
        docs = read_warc_ranges(
            spark, selected,
            open_fn=lambda p: fsspec.open(p, "rb").open(),
        )

    The callable is shipped to executors (cloudpickle), so keep it
    self-contained — import the client library inside the lambda or
    at module level of an importable module, and pass credentials via
    the cluster's standard mechanism, not closure state."""
    need = {"filename", "offset", "length"}
    missing = need - set(ranges.columns)
    if missing:
        raise ValueError(f"ranges is missing columns: {sorted(missing)}")
    wanted = (
        None if record_types is None else {t.lower() for t in record_types}
    )
    base = base_path
    opener = open_fn if open_fn is not None else _local_open

    def _flush(rows: list) -> pa.RecordBatch:
        cols = list(zip(*rows))
        return pa.RecordBatch.from_arrays(
            [pa.array(c, type=f.type) for c, f in zip(cols, _WARC_SCHEMA)],
            schema=_WARC_SCHEMA,
        )

    def _fetch(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import os as _osw

        open_path, fh = None, None
        rows: list = []
        size = 0
        try:
            for batch in it:
                fns = batch.column("filename").to_pylist()
                offs = batch.column("offset").to_pylist()
                lens = batch.column("length").to_pylist()
                for fn, off, ln in zip(fns, offs, lens):
                    p = _osw.path.join(base, fn) if base else fn
                    if p != open_path:
                        if fh is not None:
                            fh.close()
                        fh = opener(p)
                        open_path = p
                    fh.seek(int(off))
                    member = fh.read(int(ln))
                    try:
                        recs = list(parse_warc_bytes(member))
                    except (ValueError, OSError, EOFError) as e:
                        raise ValueError(
                            f"corrupt range {fn}@{off}+{ln}: {e}"
                        ) from None
                    for headers, payload in recs:
                        wtype = headers.get("warc-type", "")
                        if wanted is not None and wtype.lower() not in wanted:
                            continue
                        rows.append(
                            (
                                p,
                                wtype,
                                headers.get("warc-record-id", ""),
                                headers.get("warc-target-uri", ""),
                                headers.get("warc-date", ""),
                                headers.get("content-type", ""),
                                len(payload),
                                payload,
                            )
                        )
                        size += len(payload)
                        if size >= batch_bytes:
                            yield _flush(rows)
                            rows, size = [], 0
            if rows:
                yield _flush(rows)
        finally:
            if fh is not None:
                fh.close()

    src = (
        ranges.select("filename", "offset", "length")
        .repartition("filename")
        .sortWithinPartitions("filename", "offset")
    )
    return src.mapInArrow(
        _fetch,
        schema=(
            "path string, warc_type string, record_id string, url string, "
            "warc_date string, content_type string, content_length long, "
            "payload binary"
        ),
    )


def write_cdx(path: str, rows: Iterable[Mapping]) -> None:
    """CDXJ fixture writer (tests/examples): each mapping needs
    ``urlkey``, ``timestamp`` (14-digit string), and the JSON fields
    (``url``/``mime``/``status``/…)."""
    import json as _json

    with open(path, "w", encoding="utf-8") as fh:
        for r in rows:
            blob = {k: v for k, v in r.items()
                    if k not in ("urlkey", "timestamp")}
            fh.write(
                f"{r['urlkey']} {r['timestamp']} "
                + _json.dumps(blob, separators=(", ", ": "))
                + "\n"
            )


# ---------------------------------------------------------------------------
# Fixture writer (tests / examples)
# ---------------------------------------------------------------------------


def _write_wet_partition(
    batches: Iterator[pa.RecordBatch],
    out: str,
    pid: int,
    gz: bool,
    roll_bytes: Optional[int],
    open_fn: Optional[Callable[[str], BinaryIO]] = None,
) -> Iterator[Tuple[str, int, int]]:
    """One task's streaming WET write: records are serialized and
    written to the open shard AS the Arrow batches drain — peak task
    memory is O(one record + gzip buffers), never O(partition text)
    (r11 review nit 3: the old sink accumulated the whole partition
    in a Python list first). ``roll_bytes`` starts a new
    ``part-{pid}-{seq}`` shard once the current one's UNCOMPRESSED
    record bytes pass the target, so one giant partition can't make
    one giant shard. Yields one (shard_path, n_records, n_bytes)
    manifest tuple per closed shard. ``open_fn`` is the unit-test
    injection seam (a counting file proves per-record writes)."""
    import os as _osw

    opener = (
        open_fn if open_fn is not None else (lambda p: open(p, "wb"))
    )
    st = {"fh": None, "raw": None, "staged": None, "final": None,
          "n": 0, "ubytes": 0, "seq": 0}

    def _open_shard() -> None:
        suffix = ".warc.wet" + (".gz" if gz else "")
        name = (
            f"part-{pid:05d}-{st['seq']:03d}{suffix}"
            if roll_bytes
            else f"part-{pid:05d}{suffix}"
        )
        final = _osw.path.join(out, name)
        staged = f"{final}.inprogress.{_osw.getpid()}"
        raw = opener(staged)
        fh = (
            gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) if gz else raw
        )
        st.update(fh=fh, raw=raw, staged=staged, final=final,
                  n=0, ubytes=0)

    def _close_shard() -> Tuple[str, int, int]:
        st["fh"].close()
        if st["raw"] is not st["fh"]:
            st["raw"].close()
        _osw.replace(st["staged"], st["final"])
        row = (st["final"], st["n"], _osw.path.getsize(st["final"]))
        st["fh"] = None
        st["seq"] += 1
        return row

    made_dir = False
    # try/finally so a task failure mid-shard (e.g. the CR ValueError
    # below, or an upstream Arrow error) closes the handle and removes
    # the stale `.inprogress.<pid>` staged file instead of leaking it
    # into the output directory (r13 advice).
    try:
        for batch in batches:
            ids = batch.column("__id").to_pylist()
            urls = batch.column("__url").to_pylist()
            dates = batch.column("__date").to_pylist()
            texts = batch.column("__text").to_pylist()
            for i, u, dt, t in zip(ids, urls, dates, texts):
                if t is None:
                    continue
                if "\r" in t:
                    raise ValueError(
                        f"doc {i!r}: text contains CR — WET payloads "
                        "must be CR-free (the record separator is "
                        "CRLF-framed); normalize line endings first"
                    )
                rec = _warc_record_bytes(
                    {
                        "warc_type": "conversion",
                        "record_id": f"<urn:doc:{i}>",
                        "url": u or "",
                        "warc_date": dt or "2026-01-01T00:00:00Z",
                        "payload": t,
                    }
                )
                if st["fh"] is None:
                    if not made_dir:
                        _osw.makedirs(out, exist_ok=True)
                        made_dir = True
                    _open_shard()
                st["fh"].write(rec)
                st["n"] += 1
                st["ubytes"] += len(rec)
                if roll_bytes and st["ubytes"] >= roll_bytes:
                    yield _close_shard()
        if st["fh"] is not None:
            yield _close_shard()
    finally:
        if st["fh"] is not None:  # error path: an open, un-yielded shard
            for h in (st["fh"], st["raw"]):
                try:
                    h.close()
                except Exception:
                    pass
            try:
                _osw.unlink(st["staged"])
            except OSError:
                pass


def write_wet(
    df: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    url_col: str = "url",
    text_col: str = "text",
    date_col: Optional[str] = None,
    gzip_shards: bool = True,
    target_shard_mb: Optional[float] = None,
) -> DataFrame:
    """DISTRIBUTED WET export — the write side of the crawl
    interchange format: each partition of a documents-shaped DataFrame
    becomes one spec-conformant ``part-NNNNN.warc.wet[.gz]`` shard
    under ``out_dir`` (records in partition order, record ids derived
    from ``id_col`` so re-reads key stably), written WORKER-SIDE — no
    driver collect, the same one-shard-per-partition contract as any
    parquet write. Returns the shard manifest as a DataFrame
    ``(shard_path, n_records, n_bytes)`` (one row per shard; the
    write happens when the manifest is consumed — ``.collect()`` it,
    like any Spark action).

    Records STREAM to the shard as the Arrow batches drain — peak
    task memory is O(one record + gzip buffers), never O(partition
    text bytes). ``target_shard_mb`` rolls to a new
    ``part-NNNNN-SSS`` shard once the current one passes the target
    (measured on uncompressed record bytes — deterministic and
    compression-independent), so shard size is controllable
    independently of input partition size.

    Round-trips through :func:`read_wet` record-for-record (pinned in
    tests); text must be CR-free (CRLF could collide with the record
    separator — the writer raises on offenders rather than silently
    corrupting a shard)."""
    gz = bool(gzip_shards)
    out = out_dir
    roll_bytes = (
        int(target_shard_mb * (1 << 20)) if target_shard_mb else None
    )

    def _write(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        for path, n, nbytes in _write_wet_partition(
            it, out, pid, gz, roll_bytes
        ):
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([path]),
                    pa.array([n], type=pa.int64()),
                    pa.array([nbytes], type=pa.int64()),
                ],
                names=["shard_path", "n_records", "n_bytes"],
            )

    date = (
        F.date_format(F.col(date_col), "yyyy-MM-dd'T'HH:mm:ss'Z'")
        if date_col is not None
        else F.lit(None).cast("string")
    )
    src = df.select(
        F.col(id_col).cast("string").alias("__id"),
        F.col(url_col).cast("string").alias("__url"),
        date.alias("__date"),
        F.col(text_col).alias("__text"),
    )
    return src.mapInArrow(
        _write, schema="shard_path string, n_records long, n_bytes long"
    )


def build_http_response(
    body,
    status: int = 200,
    content_type: str = "text/html; charset=utf-8",
    gzip_body: bool = False,
    chunked: bool = False,
    extra_headers: Sequence[Tuple[str, str]] = (),
) -> bytes:
    """Assemble a spec-shaped HTTP response message (the payload of a
    real ``response`` record) — the tests'/bench's counterpart to
    :func:`split_http_response`. ``gzip_body`` adds
    ``Content-Encoding: gzip``; ``chunked`` wraps the (possibly
    gzipped) body in chunked transfer coding, splitting it into two
    chunks so de-chunking is actually exercised."""
    if isinstance(body, str):
        body = body.encode("utf-8")
    headers = [("Content-Type", content_type), *extra_headers]
    if gzip_body:
        body = gzip.compress(body)
        headers.append(("Content-Encoding", "gzip"))
    if chunked:
        headers.append(("Transfer-Encoding", "chunked"))
        mid = max(1, len(body) // 2)
        chunks = [c for c in (body[:mid], body[mid:]) if c]
        body = (
            b"".join(
                b"%x" % len(c) + _CRLF + c + _CRLF for c in chunks
            )
            + b"0" + _CRLF + _CRLF
        )
    else:
        headers.append(("Content-Length", str(len(body))))
    head = _CRLF.join(
        [b"HTTP/1.1 %d OK" % status]
        + [f"{k}: {v}".encode("utf-8") for k, v in headers]
    )
    return head + _HDR_END + body


def _warc_record_bytes(r: Mapping, version: str = "1.0") -> bytes:
    """Serialize ONE record mapping to spec-conformant WARC bytes —
    shared by :func:`write_warc` (fixture writer) and the streaming
    :func:`write_wet` sink, so the two can never drift."""
    payload = r.get("payload", b"")
    if isinstance(payload, str):
        payload = payload.encode("utf-8")
    rid = r.get("record_id") or f"<urn:uuid:{uuid.uuid4()}>"
    lines = [f"WARC/{version}".encode("ascii")]
    hdrs = [
        ("WARC-Type", r["warc_type"]),
        ("WARC-Record-ID", rid),
        ("WARC-Date", r.get("warc_date", "2026-01-01T00:00:00Z")),
    ]
    if r.get("url"):
        hdrs.append(("WARC-Target-URI", r["url"]))
    hdrs.append(("Content-Type", r.get("content_type", "text/plain")))
    hdrs.append(("Content-Length", str(len(payload))))
    for k, v in hdrs:
        lines.append(f"{k}: {v}".encode("utf-8"))
    return _CRLF.join(lines) + _HDR_END + payload + _HDR_END


def write_warc(
    path: str,
    records: Iterable[Mapping],
    gzip_file: bool = False,
    gzip_per_record: bool = False,
    version: str = "1.0",
) -> None:
    """Write spec-conformant WARC bytes (the tests' fixture writer).

    Each record mapping: ``warc_type`` (required), ``payload``
    (str|bytes), optional ``url``, ``warc_date``, ``content_type``,
    ``record_id``. ``gzip_per_record=True`` writes each record as its
    own gzip member — Common Crawl's actual layout.
    """
    chunks = [_warc_record_bytes(r, version) for r in records]
    if gzip_per_record:
        data = b"".join(gzip.compress(c) for c in chunks)
    else:
        data = b"".join(chunks)
        if gzip_file:
            data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)
