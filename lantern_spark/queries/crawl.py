"""Crawl-ingestion + training-export roster queries (r11, review r10
item 4): the two ends of the pretraining data path — WET archive →
documents in, packed token sequences out — promoted from pytest-only
to hash-checked oracle rows.

``wet_documents_docs``: the documents table round-trips through a real
gzipped WET archive (``write_warc`` → ``read_wet``); the oracle
recomputes the expected rows STRAIGHT from the parquet table, so any
asymmetry between the writer and the JVM lineSep/regex reader shows up
as a hash mismatch — an independent check, not a replay of the
splitting algorithm.

``packed_ids_export``: ``export_packed_ids`` over a DuckDB-replayable
tokenizer (md5-hash token ids — the repo's engine-portable hashing
convention, dedup.py); the oracle replays the whole start-offset
binning arithmetic (cumsum → bin → flatten → truncate → doc_starts)
relationally. ``chunks=1`` pins a single deterministic chunk for the
oracle; the operator's production path shards across 256.
"""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from lantern_spark.queries.common import artifact_dir, load_table
from lantern_spark.registry import register

# ---------------------------------------------------------------------------
# WET round-trip
# ---------------------------------------------------------------------------

_WET_NAME = "wet_fixture.warc.wet.gz"


def _build_wet_fixture(spark, sf_dir: str) -> str:
    """Render the documents table as a spec-conformant gzipped WET
    archive (deterministic: doc_id order, fixed date, synthesized
    URLs). Bounded driver traffic: the documents table is the corpus
    the DRIVER testdata ships (500–5000 rows) — the fixture build is
    test scaffolding, not the 100 TB read path (which consumes crawls
    that already exist as WET)."""
    from lantern_spark.sources.warc import write_warc

    path = artifact_dir(sf_dir, _WET_NAME)
    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .where(F.col("text").isNotNull() & F.col("source").isNotNull())
        # a payload containing CRLF could collide with the record
        # separator — excluded on BOTH sides (no-op on the synthetic
        # corpus, which is LF-only)
        .where(~F.col("text").contains("\r"))
        .orderBy("doc_id")
        .collect()
    )
    # stage + atomic replace: the artifact is shared per-SF and both
    # bench and a driver run may rebuild it concurrently — interleaved
    # writes to the live path would hand one of them a torn archive
    staged = f"{path}.tmp.{os.getpid()}"
    write_warc(
        staged,
        [
            {
                "warc_type": "conversion",
                "record_id": f"<urn:doc:{r.doc_id}>",
                "url": f"https://corpus.example/{r.source}/{r.doc_id}",
                "warc_date": "2026-01-01T00:00:00Z",
                "payload": r.text,
            }
            for r in rows
        ],
        gzip_file=True,
    )
    os.replace(staged, path)
    return path


@register(
    "wet_documents_docs",
    """
    SELECT '<urn:doc:' || doc_id || '>' AS record_id,
           'https://corpus.example/' || source || '/' || doc_id AS url,
           octet_length(encode(text))::BIGINT AS n_bytes,
           text
    FROM documents
    WHERE text IS NOT NULL AND source IS NOT NULL
      AND NOT contains(text, chr(13))
    """,
)
def wet_documents_docs(spark, sf_dir):
    """WET ingest round-trip: documents → gzipped WET archive →
    :func:`read_wet` (JVM lineSep record split + codegen header
    regexes + Content-Length payload trim + Hadoop gzip codec) →
    per-record rows. Hash-green means every header field and every
    payload byte survived the archive round trip."""
    from lantern_spark.sources.warc import read_wet

    path = _build_wet_fixture(spark, sf_dir)
    return read_wet(spark, path).select(
        "record_id",
        "url",
        F.col("content_length").alias("n_bytes"),
        "text",
    )


# ---------------------------------------------------------------------------
# Packed training-shard export
# ---------------------------------------------------------------------------

_SEQ_LEN = 512
_VOCAB = 32000
_EOS = 32000  # one past the hash range, so eos is visibly a separator


def _hash_token_ids(col) -> F.Column:
    """array<int> of md5-derived token ids — the engine-portable
    deterministic 'tokenizer' the oracle can replay exactly
    (the md5→48-bit-uniform convention of operators/dedup.py)."""
    toks = F.filter(F.split(F.col(col), r"\s+"), lambda t: t != "")
    return F.transform(
        toks,
        lambda t: (
            F.conv(F.substring(F.md5(t), 1, 12), 16, 10).cast("long")
            % _VOCAB
        ).cast("int"),
    )


@register(
    "packed_ids_export",
    f"""
    WITH tok AS (
      SELECT doc_id,
             list_transform(
               list_filter(string_split_regex(text, '\\s+'), t -> t <> ''),
               t -> ((('0x' || substr(md5(t), 1, 12))::BIGINT % {_VOCAB}))::INT
             ) AS raw
      FROM documents WHERE text IS NOT NULL),
    withe AS (
      SELECT doc_id, list_concat(raw, [{_EOS}::INT]) AS ids
      FROM tok WHERE len(raw) > 0),
    -- bin assignment uses counts CLAMPED at seq_len (an over-long doc
    -- consumes exactly one bin width — pack_sequences' contract);
    -- doc_starts use REAL sizes (offsets in the flattened id stream)
    binned AS (
      SELECT doc_id, ids, len(ids) AS n,
             sum(least(len(ids), {_SEQ_LEN}))
               OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
               - least(len(ids), {_SEQ_LEN}) AS gstart
      FROM withe),
    tagged AS (
      SELECT *, CAST(floor(gstart / {_SEQ_LEN}.0) AS BIGINT) AS bin
      FROM binned),
    offs AS (
      SELECT *, coalesce(sum(n) OVER (PARTITION BY bin ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS off
      FROM tagged),
    packs AS (
      SELECT bin,
             flatten(list(ids ORDER BY doc_id)) AS allids,
             list(off ORDER BY doc_id) AS offsets,
             count(*)::INT AS n_docs
      FROM offs GROUP BY bin)
    SELECT '0:' || bin AS pack_id,
           md5(coalesce(array_to_string(allids[1:{_SEQ_LEN}], ','), ''))
             AS ids_md5,
           len(allids[1:{_SEQ_LEN}])::INT AS n_tokens,
           n_docs,
           coalesce(array_to_string(
             list_transform(
               list_filter(offsets, o -> o < {_SEQ_LEN}),
               o -> o::INT), ','), '') AS doc_starts_csv
    FROM packs
    """,
)
def packed_ids_export(spark, sf_dir):
    """Training-shard export, hash-checked end-to-end: documents →
    md5-hash token ids (+eos) → start-offset binning → flattened,
    truncated ``input_ids`` with ``doc_starts`` boundaries
    (operators/pack.py:export_packed_ids). The oracle replays the
    arithmetic relationally — cumsum window, bin = floor(start/len),
    per-bin flatten in doc order, truncation at seq_len, doc-start
    offsets relative to the bin's first document.

    The roster row projects the two array columns to scalars
    (``ids_md5`` — md5 of the comma-joined id stream — and
    ``doc_starts_csv``): the driver's canonicalizer sorts a pandas
    frame over all output columns and cannot factorize list values
    (r11 red row: ``TypeError: unhashable type: 'list'``). The
    full-array contract (token conservation, boundary offsets,
    determinism) stays pinned in tests/test_pack.py and
    tests/test_crawl_queries.py via :func:`packed_ids_full`."""
    as_csv = lambda c: F.concat_ws(  # noqa: E731
        ",", F.transform(F.col(c), lambda x: x.cast("string"))
    )
    return packed_ids_full(spark, sf_dir).select(
        "pack_id",
        F.md5(as_csv("input_ids")).alias("ids_md5"),
        "n_tokens",
        "n_docs",
        as_csv("doc_starts").alias("doc_starts_csv"),
    )


def packed_ids_full(spark, sf_dir):
    """The array-valued export the roster row is a scalar projection
    of — ``input_ids: array<int>`` + ``doc_starts: array<int>``. Not
    registered (the driver canonicalizer rejects array columns); the
    full-array invariants are pytest-pinned against this form."""
    from lantern_spark.operators.pack import export_packed_ids

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("text").isNotNull())
    )
    return export_packed_ids(
        docs,
        "text",
        "doc_id",
        tokenizer=None,
        token_ids=_hash_token_ids("text"),
        seq_len=_SEQ_LEN,
        eos_id=_EOS,
        chunks=1,
    )
