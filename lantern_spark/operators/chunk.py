"""Document chunking: split long documents into bounded-token windows.

North-star extension: every embedding / RAG / long-context pipeline
chunks documents before embedding them (the embedding model has a
token budget; retrieval granularity wants passages, not books). The
standard recipe is fixed-size token windows with overlap — overlap
keeps sentences that straddle a boundary retrievable from at least one
chunk.

Spark-first shape: chunking is PURE column expressions (split →
transform(sequence(...)) → posexplode) — whole-stage codegen, map-only
at any scale, no Python workers, and each output row carries its
provenance (`chunk_id`, `start_token`, `end_token`) so chunks join
back to documents and embed/index downstream (`operators/embed`,
`operators/index`) without another pass over the text.

Tokenization is whitespace (``\\S+`` runs — the repo-wide convention,
`operators/dedup._token_char_spans` / `textstats.token_count_ws`), and
chunk text is the tokens re-joined with single spaces: runs of
whitespace inside a chunk are NORMALIZED. That is the documented
trade-off for staying JVM-side — embedding models are whitespace-
insensitive; callers that must preserve exact bytes keep `start_token`/
`end_token` and re-slice the original text themselves.

Every step replays in DuckDB SQL (pinned in tests/test_chunk.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_text", "chunk_count", "chunk_sentences"]


def _tokens(col):
    # \S+ runs: split on whitespace, drop the empty fragments a
    # leading/trailing separator produces.
    return F.filter(
        F.split(F.coalesce(F.col(col), F.lit("")), r"\s+"),
        lambda x: x != "",
    )


def chunk_count(col, max_tokens: int, stride: int):
    """Number of chunks a document yields: 0 for empty docs, else
    ``ceil(max(n - max_tokens, 0) / stride) + 1`` — the last chunk is
    allowed to be short, and a trailing window fully contained in the
    previous one is never emitted."""
    n = F.size(_tokens(col))
    return F.when(n <= 0, F.lit(0)).otherwise(
        F.ceil(F.greatest(n - F.lit(max_tokens), F.lit(0)) / F.lit(stride))
        .cast("int")
        + 1
    )


def chunk_text(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Explode each document into overlapping ``max_tokens``-token
    chunks (stride = ``max_tokens - overlap``). Output: the input's
    ``id_col`` plus

    - ``chunk_id``    — 0-based chunk index within the document,
    - ``chunk_text``  — the chunk's tokens joined by single spaces,
    - ``start_token`` / ``end_token`` — the chunk's [start, end) token
      span in the document (document-order provenance: re-slice,
      re-rank, or re-assemble downstream without re-reading the doc).

    Documents with no tokens (NULL/empty/whitespace) yield no rows —
    there is nothing to embed; callers wanting a row per doc left-join
    the result back.

    Scale: pure column expressions — one map-only pass, no shuffle, no
    UDF; output size is ``n_tokens / stride`` rows per doc by
    construction (bounded fan-out, unlike sentence splitting). The
    downstream embed/index steps dominate; chunking is free.
    """
    max_tokens = int(max_tokens)
    overlap = int(overlap)
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if not (0 <= overlap < max_tokens):
        raise ValueError(
            f"overlap must be in [0, max_tokens), got {overlap}"
        )
    stride = max_tokens - overlap

    toks = _tokens(text_col)
    n = F.size(toks)
    n_chunks = chunk_count(text_col, max_tokens, stride)
    # guard the sequence: Spark's sequence(0, -1) DESCENDS instead of
    # being empty, so token-less docs take the empty-array branch
    seq = F.when(n_chunks <= 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(0), n_chunks - 1)
    )
    chunks = F.transform(
        seq,
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            F.array_join(
                F.slice(toks, i * stride + 1, max_tokens), " "
            ).alias("chunk_text"),
            (i * stride).cast("int").alias("start_token"),
            F.least(i * stride + max_tokens, n).cast("int").alias(
                "end_token"
            ),
        ),
    )
    return (
        df.withColumn("__chunks", chunks)
        .filter(F.size("__chunks") > 0)
        .select(id_col, F.explode("__chunks").alias("__c"))
        .select(
            id_col,
            F.col("__c.chunk_id").alias("chunk_id"),
            F.col("__c.chunk_text").alias("chunk_text"),
            F.col("__c.start_token").alias("start_token"),
            F.col("__c.end_token").alias("end_token"),
        )
    )


# sentence-boundary split: a sentence ends at ./!/?/… followed by
# whitespace (Java lookbehind — stays JVM-side in the split)
_SENT_RX = r"(?<=[.!?…])\s+"


def chunk_sentences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_tokens: int = 512,
    overlap_sentences: int = 1,
) -> DataFrame:
    """Sentence-aware chunking: split at sentence boundaries, greedily
    pack whole sentences into chunks of at most ``max_tokens``
    whitespace tokens, and start each following chunk with the previous
    chunk's last ``overlap_sentences`` sentences (context carry-over).
    Fixed windows (:func:`chunk_text`) cut mid-sentence; retrieval
    pipelines usually want passages that READ — this is that splitter.

    Output schema matches :func:`chunk_text` (``chunk_id``,
    ``chunk_text``, ``start_token``/``end_token`` document token spans;
    overlapped sentences make spans of consecutive chunks overlap).
    Contracts:

    - a single sentence LONGER than ``max_tokens`` is emitted as its
      own oversized chunk (never split mid-sentence here — compose
      with ``chunk_text`` on the result if a hard cap is required);
    - overlap is skipped when the carried sentences alone would fill
      the budget (the next chunk must make progress);
    - inter-sentence whitespace normalizes to one space; whitespace
      INSIDE a sentence is preserved (token spans stay exact either
      way — tokens are ``\\S+`` runs);
    - token-less documents yield no rows.

    Shape: the sentence split is a JVM expression; the greedy packing
    is one Arrow-batched kernel (irregular accumulation — a running
    token budget — is not a healthy fit for interpreted HOF
    accumulators). Map-only, row-local, deterministic under any
    partitioning.
    """
    max_tokens = int(max_tokens)
    overlap_sentences = int(overlap_sentences)
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if overlap_sentences < 0:
        raise ValueError(
            f"overlap_sentences must be >= 0, got {overlap_sentences}"
        )

    import pandas as pd
    from pyspark.sql import types as T

    id_field = df.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType),
            T.StructField("chunk_id", T.IntegerType()),
            T.StructField("chunk_text", T.StringType()),
            T.StructField("start_token", T.IntegerType()),
            T.StructField("end_token", T.IntegerType()),
        ]
    )
    ov = overlap_sentences

    def pack(batches):
        import re

        sent_rx = re.compile(r"(?<=[.!?…])\s+")
        for pdf in batches:
            out = {k.name: [] for k in out_schema.fields}
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None or not text.strip():
                    continue
                sents = [s for s in sent_rx.split(text.strip()) if s.strip()]
                counts = [len(s.split()) for s in sents]
                starts = []  # document token offset of each sentence
                acc = 0
                for c in counts:
                    starts.append(acc)
                    acc += c
                i, cid = 0, 0
                n_s = len(sents)
                while i < n_s:
                    # carried overlap from the previous chunk — shrink
                    # it until the NEW sentence also fits (overlap is
                    # padding, never a reason to bust the budget)
                    lo = i
                    if cid > 0 and ov > 0:
                        lo = max(0, i - ov)
                        while lo < i and sum(counts[lo : i + 1]) > max_tokens:
                            lo += 1
                    total = sum(counts[lo : i + 1])
                    j = i + 1
                    # total may already exceed max_tokens ONLY when the
                    # single sentence i is oversized (emitted alone)
                    while j < n_s and total + counts[j] <= max_tokens:
                        total += counts[j]
                        j += 1
                    out[id_col].append(doc_id)
                    out["chunk_id"].append(cid)
                    out["chunk_text"].append(" ".join(sents[lo:j]))
                    out["start_token"].append(starts[lo])
                    out["end_token"].append(starts[j - 1] + counts[j - 1])
                    cid += 1
                    i = j
            yield pd.DataFrame(
                {
                    id_col: pd.Series(out[id_col], dtype=object),
                    "chunk_id": pd.Series(out["chunk_id"], dtype="int32"),
                    "chunk_text": pd.Series(
                        out["chunk_text"], dtype=object
                    ),
                    "start_token": pd.Series(
                        out["start_token"], dtype="int32"
                    ),
                    "end_token": pd.Series(out["end_token"], dtype="int32"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(pack, out_schema)
