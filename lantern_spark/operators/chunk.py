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

__all__ = ["chunk_text", "chunk_count"]


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
