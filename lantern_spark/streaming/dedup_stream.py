"""Streaming exact dedup: first-seen-wins over a continuous corpus.

North-star extension: the streaming twin of ``operators/dedup.
exact_dedup`` for continuous ingestion pipelines — documents arrive on
a stream, only the FIRST occurrence of each content hash is emitted
downstream, duplicates are dropped forever after (the reference's
daemon processes tables continuously the same way:
lantern_cli/src/daemon re-embeds only unseen rows).

Design:
- rows are keyed by md5(content) → ONE keyed state shuffle;
- state per distinct hash is a single marker tuple (first-seen id) —
  O(distinct contents), the minimum any exact dedup can hold; on a
  real cluster the RocksDB state store spills it off-heap;
- within a micro-batch the winner is the min id (deterministic,
  mirrors the batch operator's keep='min_id');
- NoTimeout: dedup state must never expire (a timeout would re-admit
  old duplicates). This also matches the container constraint — this
  Spark 4.1.2 local build deadlocks on ProcessingTimeTimeout (see
  streaming/sessionize.py).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def make_stream_deduper(id_col: str, text_col: str):
    """Per-hash-group stateful function: emits the first-ever row for
    the group (min id within the first batch that sees it), nothing
    afterwards. Plain generator over pandas frames — unit-testable
    with a fake GroupState, same pattern as streaming/sessionize.py."""

    def fn(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return  # hash already seen in a previous batch — drop all
        best = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            row = pdf.loc[pdf[id_col].idxmin()]
            if best is None or row[id_col] < best[id_col]:
                best = row
        if best is None:
            return
        state.update((int(best[id_col]),))
        yield pd.DataFrame(
            {
                "content_hash": [key[0]],
                id_col: [best[id_col]],
                text_col: [best[text_col]],
            }
        )

    return fn


def streaming_exact_dedup(
    stream_df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """First-seen rows of a streaming corpus, keyed by content hash.

    Output schema: (content_hash, <id_col>, <text_col>).
    """
    out_schema = T.StructType(
        [
            T.StructField("content_hash", T.StringType()),
            T.StructField(id_col, T.LongType()),
            T.StructField(text_col, T.StringType()),
        ]
    )
    state_schema = T.StructType([T.StructField("first_id", T.LongType())])
    keyed = stream_df.select(
        F.md5(F.col(text_col)).alias("content_hash"),
        F.col(id_col).cast("long").alias(id_col),
        F.col(text_col),
    ).groupBy("content_hash")
    return keyed.applyInPandasWithState(
        make_stream_deduper(id_col, text_col),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ----------------------------------------------------------------------
# bounded-state approximate dedup (Dolma-style Bloom gate)
# ----------------------------------------------------------------------

def make_bloom_deduper(
    id_col: str, text_col: str, m_shard: int, k: int,
    max_fill_ratio=0.95,
):
    """Per-SHARD stateful function: state is the shard's Bloom bitset
    (``m_shard/8`` bytes, FOREVER — the whole point), rows are tested
    then inserted in ascending ``id_col`` order (deterministic
    within-batch winner, mirroring the exact deduper's min-id rule).
    Plain generator — unit-testable with a FakeState.

    Saturation guard (r9, review r8 item 6): every micro-batch
    popcounts the loaded shard bitset and raises ValueError past
    ``max_fill_ratio`` — an over-capacity filter's FPR → 1 and it
    silently drops every incoming doc as "seen"; failing the stream
    loudly is the correct behavior. ``None`` disables."""
    import numpy as np

    from lantern_spark.operators.bloomset import (
        _fill_ratio,
        _positions_np,
        _set_bits,
        _test_bits,
    )

    def fn(key, pdfs, state):
        if state.exists:
            bits = np.frombuffer(
                state.get[0], dtype=np.uint8
            ).copy()
        else:
            bits = np.zeros(m_shard // 8, dtype=np.uint8)
        if max_fill_ratio is not None:
            fill = _fill_ratio(bits)
            if fill > max_fill_ratio:
                raise ValueError(
                    f"streaming bloom shard is saturated: fill ratio "
                    f"{fill:.3f} > max_fill_ratio {max_fill_ratio}; "
                    "restart the stream with larger m_bits"
                )
        # a shard group can arrive as MULTIPLE Arrow chunks — the
        # min-id winner is only deterministic if the sort spans all of
        # them, so concatenate first (r8 ADVICE; state is already
        # O(m_shard), the group concat does not change the memory
        # shape — the group was materialized to be sorted either way)
        frames = [pdf for pdf in pdfs if len(pdf) > 0]
        if frames:
            pdf = (
                frames[0]
                if len(frames) == 1
                else pd.concat(frames, ignore_index=True)
            )
            pdf = pdf.sort_values(id_col, kind="stable")
            keep_mask = np.zeros(len(pdf), dtype=bool)
            h1 = pdf["__h1"].to_numpy("int64")
            h2 = pdf["__h2"].to_numpy("int64")
            pos = _positions_np(h1, h2, m_shard, k)
            # sequential test-then-set: an in-batch duplicate of an
            # earlier in-batch row must see that row's bits
            for i in range(len(pdf)):
                if not _test_bits(bits, pos[i : i + 1])[0]:
                    keep_mask[i] = True
                    _set_bits(bits, pos[i : i + 1])
            if keep_mask.any():
                yield pdf.loc[keep_mask, [id_col, text_col]]
        state.update((bits.tobytes(),))

    return fn


def streaming_bloom_dedup(
    stream_df: DataFrame,
    text_col: str,
    id_col: str,
    n_shards: int = 64,
    m_bits: int = 1 << 27,
    k: int = 7,
    seed: int = 42,
    max_fill_ratio=0.95,
) -> DataFrame:
    """First-seen rows of a streaming corpus through a BOUNDED-memory
    Bloom gate (AI2 Dolma's dedup design): total state is exactly
    ``m_bits/8`` bytes across all shards no matter how many documents
    the stream has ever carried — the streaming twin of
    ``operators/bloomset``, vs ``streaming_exact_dedup``'s
    O(distinct-hashes) state.

    Contract: NO false negatives (a true duplicate is always dropped);
    false positives drop unique docs at the sized FPR
    (``bloomset.bloom_fpr(total_expected_docs, m_bits, k)``) — size
    ``m_bits`` for the stream's LIFETIME volume. Shard count spreads
    state-store I/O: every touched shard rewrites its ``m_bits /
    n_shards / 8``-byte slice per micro-batch.

    Output schema: (<id_col>, <text_col>).
    """
    from lantern_spark.operators.bloomset import (
        _hash_cols,
        _m_shard,
        _shard_col,
    )

    m_shard = _m_shard(m_bits, n_shards)
    kc = F.col(text_col)
    h1, h2 = _hash_cols(kc, seed)
    keyed = (
        stream_df.filter(kc.isNotNull())
        .select(
            _shard_col(kc, n_shards).alias("__shard"),
            F.col(id_col).cast("long").alias(id_col),
            kc.alias(text_col),
            h1.alias("__h1"),
            h2.alias("__h2"),
        )
        .groupBy("__shard")
    )
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(text_col, T.StringType()),
        ]
    )
    state_schema = T.StructType([T.StructField("bits", T.BinaryType())])
    return keyed.applyInPandasWithState(
        make_bloom_deduper(
            id_col, text_col, m_shard, k, max_fill_ratio=max_fill_ratio
        ),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
