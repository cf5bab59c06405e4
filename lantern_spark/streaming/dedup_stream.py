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
