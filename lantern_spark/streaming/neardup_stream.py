"""Continuous near-duplicate gating: stream documents through a
persisted MinHash/LSH bucket store.

Completes the streaming dedup family (exact: O(distinct) state;
Bloom: constant state, approximate) with the NEAR-dup tier — the
RefinedWeb/Dolma shape where yesterday's crawl must not re-admit
today's lightly-edited copies. Mirrors ``streaming/bm25_stream``'s
daemon pattern: ``foreachBatch`` over the document source; each
micro-batch computes MinHash band keys for ONLY the new docs, joins
them against the persisted bucket store, optionally VERIFIES LSH
candidates with exact n-gram Jaccard against the stored survivors
(LSH alone is a candidate generator — unverified gating would drop at
the banding false-positive rate), and appends the batch's surviving
docs + their buckets in per-epoch OVERWRITE directories (replayed
micro-batches rewrite identical files — the at-least-once idempotence
contract).

Semantics (first-seen-representative, like the exact/Bloom gates): a
doc is dropped when it is a (verified) near-duplicate of an earlier
SURVIVOR — duplicates-of-duplicates chain to the surviving
representative because the dropped copy's buckets are never stored,
so any later copy still collides with the representative's buckets
for all bands they share. Within a batch the min-id bucket winner
survives (deterministic, the repo convention).

State: the bucket store is a parquet table of (band, key, doc_id) —
O(survivors × bands) rows of ~20 B, a few GB per billion survivors;
it lives on storage (not the state store), so restarts recover from
the checkpoint + the epoch directories alone. The survivor text store
doubles as the verification corpus.

Scale honesty: every micro-batch joins its band keys against the FULL
store — one shuffle whose store side grows with history (AQE
broadcasts the batch side once the store dominates, so the steady
state is a store-partitioned semi-join: each batch scans the store
once). At very large histories, prefilter with a Bloom set over the
band keys (operators/bloomset — constant memory, no false negatives)
so only batches with probable collisions pay the store scan, and keep
``consolidate_every_batches`` on so the scan reads compacted files.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lantern_spark.operators.dedup import minhash_docs

__all__ = [
    "incremental_neardup_job",
    "load_neardup_survivors",
    "consolidate_neardup_store",
]


def _band_keys(
    df: DataFrame, text_col: str, id_col: str,
    n_hashes: int, bands: int, shingle_k: int,
) -> DataFrame:
    """(band, key, id) LSH bucket rows — the same banding math as
    ``lsh_candidate_pairs`` (md5 over signature slices), factored so
    batch and store rows key identically."""
    rows = bands
    rpb = n_hashes // bands
    sigs = minhash_docs(df, text_col, id_col, n_hashes, shingle_k)
    band_cols = []
    for b in range(rows):
        chunk = F.slice(F.col("sig"), b * rpb + 1, rpb)
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws("\x1f", chunk.cast("array<string>"))
                ).alias("key"),
            )
        )
    return sigs.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(
        F.col("bk.band").alias("band"),
        F.col("bk.key").alias("key"),
        F.col(id_col),
    )


def load_neardup_survivors(spark: SparkSession, path: str) -> DataFrame:
    """All surviving docs written so far (epoch subdirectories)."""
    return spark.read.option("recursiveFileLookup", "true").parquet(
        os.path.join(path, "docs")
    )


def consolidate_neardup_store(spark: SparkSession, path: str) -> None:
    """Compact the per-epoch fragments (the small-file problem of any
    epoch-append layout — the bm25_stream consolidation analog): docs
    and buckets each rewrite as one ``batch_consolidated`` directory
    via staged write + ``replace_dir`` swap (recoverable ``__old``
    backup across the only non-atomic window; :func:`recover_dir` at
    job start restores a crashed swap). Contents are unchanged —
    reads go through ``recursiveFileLookup`` either way — so the gate
    never pauses: run it from the foreachBatch cadence
    (``consolidate_every_batches``) or out-of-band."""
    import shutil

    from lantern_spark._fsutil import recover_dir, replace_dir

    for sub in ("docs", "buckets"):
        live = os.path.join(path, sub)
        recover_dir(live)
        if not os.path.isdir(live):
            continue
        staged = live.rstrip("/") + "__staged"
        shutil.rmtree(staged, ignore_errors=True)
        (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(live)
            .write.mode("overwrite")
            .parquet(os.path.join(staged, "batch_consolidated"))
        )
        replace_dir(staged, live)


def incremental_neardup_job(
    stream_df: DataFrame,
    text_col: str,
    id_col: str,
    store_path: str,
    checkpoint: str,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    verify_threshold: Optional[float] = 0.8,
    trigger: Optional[dict] = None,
    consolidate_every_batches: Optional[int] = 32,
):
    """Start the gate; returns the StreamingQuery.

    ``verify_threshold``: exact n-gram Jaccard floor for dropping an
    LSH-collided doc (None = drop on ANY bucket collision — cheaper,
    but pays the banding FP rate in lost unique docs; the default
    verifies, the batch operator's contract). Layout under
    ``store_path``: ``docs/batch_<epoch>`` (survivors, full input
    schema) and ``buckets/batch_<epoch>`` ((band, key, doc_id));
    fragments compact every ``consolidate_every_batches`` epoch dirs
    (:func:`consolidate_neardup_store` — staged swap, contents
    unchanged; None disables)."""
    from lantern_spark._fsutil import recover_dir

    spark = stream_df.sparkSession
    for sub in ("docs", "buckets"):
        recover_dir(os.path.join(store_path, sub))

    def _fragments(sub: str) -> int:
        d = os.path.join(store_path, sub)
        if not os.path.isdir(d):
            return 0
        return sum(1 for n in os.listdir(d) if n.startswith("batch_"))

    def process(batch_df: DataFrame, epoch: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df = batch_df.persist()
        try:
            keys = _band_keys(
                batch_df, text_col, id_col, n_hashes, bands, shingle_k
            ).persist()
            # in-batch: min-id winner per bucket; a doc losing ANY
            # bucket to a smaller in-batch id is an in-batch near-dup
            # CANDIDATE (verified below together with history hits)
            w = Window.partitionBy("band", "key").orderBy(
                F.col(id_col).asc()
            )
            in_batch = (
                keys.withColumn("__first", F.first(id_col).over(w))
                .filter(F.col("__first") != F.col(id_col))
                .select(
                    F.col(id_col).alias("__new_id"),
                    F.col("__first").alias("__old_id"),
                )
            )
            bucket_dir = os.path.join(store_path, "buckets")
            docs_dir = os.path.join(store_path, "docs")
            pairs = in_batch
            have_history = os.path.isdir(bucket_dir) and any(
                n.startswith("batch_") for n in os.listdir(bucket_dir)
            )
            if have_history:
                store = spark.read.option(
                    "recursiveFileLookup", "true"
                ).parquet(bucket_dir)
                hist = keys.join(
                    store.withColumnRenamed(id_col, "__old_id"),
                    ["band", "key"],
                ).select(
                    F.col(id_col).alias("__new_id"), F.col("__old_id")
                )
                pairs = pairs.unionByName(hist)
            pairs = pairs.distinct()
            if verify_threshold is not None:
                # exact Jaccard verify against the stored/in-batch
                # survivor texts — LSH is a candidate generator
                olds = batch_df.select(
                    F.col(id_col).alias("__old_id"),
                    F.col(text_col).alias("__old_text"),
                )
                if have_history:
                    olds = olds.unionByName(
                        load_neardup_survivors(spark, store_path).select(
                            F.col(id_col).alias("__old_id"),
                            F.col(text_col).alias("__old_text"),
                        )
                    )
                both = (
                    pairs.join(
                        batch_df.select(
                            F.col(id_col).alias("__new_id"),
                            F.col(text_col).alias("__new_text"),
                        ),
                        "__new_id",
                    )
                    .join(olds, "__old_id")
                )
                cand = both.select(
                    F.col("__new_id").alias("id_a"),
                    F.col("__old_id").alias("id_b"),
                    F.col("__new_text").alias("__text_a"),
                    F.col("__old_text").alias("__text_b"),
                )
                dropped = _verified_ids(
                    cand, shingle_k, float(verify_threshold)
                )
            else:
                dropped = pairs.select(
                    F.col("__new_id").alias(id_col)
                ).distinct()
            survivors = batch_df.join(
                dropped.withColumnRenamed("id_a", id_col)
                if verify_threshold is not None
                else dropped,
                id_col,
                "left_anti",
            ).persist()
            # idempotent epoch writes (bm25_stream convention):
            # replayed batches overwrite their own directories
            survivors.write.mode("overwrite").parquet(
                os.path.join(docs_dir, f"batch_{epoch}")
            )
            keys.join(
                survivors.select(id_col), id_col
            ).write.mode("overwrite").parquet(
                os.path.join(bucket_dir, f"batch_{epoch}")
            )
            survivors.unpersist()
            keys.unpersist()
            if (
                consolidate_every_batches
                and _fragments("buckets") >= consolidate_every_batches
            ):
                consolidate_neardup_store(spark, store_path)
        finally:
            batch_df.unpersist()

    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def _verified_ids(cand: DataFrame, shingle_k: int, threshold: float):
    """ids (as ``id_a``) whose exact shingle Jaccard with any candidate
    partner clears the floor — the same tokenize→shingle→overlap math
    as ``dedup.ngram_jaccard``, inlined over the paired texts."""
    from lantern_spark.functions.text import tokenize
    from lantern_spark.operators.dedup import shingles

    sa = shingles(tokenize(F.col("__text_a")), shingle_k)
    sb = shingles(tokenize(F.col("__text_b")), shingle_k)
    inter = F.size(F.array_intersect(sa, sb)).cast("double")
    uni = F.size(F.array_union(sa, sb)).cast("double")
    jac = F.when(uni > 0, inter / uni).otherwise(F.lit(0.0))
    return (
        cand.withColumn("__j", jac)
        .filter(F.col("__j") >= threshold)
        .select("id_a")
        .distinct()
    )
