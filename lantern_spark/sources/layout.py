"""Storage-layout utilities for 100 TB-scale tables.

The reference runs inside Postgres, where heap layout, page size, and
index placement are the storage story. On a Spark data lake the
equivalents are PARTITION LAYOUT (coarse pruning), BUCKETING
(co-located joins without a shuffle), and FILE SIZING (neither
thousand-file fragments nor unsplittable monoliths). These utilities make
those layouts explicit, with readers that demonstrably prune:

- :func:`write_time_partitioned` / :func:`read_time_range` — date(or
  hour)-partitioned event layout; a time-range read touches only the
  matching partition directories (Catalyst partition pruning — the
  scan's ``PartitionFilters``), the difference between scanning 3 days
  and 3 years.
- :func:`write_bucketed` — hash-bucketed, sorted table via
  ``bucketBy``; two tables bucketed on the same key with the same
  bucket count join WITHOUT an Exchange on either side (verified in
  tests by plan inspection), the layout that turns every recurring
  big-big join from a 100 TB shuffle into a map-side zip.
- :func:`compact_small_files` — rewrite a directory at a target file
  size. Streaming sinks and fine-grained partitioned writes fragment
  into kilobyte files whose per-file open/footer cost dominates reads;
  compaction is the standing maintenance job every lakehouse runs.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "write_time_partitioned",
    "read_time_range",
    "write_bucketed",
    "compact_small_files",
    "recover_compaction",
]

_GRANULARITIES = {"day": "yyyy-MM-dd", "hour": "yyyy-MM-dd-HH"}


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    granularity: str = "day",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` partitioned by a derived ``__pt`` time bucket.

    ``repartition`` on the bucket before the write keeps one writer
    per bucket (no tasks × buckets small-file blow-up); at higher
    volumes pair with :func:`compact_small_files` or a
    ``maxRecordsPerFile`` option. The source timestamp column is kept
    intact — ``__pt`` is purely a layout/pruning column.
    """
    if granularity not in _GRANULARITIES:
        raise ValueError(
            f"granularity must be one of {sorted(_GRANULARITIES)}, "
            f"got {granularity!r}"
        )
    fmt = _GRANULARITIES[granularity]
    out = df.withColumn("__pt", F.date_format(F.col(ts_col), fmt))
    out.repartition(F.col("__pt")).write.mode(mode).partitionBy(
        "__pt"
    ).parquet(path)


def read_time_range(
    spark: SparkSession,
    path: str,
    start: Optional[str] = None,
    end: Optional[str] = None,
    drop_partition_col: bool = True,
) -> DataFrame:
    """Read a time-partitioned layout pruned to ``[start, end)``.

    Bounds are compared against the PARTITION VALUE (``__pt``, a
    string in the layout's date format), so the filter is a pure
    partition predicate — Catalyst resolves it against directory names
    at planning time and never lists, opens, or footers the pruned
    directories. Pass bounds in the same format the layout was written
    with (``yyyy-MM-dd`` for day granularity).
    """
    df = spark.read.parquet(path)
    if start is not None:
        df = df.filter(F.col("__pt") >= start)
    if end is not None:
        df = df.filter(F.col("__pt") < end)
    return df.drop("__pt") if drop_partition_col else df


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int,
    sort_cols: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a hash-bucketed, optionally sorted table.

    Both sides of a recurring join written with the SAME bucket column
    and count join with NO Exchange (and with ``sort_cols`` on the
    join key, no Sort either): the shuffle is paid once at write time
    instead of on every query — the decisive layout choice for a fact
    table joined daily at 100 TB. Bucketed tables must live in the
    catalog (``saveAsTable``), since bucket metadata is catalog state.
    """
    w = df.write.mode(mode).bucketBy(int(num_buckets), bucket_col)
    if sort_cols:
        w = w.sortBy(*list(sort_cols))
    w.format("parquet").saveAsTable(table)


def _partition_columns(path: str, fs=None) -> list:
    """Ordered ``col=value`` partition columns of a directory layout,
    walked from one leaf path (the Hive-layout convention Spark
    writes)."""
    from lantern_spark._fsutil import LOCAL_FS

    fs = fs or LOCAL_FS
    cols = []
    cur = path
    while True:
        subdirs = [
            d
            for d in fs.listdir(cur)
            if "=" in d and fs.isdir(fs.join(cur, d))
        ]
        if not subdirs:
            return cols
        cols.append(subdirs[0].split("=", 1)[0])
        cur = fs.join(cur, subdirs[0])


def recover_compaction(path: str, fs=None) -> None:
    """Self-heal after a compaction that crashed mid-publish (shared
    machinery: ``_fsutil.vd_recover``), drop stale staging.
    Idempotent."""
    from lantern_spark._fsutil import LOCAL_FS, vd_recover

    fs = fs or LOCAL_FS
    vd_recover(path, fs)
    if fs.supports_rename:
        # pre-r14 staging name, cleared for old on-disk layouts
        fs.rmtree(path.rstrip("/") + "__compact")


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    out_path: Optional[str] = None,
    fs=None,
) -> dict:
    """Rewrite a parquet directory at ``target_file_bytes`` per file.

    Sizes the output file count from the CURRENT on-disk bytes (the
    only number that predicts post-rewrite file size), rewrites with
    ``repartition`` — a full shuffle, deliberately: ``coalesce`` would
    chain narrow dependencies and skew file sizes — and swaps
    directories unless ``out_path`` is given. The swap's only
    non-atomic window leaves a ``<path>__old`` backup that
    :func:`recover_compaction` (run automatically at the next
    invocation) restores, so a crash never loses the table.

    A Hive-partitioned layout (``col=value`` directories, e.g. from
    :func:`write_time_partitioned`) is PRESERVED: the rewrite
    re-partitions on the detected partition columns and writes
    ``partitionBy`` them — one file per partition directory — keeping
    partition pruning intact (flattening the tree would silently turn
    every pruned range read back into a full listing). Partition
    column types are read as-written (inference off) so a string
    ``__pt=2024-01-08`` stays a string through the rewrite.
    ``fs`` (r14): an :class:`~lantern_spark._fsutil.FS` adapter for
    the Python-side path operations (sizing walk, partition-column
    detection, the publish). On a rename-less object store an IN-PLACE
    compaction is refused — the plain-directory layout this function
    swaps cannot be republished atomically without rename; pass
    ``out_path`` (write-elsewhere-and-repoint is the caller's atomic
    unit there) or keep compaction inside a versioned layout (the
    streaming consolidators), whose generation-pointer publish exists
    for exactly this.

    Returns {files_before, files_after, bytes, target_files}.
    """
    from lantern_spark._fsutil import LOCAL_FS

    fs = fs or LOCAL_FS
    if out_path is None and not fs.supports_rename:
        raise ValueError(
            "in-place compaction needs an atomic directory swap, which "
            "a rename-less store cannot provide: pass out_path= and "
            "point readers at it, or use a generation-versioned layout"
        )
    recover_compaction(path, fs)
    total = 0
    files_before = 0
    for p, sz in fs.walk_files(path):
        if p.endswith(".parquet"):
            files_before += 1
            total += sz
    n_files = max(1, math.ceil(total / max(1, target_file_bytes)))
    staged = out_path or (path.rstrip("/") + "__compact")
    part_cols = _partition_columns(path, fs)
    infer_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    old_infer = spark.conf.get(infer_key)
    try:
        if part_cols:
            spark.conf.set(infer_key, "false")
        df = spark.read.parquet(path)
        if part_cols:
            # one writer per partition dir, but an oversized partition
            # must still split at the target: maxRecordsPerFile sized
            # from the measured on-disk bytes/row keeps every output
            # file near target_file_bytes without a per-partition plan
            n_rows = df.count()
            bytes_per_row = total / max(n_rows, 1)
            max_records = max(
                1, int(target_file_bytes / max(bytes_per_row, 1))
            )
            w = df.repartition(*[F.col(c) for c in part_cols])
            writer = w.write.mode("overwrite").option(
                "maxRecordsPerFile", max_records
            ).partitionBy(*part_cols)
        else:
            writer = df.repartition(n_files).write.mode("overwrite")
        writer.parquet(staged)
    finally:
        spark.conf.set(infer_key, old_infer)
    if out_path is None:
        from lantern_spark._fsutil import replace_dir

        replace_dir(staged, path, fs)
        staged = path
    files_after = sum(
        1 for p, _sz in fs.walk_files(staged) if p.endswith(".parquet")
    )
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": total,
        "target_files": n_files,
    }
