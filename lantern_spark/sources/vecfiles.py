"""fvecs / ivecs / bvecs ANN-benchmark file readers.

Reference: lantern_extras/src/dotvecs.rs:32-139 (``parse_fvecs`` /
``parse_ivecs`` / ``parse_bvecs``): little-endian records, each a
4-byte dim prefix followed by dim elements (f32 / i32 / u8).

Spark design: ``spark.read.format('binaryFile')`` lists the files as
(path, content) rows; a ``mapInPandas`` pass decodes each file's bytes
into (path, row_id, vec) rows with one numpy frombuffer per file — the
decode is distributed across executors, one task per file (matching
the reference's per-file streaming parse, minus the FTP fetch which is
out of scope, dotvecs.rs:140-207).

For 100 TB-scale corpora the unit of parallelism is the file; shard
the dataset into many files (as SIFT/GIST distributions already do).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_ELEMENT = {
    "fvecs": (np.float32, 4, T.FloatType()),
    "ivecs": (np.int32, 4, T.IntegerType()),
    "bvecs": (np.uint8, 1, T.IntegerType()),
}


def decode_vecs_bytes(buf: bytes, kind: str):
    """Decode one .Xvecs buffer → list of lists (shared by the Spark
    path and tests). Each record: int32 dim ‖ dim elements."""
    dtype, esize, _ = _ELEMENT[kind]
    out = []
    off = 0
    n = len(buf)
    while off + 4 <= n:
        dim = int(np.frombuffer(buf, dtype="<i4", count=1, offset=off)[0])
        off += 4
        nbytes = dim * esize
        if dim <= 0 or off + nbytes > n:
            raise ValueError(
                f"corrupt {kind} record at offset {off - 4}: dim={dim}"
            )
        vec = np.frombuffer(buf, dtype=np.dtype(dtype).newbyteorder("<"),
                            count=dim, offset=off)
        out.append(vec.tolist())
        off += nbytes
    if off != n:
        raise ValueError(f"trailing {n - off} bytes in {kind} buffer")
    return out


def read_vecs(spark: SparkSession, path: str, kind: str = "fvecs") -> DataFrame:
    """Read .fvecs/.ivecs/.bvecs file(s) → (path, row_id, vec).

    ``row_id`` is the record index within its file (the reference
    yields rows in file order, dotvecs.rs:52-63).
    """
    if kind not in _ELEMENT:
        raise ValueError(f"kind must be one of {sorted(_ELEMENT)}")
    _, _, spark_type = _ELEMENT[kind]
    schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("row_id", T.LongType()),
            T.StructField("vec", T.ArrayType(spark_type)),
        ]
    )
    files = spark.read.format("binaryFile").load(path)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                vecs = decode_vecs_bytes(row["content"], kind)
                yield pd.DataFrame(
                    {
                        "path": row["path"],
                        "row_id": range(len(vecs)),
                        "vec": vecs,
                    }
                )

    return files.select("path", "content").mapInPandas(decode, schema)


def write_vecs(vectors, path: str, kind: str = "fvecs") -> None:
    """Driver-side writer for test fixtures (inverse of decode)."""
    dtype, _, _ = _ELEMENT[kind]
    with open(path, "wb") as f:
        for v in vectors:
            arr = np.asarray(v, dtype=dtype)
            f.write(np.int32(len(arr)).tobytes())
            f.write(arr.astype(np.dtype(dtype).newbyteorder("<")).tobytes())
