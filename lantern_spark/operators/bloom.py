"""Bloom-filter sketch type for doc-id sets.

Reference: ``lantern_extras/src/bloom.rs:9-60`` — a ``bloom`` column
type (bitmap + num_hashes, serde-serialized) built by
``array_to_bloom(smallint[]/int[]/bigint[])`` with 1% target FPR and a
fixed seed (42), used by the BM25 aggregate's approximation tier to
skip exact postings for very hot terms (bm25_agg.rs:161-216).

Spark-first design: the bloom is an opaque ``BinaryType`` value built
per group by an Arrow-batched pandas UDF. Layout (little-endian):

    bytes 0..4   num_hashes  (uint32)
    bytes 4..12  num_bits    (uint64)
    bytes 12..   bitmap      (ceil(num_bits/8) bytes)

Hashing is Kirsch-Mitzenmacher double hashing h1 + i·h2 with both
halves taken from one md5 of the decimal id string salted with the
seed — deterministic across runs, partitions, and Python versions
(builtin ``hash`` is salted per process and MUST NOT be used here).

Note on scale: Spark's own ``might_contain``/BloomFilter aggregate
exists JVM-side, but its serialized layout is private; this module owns
the byte layout so blooms are portable artifacts (writable to parquet,
readable by non-Spark consumers) like the reference's serde bytes.
"""

from __future__ import annotations

import hashlib
import math
import struct
from typing import Iterable, Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_FPR = 0.01  # bloom.rs:46-60 (1% FPR)
DEFAULT_SEED = 42


def _params(n: int, fpr: float) -> tuple:
    """(num_bits, num_hashes) for n items at target FPR."""
    n = max(n, 1)
    m = max(8, int(math.ceil(-n * math.log(fpr) / (math.log(2) ** 2))))
    k = max(1, int(round(m / n * math.log(2))))
    return m, k


def _hash_pair(item, seed: int) -> tuple:
    d = hashlib.md5(f"{seed}:{item}".encode()).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1  # odd → full-period stride
    return h1, h2


def _positions(ids, seed: int, m: int, k: int) -> np.ndarray:
    """(n, k) bit-position matrix for all ids at once — the vectorized
    double-hash kernel shared by build and probe. Only the md5 calls
    remain per-id; stride expansion, modulo, and gather are numpy.

    Exactness note: ``_hash_pair`` computes ``(h1 + i*h2) % m`` in
    arbitrary-precision Python ints; uint64 arithmetic would wrap mod
    2^64 FIRST and land on different bits. Reducing both hashes mod m
    up front is exact — ``(h1 + i*h2) % m == ((h1%m) + i*(h2%m)) % m``
    — and overflow-free: the largest intermediate is < m·k (< 2^40 for
    any realistic bloom)."""
    digests = b"".join(
        hashlib.md5(f"{seed}:{x}".encode()).digest() for x in ids
    )
    dv = np.frombuffer(digests, dtype="<u8").reshape(-1, 2)
    h1 = dv[:, 0] % m
    h2 = (dv[:, 1] | 1) % m
    strides = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + strides[None, :] * h2[:, None]) % m


def bloom_build(ids: Iterable, fpr: float = DEFAULT_FPR, seed: int = DEFAULT_SEED) -> bytes:
    """Driver/worker-side: serialize a bloom over the given ids."""
    ids = list(ids)
    m, k = _params(len(ids), fpr)
    bits = np.zeros((m + 7) // 8, dtype=np.uint8)
    if ids:
        pos = _positions(ids, seed, m, k)
        np.bitwise_or.at(
            bits,
            (pos >> np.uint64(3)).astype(np.int64),
            (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
        )
    return struct.pack("<IQ", k, m) + bits.tobytes()


def bloom_check(blob: Optional[bytes], item, seed: int = DEFAULT_SEED) -> Optional[bool]:
    """Membership test (false positives possible, false negatives never)."""
    if blob is None:
        return None
    k, m = struct.unpack_from("<IQ", blob, 0)
    bits = np.frombuffer(blob, dtype=np.uint8, offset=12)
    h1, h2 = _hash_pair(item, seed)
    for i in range(k):
        pos = (h1 + i * h2) % m
        if not (bits[pos >> 3] >> (pos & 7)) & 1:
            return False
    return True


def array_to_bloom(
    ids_col, fpr: float = DEFAULT_FPR, seed: int = DEFAULT_SEED
) -> Column:
    """Column expr: array<integral> → serialized bloom (BinaryType).
    ``array_to_bloom`` analog (bloom.rs:46-60)."""

    @F.pandas_udf(T.BinaryType())
    def _build(arrs: pd.Series) -> pd.Series:
        return arrs.map(
            lambda a: None if a is None else bloom_build(list(a), fpr, seed)
        )

    c = ids_col if isinstance(ids_col, Column) else F.col(ids_col)
    return _build(c)


def bloom_member_hits(bloom_col, ids_col, seed: int = DEFAULT_SEED) -> Column:
    """Column expr: (bloom binary, array<integral> ids) → long hit count.

    One vectorized probe per row: the serialized bloom crosses into the
    Arrow batch ONCE per term and every member id is checked worker-side
    in a single kernel. This replaces the explode-then-probe shape, which
    duplicated the O(n)-byte bloom onto each of the n exploded rows —
    O(n²) bytes per hot term at scale.
    """

    @F.pandas_udf(T.LongType())
    def _hits(blobs: pd.Series, id_arrs: pd.Series) -> pd.Series:
        out = []
        for blob, ids in zip(blobs, id_arrs):
            if blob is None or ids is None:
                out.append(None)
                continue
            if len(ids) == 0:
                out.append(0)
                continue
            k, m = struct.unpack_from("<IQ", blob, 0)
            bits = np.frombuffer(blob, dtype=np.uint8, offset=12)
            # loop-free probe: (n, k) position matrix, one gather, one
            # all-reduce (only the md5 digests are per-id)
            pos = _positions(list(ids), seed, m, k)
            present = (
                bits[(pos >> np.uint64(3)).astype(np.int64)]
                >> (pos & np.uint64(7)).astype(np.uint8)
            ) & np.uint8(1)
            out.append(int(present.all(axis=1).sum()))
        return pd.Series(out, dtype="object")

    b = bloom_col if isinstance(bloom_col, Column) else F.col(bloom_col)
    i = ids_col if isinstance(ids_col, Column) else F.col(ids_col)
    return _hits(b, i)


def bloom_contains(bloom_col, item_col, seed: int = DEFAULT_SEED) -> Column:
    """Column expr: (bloom binary, id) → boolean membership."""

    @F.pandas_udf(T.BooleanType())
    def _check(blobs: pd.Series, items: pd.Series) -> pd.Series:
        return pd.Series(
            [
                bloom_check(b, x, seed) if b is not None else None
                for b, x in zip(blobs, items)
            ]
        )

    b = bloom_col if isinstance(bloom_col, Column) else F.col(bloom_col)
    i = item_col if isinstance(item_col, Column) else F.col(item_col)
    return _check(b, i)
