"""Vectorized bit kernels for int32-packed binary vectors.

The reference's hamming op class (``dist_hamming_ops``, lantern.sql:
63-104) indexes ``integer[]`` columns whose elements are 32-bit packs —
logical dim = 32 × array length (hnsw.c:308-318). These numpy kernels
give the index builders/searchers the same packed semantics as the
``hamming_dist`` Catalyst expression (functions/distances.py): xor the
words, popcount, sum.

numpy 1.26 has no ``bitwise_count``; popcount goes through the standard
256-entry byte lookup table — one gather + reduce per call, no Python
loop (the same discipline as the bloom probe kernel, operators/bloom).
"""

from __future__ import annotations

import numpy as np

# popcount of every byte value — built once at import
_POPCNT8 = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1
).sum(axis=1).astype(np.int64)


def to_uint32_words(arr) -> np.ndarray:
    """Rows of int32 packs (any int/float dtype holding exact int32
    values, incl. negative two's-complement words) → (n, w) uint32."""
    a = np.asarray(arr)
    if a.dtype.kind == "f":
        a = a.astype(np.int64)
    else:
        a = a.astype(np.int64, copy=False)
    return np.ascontiguousarray((a & 0xFFFFFFFF).astype(np.uint32))


def from_uint32_words(arr) -> np.ndarray:
    """(…, w) uint32 → signed int32 two's-complement values as int64
    (the user-facing ``integer[]`` domain)."""
    a = np.asarray(arr, dtype=np.int64)
    return np.where(a >= 2**31, a - 2**32, a)


def popcount_rows(words: np.ndarray) -> np.ndarray:
    """Per-row popcount of a (n, w) uint32 array → (n,) int64."""
    w = np.ascontiguousarray(words, dtype=np.uint32)
    return _POPCNT8[w.view(np.uint8)].reshape(w.shape[0], -1).sum(axis=1)


def hamming_cdist(x: np.ndarray, q: np.ndarray) -> np.ndarray:
    """All-pairs hamming distances: (n, w) × (m, w) uint32 → (n, m)
    int64. One xor + table gather per probe column — O(n·m·w) byte ops,
    no Python inner loop."""
    x = np.ascontiguousarray(x, dtype=np.uint32)
    q = np.ascontiguousarray(q, dtype=np.uint32)
    out = np.empty((x.shape[0], q.shape[0]), dtype=np.int64)
    for j in range(q.shape[0]):
        out[:, j] = popcount_rows(np.bitwise_xor(x, q[j][None, :]))
    return out
