"""Hybrid search: reciprocal-rank fusion of ranked result lists.

The reference exposes text search (BM25) and vector search side by
side (http_server/search.rs accepts query_text OR query_vector);
production users fuse them. RRF (Cormack et al., SIGIR 2009) is the
standard scoreless fusion: rrf(d) = Σ_lists 1/(k0 + rank_list(d)).

Deterministic given deterministic input rankings → oracle-checkable.

Scale notes: each input is already a top-N DataFrame (tiny); ranking
uses a single-partition window over ≤N rows per list, the fused union
is ≤ Σ N rows — driver-scale data, no large shuffle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K = 60  # the constant from the RRF paper; reciprocal_rank default


def rrf_fuse(
    ranked: Sequence[DataFrame],
    id_col: str,
    order_cols: Sequence[str],
    k: int = 10,
    k0: int = RRF_K,
    ascending: Sequence[bool] = (),
) -> DataFrame:
    """Fuse result lists by reciprocal rank.

    ``ranked[i]`` is a DataFrame with ``id_col`` and ``order_cols[i]``
    (its score column); ``ascending[i]`` says whether smaller is better
    (distances) or larger (bm25). Ties inside a list break by id so the
    fusion is deterministic. Returns (id, rrf_score) top-k, score
    descending, id ascending.
    """
    if not ranked:
        raise ValueError("at least one ranked input required")
    asc = list(ascending) or [True] * len(ranked)
    parts = []
    for df, col, a in zip(ranked, order_cols, asc):
        order = [
            F.col(col).asc() if a else F.col(col).desc(),
            F.col(id_col).asc(),
        ]
        w = Window.orderBy(*order)
        parts.append(
            df.select(
                F.col(id_col),
                (1.0 / (k0 + F.row_number().over(w))).alias("__rrf"),
            )
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    return (
        allp.groupBy(id_col)
        .agg(F.sum("__rrf").alias("rrf_score"))
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(k)
    )
