"""MIPS → cosine reduction: serve inner-product search from ANY cos index.

Neyshabur & Srebro, "On Symmetric and Asymmetric LSH for Inner Product
Search" (ICML 2015) — the augmentation that turns maximum-inner-product
search into cosine search EXACTLY:

    x' = [x ; sqrt(M² − ‖x‖²)]        (M = max corpus norm)
    q' = [q ; 0]

Every augmented document has norm exactly M, so

    cos(q', x') = ⟨q, x⟩ / (‖q‖·M)

is a strictly monotone function of the raw inner product — the cosine
top-k over augmented vectors IS the MIPS top-k, not an approximation.
That one pure-expression transform puts the ENTIRE existing cosine
stack behind inner-product retrieval: exact KNN, IVF partition
pruning, IVF-PQ ADC, per-shard HNSW, the router — nothing downstream
changes.

Spark shape (100 TB): the augmentation is one scan (an agg for M, then
a map-only column expr; M can also be passed in when known — e.g. the
streaming case pins it at build time). The extra dimension costs
1/dim of vector bytes. Rows with ‖x‖ > M (late data after a pinned M)
would need an imaginary pad — ``mips_augment`` CLAMPS the pad at 0 for
them and such rows then rank by ⟨q, x⟩/‖x‖·(‖x‖/M) ≥ their true
position... they can only rank HIGHER than warranted, never vanish;
re-pin M and rebuild when that matters (documented operational note,
the same "1% delta" maintenance discipline as the index families).

Composes with operators/anisotropic (APQ codes over augmented vectors
give score-aware MIPS at PQ code size) and operators/chunk (chunk →
embed → augment → cos-index is the RAG MIPS serving stack).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["max_norm", "mips_augment", "mips_query", "mips_knn"]


def _norm2(col):
    return F.aggregate(
        F.col(col) if isinstance(col, str) else col,
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )


def max_norm(df: DataFrame, column: str) -> float:
    """Max vector L2 norm over the corpus — one aggregate scan."""
    row = df.select(
        F.sqrt(F.max(_norm2(column))).alias("m")
    ).first()
    return float(row["m"] or 0.0)


def mips_augment(
    df: DataFrame,
    column: str,
    m: Optional[float] = None,
    out_col: Optional[str] = None,
) -> DataFrame:
    """Append the augmented vector ``[x ; sqrt(M² − ‖x‖²)]`` (norm
    exactly M for every row). ``m=None`` computes the corpus max norm
    first (one agg job); pass a pinned M for incremental corpora.
    Pure column expressions — map-only. NULL vectors stay NULL; rows
    with ‖x‖ > a pinned M clamp the pad at 0 (see module docstring)."""
    out_col = out_col or f"{column}_mips"
    if m is None:
        m = max_norm(df, column)
    pad = F.sqrt(F.greatest(F.lit(float(m) * float(m)) - _norm2(column), F.lit(0.0)))
    aug = F.concat(
        F.transform(F.col(column), lambda x: x.cast("double")),
        F.array(pad),
    )
    return df.withColumn(
        out_col, F.when(F.col(column).isNotNull(), aug)
    )


def mips_query(query: Sequence[float]) -> list:
    """The matching query augmentation ``[q ; 0]``."""
    return [float(v) for v in query] + [0.0]


def mips_knn(
    df: DataFrame,
    column: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
    m: Optional[float] = None,
) -> DataFrame:
    """Exact MIPS top-k via the reduction: augment → cos top-k →
    report the RAW inner product (computed on the original column —
    the caller-facing score). The ranking scan is ONE pass ending in
    ``TakeOrderedAndProject``; with ``m=None`` it is preceded by
    :func:`max_norm`'s full aggregate scan, and every call re-augments
    — TWO jobs per query on the exact path. For repeated queries pass
    a pinned ``m`` (one job), or better: persist ``mips_augment``'s
    column once and build any cos-metric index over it; search with
    ``mips_query(q)`` — the reduction is exact, so every downstream
    recall/routing contract carries over unchanged."""
    from lantern_spark.functions.distances import cos_dist, inner_dist
    from lantern_spark.functions.vectors import vec_lit

    aug = mips_augment(df, column, m=m)
    qa = vec_lit(mips_query(query))
    return (
        aug.where(F.col(f"{column}_mips").isNotNull())
        .withColumn("cos_d", cos_dist(f"{column}_mips", qa))
        .withColumn(
            "ip_score",
            -inner_dist(
                column,
                vec_lit([float(v) for v in query]),
            ),
        )
        .orderBy("cos_d", id_col)
        .limit(k)
        .select(id_col, "ip_score")
    )
