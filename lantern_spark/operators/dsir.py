"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169).

The modern model-free data-selection op: score every raw document by
how much more likely its hashed-n-gram profile is under a TARGET
distribution (e.g. Wikipedia/books) than under the RAW distribution,
then resample proportionally to the importance weight. Used to pick
pretraining subsets that match a downstream domain without training a
classifier.

Spark-first mapping — every step is a standard relational shape:

1. featurize: tokens + bigrams (Catalyst exprs, shared with
   quality_clf) hashed into ``n_buckets`` via md5 (engine-portable,
   the repo's hash convention — never JVM-private hashes);
2. fit: one explode + groupBy count per corpus → two (bucket, count)
   tables; Laplace-smoothed log-probs need only the two scalar totals;
3. weight: explode raw docs to buckets, ONE broadcast join against
   the O(n_buckets) log-ratio table, groupBy doc sum — the weight of
   doc d is  log w(d) = Σ_b c_d(b)·(log p_target(b) − log p_raw(b));
4. select: Gumbel-top-k resampling (the paper's sampler) with
   md5-derived Gumbel noise — deterministic/retry-safe like every
   sampler in this repo (pack.py convention: never rand()).

Scale (100 TB): the log-ratio table is ~n_buckets rows (default 10k —
kilobytes) and broadcasts; raw text shuffles ONCE (the per-doc
groupBy sum); selection is a TakeOrdered top-k. No Python UDFs.
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lantern_spark.operators.quality_clf import _terms_expr

DEFAULT_BUCKETS = 10_000


def _bucket_expr(term: Column, n_buckets: int) -> Column:
    """Deterministic term→bucket hash: first 12 md5 hex chars → int,
    mod n_buckets. Engine-portable (any oracle replays it in SQL)."""
    return (
        F.conv(F.substring(F.md5(term), 1, 12), 16, 10).cast("long")
        % int(n_buckets)
    )


def _gumbel_expr(col: Column) -> Column:
    """Deterministic standard-Gumbel noise from md5(value): u ∈ (0,1)
    via 48 hex-derived bits (+0.5 keeps u strictly interior), then
    −log(−log u)."""
    u = (
        F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(16 ** 12))
    return -F.log(-F.log(u))


def bucket_counts(
    df: DataFrame,
    text_col: str,
    n_buckets: int = DEFAULT_BUCKETS,
    use_bigrams: bool = True,
) -> DataFrame:
    """(bucket, count) over the whole corpus — one explode + groupBy."""
    return (
        df.select(
            F.explode(_terms_expr(text_col, use_bigrams)).alias("__term")
        )
        .select(_bucket_expr(F.col("__term"), n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("count"))
    )


def log_ratio_table(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(bucket, log_ratio) with Laplace smoothing. The two totals are
    the only values that touch the driver.

    A sentinel row ``bucket = -1`` (real buckets are ≥ 0) carries the
    smoothed FLOOR log((r_tot+n)/(t_tot+n)) for buckets unseen in
    either corpus at fit time — :func:`importance_weights` applies it
    to novel terms, so a table precomputed once stays correct when the
    raw corpus later grows new vocabulary (review r7 #6: an inner
    join silently scored such terms 0 instead of the floor)."""
    spark = target_counts.sparkSession
    t_tot = target_counts.agg(F.sum("count")).first()[0] or 0
    r_tot = raw_counts.agg(F.sum("count")).first()[0] or 0
    t_denom = math.log(float(t_tot + n_buckets))
    r_denom = math.log(float(r_tot + n_buckets))
    j = (
        target_counts.withColumnRenamed("count", "tc")
        .join(
            raw_counts.withColumnRenamed("count", "rc"),
            on="bucket",
            how="full_outer",
        )
        .select(
            "bucket",
            (
                F.log(F.coalesce(F.col("tc"), F.lit(0)) + F.lit(1.0))
                - F.lit(t_denom)
                - F.log(F.coalesce(F.col("rc"), F.lit(0)) + F.lit(1.0))
                + F.lit(r_denom)
            ).alias("log_ratio"),
        )
    )
    from lantern_spark.types import local_df

    floor = local_df(
        spark, [(-1, r_denom - t_denom)], "bucket long, log_ratio double"
    )
    return j.unionByName(floor)


def importance_weights(
    raw_df: DataFrame,
    text_col: str,
    id_col: str,
    ratios: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    use_bigrams: bool = True,
) -> DataFrame:
    """Per-document log importance weight: Σ_b c_d(b)·log_ratio(b).
    Docs with no features (empty/NULL text) get log_w = 0 — the
    neutral weight of an uninformative document. Terms hashing to a
    bucket absent from ``ratios`` (novel vocabulary when the table
    was precomputed on an earlier corpus) score the table's smoothed
    floor (sentinel row, see :func:`log_ratio_table`), not 0."""
    floor_rows = ratios.filter(F.col("bucket") == -1).collect()
    floor = float(floor_rows[0]["log_ratio"]) if floor_rows else 0.0
    exploded = raw_df.select(
        F.col(id_col),
        F.explode(_terms_expr(text_col, use_bigrams)).alias("__term"),
    ).select(
        id_col, _bucket_expr(F.col("__term"), n_buckets).alias("bucket")
    )
    per_doc = (
        exploded.join(
            F.broadcast(ratios.filter(F.col("bucket") >= 0)),
            "bucket",
            "left",
        )
        .groupBy(id_col)
        .agg(
            F.sum(
                F.coalesce(F.col("log_ratio"), F.lit(floor))
            ).alias("log_w")
        )
    )
    return raw_df.select(id_col).join(per_doc, id_col, "left").select(
        id_col, F.coalesce("log_w", F.lit(0.0)).alias("log_w")
    )


def dsir_select(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    n_buckets: int = DEFAULT_BUCKETS,
    use_bigrams: bool = True,
    mode: str = "gumbel",
    seed: int = 42,
    ratios: Optional[DataFrame] = None,
) -> DataFrame:
    """Select ``k`` raw documents whose n-gram profile matches the
    target corpus. ``mode='gumbel'`` is the paper's importance
    RESAMPLING (sample ∝ w without replacement via Gumbel-top-k,
    deterministic md5 noise keyed on (id, seed)); ``mode='topk'`` is
    the deterministic highest-weight head. Returns the selected rows
    of ``raw_df`` with ``log_w`` (and ``gumbel_key`` for the sampler)
    appended.

    Pass a precomputed ``ratios`` table to amortize the fit across
    many selection calls (the fit reads BOTH corpora; selection reads
    only raw)."""
    if mode not in ("gumbel", "topk"):
        raise ValueError(f"mode must be 'gumbel' or 'topk', got {mode!r}")
    if ratios is None:
        ratios = log_ratio_table(
            bucket_counts(target_df, text_col, n_buckets, use_bigrams),
            bucket_counts(raw_df, text_col, n_buckets, use_bigrams),
            n_buckets,
        )
    w = importance_weights(
        raw_df, text_col, id_col, ratios, n_buckets, use_bigrams
    )
    if mode == "topk":
        picked = w.orderBy(F.desc("log_w"), F.col(id_col)).limit(int(k))
    else:
        key = F.col("log_w") + _gumbel_expr(
            F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))
        )
        picked = (
            w.withColumn("gumbel_key", key)
            .orderBy(F.desc("gumbel_key"), F.col(id_col))
            .limit(int(k))
        )
    return raw_df.join(picked, id_col)
