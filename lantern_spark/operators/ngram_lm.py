"""Stupid-backoff n-gram language model — perplexity quality filtering.

The standard pretraining corpus filter (the CCNet recipe) scores every
document's perplexity under a reference-domain language model and drops
the worst tail. Stupid backoff (Brants et al. 2007, "Large Language
Models in Machine Translation") is the published variant DESIGNED for
MapReduce-scale corpora:

    S(w | ctx)  =  count(ctx·w) / count(ctx)        if count(ctx·w) > 0
                =  alpha · S(w | shorter ctx)        otherwise
    S(w)        =  count(w) / N

No discounting and no normalization means TRAINING IS NOTHING BUT
COUNTING — here one explode + one groupBy over all orders at once —
and the model is a counts DataFrame that never leaves the cluster.
SCORING is pure joins: each token position looks up its n-gram, its
context, and every backoff suffix (2n−1 keys), one left join per key
against the counts table, then a coalesce cascade evaluates the
backoff — no UDFs anywhere, the whole pipeline is Catalyst exprs +
shuffle joins, exactly the shape a 100 TB scoring pass needs.

Sentence framing: each document is one sequence wrapped in n−1 ``<s>``
markers and one ``</s>`` (the standard framing); scored positions are
the real tokens plus ``</s>``.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from lantern_spark.functions.text import tokenize

BOS = "<s>"
EOS = "</s>"
DEFAULT_ALPHA = 0.4  # the Brants et al. backoff constant


def _framed_tokens(text_col, n: int) -> Column:
    pad = F.array(*[F.lit(BOS)] * (n - 1))
    return F.concat(pad, tokenize(text_col), F.array(F.lit(EOS)))


def _grams_expr(toks_col: str, k: int) -> Column:
    """All order-k grams of an array<string> column as space-joined
    strings — the shared windowing kernel (functions/text.ngram_windows,
    whose guard returns an EMPTY array for NULL/short inputs; the
    previous ``greatest(size-k+1, 0)`` bound let NULL token arrays
    emit junk [1, 0]-descending windows into the counts table)."""
    from lantern_spark.functions.text import ngram_windows

    return ngram_windows(F.col(toks_col), k)


class NGramLM:
    """Handle over persisted (order, gram, c) counts + corpus total."""

    def __init__(
        self, path: str, n: int, total_tokens: int, alpha: float
    ):
        self.path = path
        self.n = int(n)
        self.total_tokens = int(total_tokens)
        self.alpha = float(alpha)

    # -- persistence -----------------------------------------------------

    def _meta(self) -> dict:
        return {
            "format_version": "1.1",
            "n": self.n,
            "total_tokens": self.total_tokens,
            "alpha": self.alpha,
        }

    @classmethod
    def load(cls, path: str) -> "NGramLM":
        import json

        from lantern_spark.types import check_format_version

        with open(os.path.join(path, "lm_meta.json")) as fh:
            d = json.load(fh)
        check_format_version(d.get("format_version", "1.0"), path)
        return cls(path, d["n"], d["total_tokens"], d["alpha"])

    def counts(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.path, "counts"))

    # -- scoring ---------------------------------------------------------

    def score_docs(
        self,
        df: DataFrame,
        text_col: str,
        id_col: str,
        logprob_col: str = "logprob",
        ppl_col: str = "ppl",
    ) -> DataFrame:
        """(id, n_scored, logprob, ppl) per document.

        One explode to token positions, 2n−1 left joins against the
        counts table (each on the (order, gram) key — shuffle joins,
        the corpus-scale shape; Catalyst broadcasts automatically when
        the model is small), a coalesce cascade for the backoff, one
        groupBy back to documents. log10, as in the source papers;
        ppl = 10^(−logprob / n_scored)."""
        spark = df.sparkSession
        n = self.n
        toks = _framed_tokens(text_col, n).alias("__toks")
        base = df.select(F.col(id_col), toks)
        # one row per SCORED position p (0-based over real tokens+EOS);
        # the framed index of the scored token is p + n - 1
        pos = base.select(
            id_col,
            F.col("__toks"),
            F.explode(
                F.expr(f"sequence(0, size(__toks) - {n})")
            ).alias("__p"),
        )
        # gram keys for every backoff level: order k uses the k-gram
        # ENDING at the scored token; its context is the (k-1)-gram
        # before it (context of order-1 is the corpus total)
        sel = [F.col(id_col), F.col("__p")]
        for k in range(1, n + 1):
            start = f"__p + {n - k + 1}"  # 1-based slice start
            sel.append(
                F.expr(
                    f"array_join(slice(__toks, {start}, {k}), ' ')"
                ).alias(f"__g{k}")
            )
            if k >= 2:
                sel.append(
                    F.expr(
                        f"array_join(slice(__toks, {start}, {k - 1}), ' ')"
                    ).alias(f"__ctx{k}")
                )
        keyed = pos.select(*sel)
        counts = self.counts(spark)
        joined = keyed
        for k in range(1, n + 1):
            c = counts.where(F.col("order") == k).select(
                F.col("gram").alias(f"__g{k}"),
                F.col("c").alias(f"__c{k}"),
            )
            joined = joined.join(c, f"__g{k}", "left")
            if k >= 2:
                cc = counts.where(F.col("order") == k - 1).select(
                    F.col("gram").alias(f"__ctx{k}"),
                    F.col("c").alias(f"__cc{k}"),
                )
                joined = joined.join(cc, f"__ctx{k}", "left")
        # backoff cascade, highest order first:
        # S_k = c_k / cc_k when c_k seen, else alpha * S_{k-1}
        score = F.col("__c1").cast("double") / F.lit(
            float(self.total_tokens)
        )
        score = F.coalesce(score, F.lit(0.0))  # OOV unigram → 0
        for k in range(2, n + 1):
            score = F.when(
                F.col(f"__c{k}").isNotNull(),
                F.col(f"__c{k}").cast("double")
                / F.col(f"__cc{k}").cast("double"),
            ).otherwise(F.lit(self.alpha) * score)
        # floor: an OOV token would otherwise zero the whole product;
        # use 1/(10·N) — below any seen unigram, standard OOV handling
        floor = 1.0 / (10.0 * max(self.total_tokens, 1))
        lp = F.log10(F.greatest(score, F.lit(floor)))
        return (
            joined.select(id_col, lp.alias("__lp"))
            .groupBy(id_col)
            .agg(
                F.count("*").alias("n_scored"),
                F.sum("__lp").alias(logprob_col),
            )
            .withColumn(
                ppl_col,
                F.pow(
                    F.lit(10.0),
                    -F.col(logprob_col) / F.col("n_scored"),
                ),
            )
        )

    def perplexity_filter(
        self,
        df: DataFrame,
        text_col: str,
        id_col: str,
        max_ppl: float,
        keep_unscored: bool = False,
    ) -> DataFrame:
        """Keep documents under the perplexity ceiling (the CCNet
        keep-the-head filter); returns df's columns + ppl.

        Contract: a document with NULL ``text_col`` has no scoreable
        positions and receives no perplexity. By default such rows are
        DROPPED regardless of the ceiling (unscoreable ≠ in-domain).
        ``keep_unscored=True`` switches to a left join that passes
        them through with ``ppl`` NULL — for pipelines where NULL text
        means "not applicable" rather than "junk" (ADVICE r6: the
        silent drop surprised curate_corpus callers)."""
        scored = self.score_docs(df, text_col, id_col).select(
            id_col, "ppl"
        )
        if keep_unscored:
            return df.join(scored, id_col, "left").where(
                F.col("ppl").isNull() | (F.col("ppl") <= max_ppl)
            )
        return df.join(scored, id_col).where(F.col("ppl") <= max_ppl)


def train_ngram_lm(
    df: DataFrame,
    text_col: str,
    path: str,
    n: int = 3,
    alpha: float = DEFAULT_ALPHA,
    min_count: int = 1,
) -> NGramLM:
    """Count all gram orders 1..n in ONE explode + ONE groupBy and
    persist (order, gram, c) to parquet. ``min_count`` optionally
    prunes singleton grams (count pruning — the standard size lever at
    scale; stupid backoff degrades gracefully under it, Brants §4)."""
    toks = _framed_tokens(text_col, n).alias("__toks")
    per_order = [
        df.select(toks).select(
            F.lit(k).alias("order"),
            F.explode(_grams_expr("__toks", k)).alias("gram"),
        )
        for k in range(1, n + 1)
    ]
    grams = per_order[0]
    for g in per_order[1:]:
        grams = grams.unionByName(g)
    counts = (
        grams.groupBy("order", "gram")
        .agg(F.count("*").cast("long").alias("c"))
        .where(F.col("c") >= int(min_count))
    )
    counts.write.mode("overwrite").parquet(os.path.join(path, "counts"))
    spark = df.sparkSession
    # corpus total = scored-position unigram mass (real tokens + EOS;
    # BOS markers are context-only and excluded from the denominator)
    total = (
        spark.read.parquet(os.path.join(path, "counts"))
        .where((F.col("order") == 1) & (F.col("gram") != BOS))
        .agg(F.sum("c"))
        .first()[0]
        or 0
    )
    lm = NGramLM(path, n, int(total), float(alpha))
    import json

    with open(os.path.join(path, "lm_meta.json"), "w") as fh:
        json.dump(lm._meta(), fh)
    return lm


def ppl_buckets(
    df: DataFrame,
    ppl_col: str = "ppl",
    cuts: Sequence[float] = (1.0 / 3.0, 2.0 / 3.0),
    labels: Sequence[str] = ("head", "middle", "tail"),
    group_col: Optional[str] = None,
    accuracy: int = 10000,
) -> DataFrame:
    """CCNet's signature mechanism (Wenzek et al. 2020 §4.3): rank
    documents by LM perplexity and cut the corpus into HEAD (lowest
    ppl — most Wikipedia-like), MIDDLE, TAIL buckets at the given
    quantile ``cuts``, per ``group_col`` (CCNet buckets per LANGUAGE —
    a ppl of 500 is head-grade for one language and tail-grade for
    another). Downstream, the bucket column drops straight into
    :func:`~lantern_spark.operators.pack.mixture_sample` /
    ``sample_to_token_budget`` as the source key — "train on head +
    half of middle" is then one budget dict.

    Plan shape: cutoffs come from ONE ``percentile_approx`` aggregate
    (n_groups rows to the driver, same contract as
    ``rates_for_token_budgets``), join back via broadcast, bucket
    assignment is a when-chain — map-only over the corpus. Rows with
    NULL perplexity get a NULL bucket (unscoreable ≠ any quality
    grade; filter or coalesce downstream by policy).
    """
    if len(labels) != len(cuts) + 1:
        raise ValueError(
            f"need len(cuts)+1 labels, got {len(labels)} labels for "
            f"{len(cuts)} cuts"
        )
    spark = df.sparkSession
    p = F.col(ppl_col)
    pct = F.percentile_approx(
        p, F.array(*[F.lit(float(c)) for c in cuts]), F.lit(int(accuracy))
    )
    if group_col is None:
        row = df.agg(pct.alias("__cuts")).first()
        cut_rows = [(None, row["__cuts"])]
    else:
        cut_rows = [
            (r[group_col], r["__cuts"])
            for r in df.groupBy(group_col).agg(pct.alias("__cuts")).collect()
        ]
    # broadcast the per-group cutoff vectors back
    if group_col is None:
        cvals = cut_rows[0][1] or []
        out = df
        for i, _ in enumerate(cuts):
            out = out.withColumn(f"__c{i}", F.lit(float(cvals[i])) if cvals else F.lit(None).cast("double"))
    else:
        # preserve the group key's TYPE and NULL identity: stringifying
        # a NULL key as 'None' (review finding) both orphans NULL-group
        # rows (equi-join never matches NULL → their cutoffs are lost
        # and scored rows fall to the last label) and collides with a
        # real group literally named 'None'. NULL-safe join instead.
        from pyspark.sql import types as _T

        gtype = df.schema[group_col].dataType
        schema = _T.StructType(
            [
                _T.StructField("__g", gtype),
                _T.StructField("__cuts", _T.ArrayType(_T.DoubleType())),
            ]
        )
        from lantern_spark.types import local_df

        cdf = F.broadcast(
            local_df(
                spark,
                [(g, list(c) if c else None) for g, c in cut_rows],
                schema,
            )
        )
        out = df.join(
            cdf, F.col(group_col).eqNullSafe(F.col("__g")), "left"
        ).drop("__g")
        for i, _ in enumerate(cuts):
            out = out.withColumn(f"__c{i}", F.element_at("__cuts", i + 1))
        out = out.drop("__cuts")
    bucket = F.when(p.isNull(), F.lit(None).cast("string"))
    for i, lab in enumerate(labels[:-1]):
        bucket = bucket.when(p <= F.col(f"__c{i}"), F.lit(lab))
    bucket = bucket.otherwise(F.lit(labels[-1]))
    return out.withColumn("ppl_bucket", bucket).drop(
        *[f"__c{i}" for i in range(len(cuts))]
    )
