"""BM25 full-text scoring.

Reference: lantern_extras/src/bm25_agg.rs (the ``bm25_agg`` custom
aggregate + ``bm25_score``) and bm25_api.sql (``create_bm25_table``,
``search_bm25``). Math (bm25_agg.rs:133-151):

    idf(term)  = ln((N − df + 0.5) / (df + 0.5) + 1)          [≥ 0]
    score(t,d) = idf(t) · fq·(k1+1) / (fq + k1·(1 − b + b·len_d/avg_len))
    k1 = 1.2, b = 0.75 (lib.rs:44-45)

where df = number of documents containing the term ("term_freq" in the
reference stats table), fq = occurrences of the term in the doc.

Spark-first design: the reference packs postings into per-term arrays
(doc_ids[], fqs[], doc_lens[]) because Postgres pays per-row overhead;
on Spark the natural 100 TB shape is a NORMALIZED postings DataFrame
``(term, doc_id, fq, doc_len)`` partitioned by term — scoring is then a
broadcast join of (tiny) query terms against postings, a map-side
per-term score expression, and one groupBy(doc_id) shuffle. Exact
scoring handles hot terms natively via the shuffle, so exact search is
the default at any scale (semantics superset).

The reference's bloom approximation tier (bm25_agg.rs:161-216) is ALSO
provided (``search_bm25_approx`` + ``hot_term_blooms``) for behavior
parity: terms with more than ``lantern_extras.bm25_default_
approximation_threshhold`` postings (default 8000, GUC range
5000–100000, lib.rs:46,142-150) are not scored per-posting — each
contributes a CONSTANT score bm25(fq=1, doc_len=avg_doc_len)
(maybe_use_bloom_filter, bm25_agg.rs:162-188) added at finalize to
every candidate in the top limit·10 exact pool whose doc_id passes the
term's bloom (finalize_base, bm25_agg.rs:314-355). Blooms are built at
TABLE BUILD time for hot terms only (bm25_api.sql:55).

Scale notes: postings build = one explode + one groupBy shuffle;
corpus stats = single tiny aggregate, broadcast at query time; query
terms are always broadcast (a query has few terms). Hot-term skew is
handled by AQE skew-join; scores shuffle only (doc_id, partial score).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lantern_spark.functions.text import text_to_stem_array, tokenize
from lantern_spark.types import local_df

BM25_DEFAULT_K1 = 1.2  # lib.rs:44
BM25_DEFAULT_B = 0.75  # lib.rs:45

# lantern_extras.bm25_default_approximation_threshhold (lib.rs:46):
# postings count beyond which a term switches to bloom-approximate
# scoring; the GUC clamps user settings to [5000, 100000]
# (lib.rs:142-150)
BM25_DEFAULT_APPROXIMATION_THRESHOLD = 8000
BM25_APPROXIMATION_THRESHOLD_RANGE = (5000, 100_000)

_approximation_threshold = BM25_DEFAULT_APPROXIMATION_THRESHOLD


def set_bm25_approximation_threshold(value: int) -> None:
    """GUC-setter analog: clamped range [5000, 100000] like the
    reference's DefineCustomIntVariable bounds (lib.rs:142-150)."""
    global _approximation_threshold
    lo, hi = BM25_APPROXIMATION_THRESHOLD_RANGE
    if not (lo <= value <= hi):
        raise ValueError(
            f"bm25 approximation threshold {value} outside GUC range "
            f"[{lo}, {hi}]"
        )
    _approximation_threshold = value


def get_bm25_approximation_threshold() -> int:
    return _approximation_threshold


@dataclass
class BM25Stats:
    """Postings + corpus stats (the <table>_bm25 analog, normalized)."""

    postings: DataFrame  # (term, doc_id, fq, doc_len)
    corpus: DataFrame  # single row: (num_docs, avg_doc_len)

    def term_table(self) -> DataFrame:
        """Reference-shaped per-term arrays table (bm25_api.sql:33-46):
        (term, term_freq, doc_ids_len, doc_ids, fqs, doc_lens)."""
        return (
            self.postings.groupBy("term")
            .agg(
                F.count("doc_id").cast("int").alias("term_freq"),
                F.count("doc_id").cast("int").alias("doc_ids_len"),
                F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", "fq"))
                    ),
                    lambda s: s["fq"],
                ).alias("fqs"),
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", "doc_len"))
                    ),
                    lambda s: s["doc_len"],
                ).alias("doc_lens"),
            )
        )


def build_bm25_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    stem: bool = True,
    tokens_col: Optional[str] = None,
) -> BM25Stats:
    """Build postings + corpus stats (create_bm25_table analog).

    ``stem=True`` uses the full reference pipeline (tokenize → Porter →
    stopword filter); ``stem=False`` uses the pure-expression tokenizer
    (oracle-checkable). ``tokens_col`` lets callers supply pre-computed
    tokens.
    """
    from lantern_spark.types import ensure_parallelism

    df = ensure_parallelism(df)
    if tokens_col is not None:
        toks = df.select(F.col(id_col).alias("doc_id"), F.col(tokens_col).alias("toks"))
    else:
        fn = text_to_stem_array if stem else tokenize
        toks = df.select(
            F.col(id_col).alias("doc_id"), fn(text_col).alias("toks")
        )
    toks = toks.withColumn("doc_len", F.size("toks"))
    postings = (
        toks.select("doc_id", "doc_len", F.explode("toks").alias("term"))
        .groupBy("term", "doc_id", "doc_len")
        .agg(F.count("*").cast("int").alias("fq"))
        .select("term", "doc_id", "fq", "doc_len")
    )
    corpus = toks.agg(
        F.count("*").cast("long").alias("num_docs"),
        F.avg("doc_len").alias("avg_doc_len"),
    )
    return BM25Stats(postings=postings, corpus=corpus)


def build_bm25_stats_materialized(
    df: DataFrame,
    id_col: str,
    text_col: str,
    stem: bool = True,
) -> BM25Stats:
    """:func:`build_bm25_stats` with the postings eagerly materialized
    (lineage cut) and the corpus stats derived WITHOUT a second pass
    over the text (r15, guide §1.2/§1.4):

    - ``num_docs`` / the avg divisor / Σ doc_len ride the postings
      materialization as an :class:`~pyspark.sql.Observation` on the
      tokenized relation (all rows flow through the observe node before
      the explode drops empty docs), so deriving the corpus costs ZERO
      extra jobs;
    - the corpus becomes a driver-local one-row relation — downstream
      ``crossJoin(broadcast(corpus))`` consumers broadcast a
      LocalTableScan (no job) instead of re-running an aggregate.

    Value parity with ``build_bm25_stats``'s own lazy corpus aggregate
    (pinned in tests/test_text.py): Σ size(toks) ≡ Σ doc_len by
    definition, both sums are exact integers ≪ 2^53, num_docs counts
    ALL rows, and the divisor counts only non-NULL-toks rows — the
    final IEEE double division is the same op either way.

    Under ``reliable`` checkpoint mode the observation is not used
    (RDD-checkpoint materialization is not a tracked SQL action) — the
    corpus values fall back to one bounded aggregate over the input
    plus one over the cut postings.
    """
    from pyspark.sql import Observation

    from lantern_spark.plans.lineage import cut_lineage, get_checkpoint_mode
    from lantern_spark.types import ensure_parallelism, local_df

    spark = df.sparkSession
    src = ensure_parallelism(df)
    fn = text_to_stem_array if stem else tokenize
    toksrc = src.select(
        F.col(id_col).alias("doc_id"), fn(text_col).alias("__toks")
    )
    mode, _ = get_checkpoint_mode()
    obs = None
    if mode != "reliable":
        obs = Observation()
        toksrc = toksrc.observe(
            obs,
            F.count(F.lit(1)).alias("nd"),
            F.count("__toks").alias("nl"),
            F.sum(F.size("__toks")).alias("sl"),
        )
    stats = build_bm25_stats(
        toksrc, "doc_id", text_col=None, stem=stem, tokens_col="__toks"
    )
    stats.postings = cut_lineage(stats.postings, eager=True)
    if obs is not None:
        v = obs.get
        n_docs, n_len, sum_len = int(v["nd"]), int(v["nl"]), v["sl"]
    else:
        # non-NULL text ⇔ non-NULL toks (both tokenizers are
        # NULL-preserving and never NULL on non-NULL input) — the same
        # equivalence the pre-r15 count pair relied on
        row = src.agg(
            F.count(F.lit(1)).alias("nd"),
            F.count(F.col(text_col)).alias("nl"),
        ).first()
        n_docs, n_len = int(row["nd"]), int(row["nl"])
        sum_len = stats.postings.agg(F.sum("fq").alias("s")).first()["s"]
        if sum_len is None and n_len:
            # no postings but non-NULL docs exist ⇒ all tokenized
            # empty: Σ doc_len is 0, not NULL
            sum_len = 0
    avg = float(sum_len) / float(n_len) if n_len else None
    stats.corpus = local_df(
        spark, [(n_docs, avg)], "num_docs long, avg_doc_len double"
    )
    return stats


def bm25_score_expr(k1: float = BM25_DEFAULT_K1, b: float = BM25_DEFAULT_B):
    """Per-(term, doc) score column over (fq, doc_len, df, num_docs,
    avg_doc_len) columns. Exact reference math, bm25_agg.rs:139-151."""
    idf = F.log(
        (F.col("num_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("fq") + k1 * (
        1.0 - b + b * (F.col("doc_len") / F.col("avg_doc_len"))
    )
    return idf * (F.col("fq") * (k1 + 1.0)) / denom


def search_bm25(
    stats: BM25Stats,
    query: str,
    limit: int = 10,
    k1: float = BM25_DEFAULT_K1,
    b: float = BM25_DEFAULT_B,
    stem: bool = True,
    round_digits: Optional[int] = None,
) -> DataFrame:
    """Top-``limit`` docs for ``query`` (search_bm25 analog,
    bm25_api.sql:63-106). Returns (doc_id, bm25_score).

    Duplicate query terms count once (the reference's ``term = ANY``
    semantics). Unknown terms contribute nothing (score 0 docs are not
    returned — same as the reference aggregate, which only sees rows of
    matching terms).
    """
    terms = _resolve_terms(query, stem)
    if not terms:
        return (
            stats.postings.select(
                F.col("doc_id"), F.lit(0.0).alias("bm25_score")
            ).limit(0)
        )
    agg = _exact_doc_scores(stats, terms, k1, b)
    if round_digits is not None:
        agg = agg.withColumn("bm25_score", F.round("bm25_score", round_digits))
    return (
        agg.orderBy(F.col("bm25_score").desc(), F.col("doc_id").asc())
        .limit(limit)
    )


def _resolve_terms(query: str, stem: bool) -> list:
    from lantern_spark.functions.text import stem_token_list

    import re

    toks = [t for t in re.split("[^a-z0-9]+", query.lower()) if t]
    return sorted(set(stem_token_list(toks) if stem else toks))


def _exact_doc_scores(stats: BM25Stats, terms, k1, b) -> DataFrame:
    """Per-doc summed exact scores for the given terms: (doc_id,
    bm25_score). Restrict to query terms FIRST, then derive per-term
    doc frequency from the matched rows with a window — a term's
    postings are all matched, so count-over-term here equals the
    reference's term_freq column (bm25_api.sql:36) without a
    full-postings groupBy shuffle."""
    from pyspark.sql import Window

    spark = stats.postings.sparkSession
    qdf = F.broadcast(
        local_df(spark, [(t,) for t in terms], "term string")
    )
    matched = (
        stats.postings.join(qdf, "term")
        .withColumn(
            "df", F.count("*").over(Window.partitionBy("term")).cast("long")
        )
        .crossJoin(F.broadcast(stats.corpus))
    )
    scored = matched.withColumn("term_score", bm25_score_expr(k1, b))
    return scored.groupBy("doc_id").agg(
        F.sum("term_score").alias("bm25_score")
    )


def hot_term_blooms(
    stats: BM25Stats, threshold: Optional[int] = None
) -> DataFrame:
    """(term, df, bloom) for terms with more than ``threshold``
    postings — the build-time bloom column of the reference's _bm25
    table (bm25_api.sql:55: ``SET doc_ids_bloom = array_to_bloom(
    doc_ids) WHERE cardinality(doc_ids) > threshold``). Cold terms get
    no bloom (NULL in the reference; absent rows here).

    Scale shape: two phases so only hot terms materialize their doc_id
    arrays (the reference stores those arrays for EVERY term). A naive
    ``groupBy.agg(count, collect_list).filter`` buffers the full array
    for all the cold millions before discarding them — the HAVING
    filter cannot be pushed below the aggregate — so phase 1 aggregates
    COUNTS only, and phase 2 collect_lists over the postings
    semi-joined to the (by definition few) hot terms."""
    from lantern_spark.operators.bloom import array_to_bloom

    thr = _approximation_threshold if threshold is None else threshold
    hot_terms = (
        stats.postings.groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
        .filter(F.col("df") > thr)
    )
    return (
        stats.postings.join(F.broadcast(hot_terms), "term")
        .groupBy("term", "df")
        .agg(F.collect_list("doc_id").alias("__doc_ids"))
        .select("term", "df", array_to_bloom("__doc_ids").alias("bloom"))
    )


def _approx_term_score_expr(k1: float, b: float):
    """The constant score a hot term contributes to any bloom-passing
    doc: bm25 with fq=1 and doc_len=avg_doc_len (maybe_use_bloom_filter,
    bm25_agg.rs:174-184). With doc_len/avg_doc_len = 1 the denominator
    is 1+k1, so the constant reduces to idf(term) — kept in full form
    for k1/b readability."""
    idf = F.log(
        (F.col("num_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    return idf * (1.0 * (k1 + 1.0)) / (1.0 + k1 * (1.0 - b + b * 1.0))


def search_bm25_approx(
    stats: BM25Stats,
    query: str,
    limit: int = 10,
    k1: float = BM25_DEFAULT_K1,
    b: float = BM25_DEFAULT_B,
    stem: bool = True,
    threshold: Optional[int] = None,
    blooms: Optional[DataFrame] = None,
    round_digits: Optional[int] = None,
) -> DataFrame:
    """search_bm25 with the reference's hot-term approximation tier
    (bm25_agg.rs:161-216 + finalize_base:314-355):

    - query terms with ≤ threshold postings score EXACTLY;
    - hotter terms contribute a constant bm25(fq=1, doc_len=avg_doc_len)
      to each candidate doc whose id passes the term's bloom;
    - candidates are the top ``limit·10`` docs by exact partial score
      (the reference's bloom_limit heap), then constants are blended,
      re-sorted, truncated to ``limit``.

    Guard parity (bm25_agg.rs:205-213: approximation only engages once
    exact postings have produced a candidate baseline): when NO query
    term is cold, or none is hot, scoring falls back to fully exact.

    ``blooms``: the persisted build-time ``hot_term_blooms`` table; when
    omitted it is derived on the fly (correct, but at scale pass the
    prebuilt one — the reference builds blooms at create_bm25_table
    time, bm25_api.sql:55).
    """
    thr = _approximation_threshold if threshold is None else threshold
    terms = _resolve_terms(query, stem)
    if not terms:
        return (
            stats.postings.select(
                F.col("doc_id"), F.lit(0.0).alias("bm25_score")
            ).limit(0)
        )
    spark = stats.postings.sparkSession
    qdf = F.broadcast(
        local_df(spark, [(t,) for t in terms], "term string")
    )
    # per-term posting counts: one tiny job over the matched slice
    dfs = {
        r["term"]: r["df"]
        for r in stats.postings.join(qdf, "term")
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
        .collect()
    }
    hot = sorted(t for t, d in dfs.items() if d > thr)
    cold = sorted(t for t, d in dfs.items() if d <= thr)
    if not hot or not cold:
        # tier inactive (nothing hot) or no exact baseline (all hot) —
        # exact scoring both ways (the reference likewise scores
        # exactly until a baseline of collected postings exists)
        return search_bm25(
            stats, query, limit=limit, k1=k1, b=b, stem=stem,
            round_digits=round_digits,
        )
    candidates = (
        _exact_doc_scores(stats, cold, k1, b)
        .orderBy(F.col("bm25_score").desc(), F.col("doc_id").asc())
        .limit(limit * 10)  # bloom_limit = limit·10, finalize_base:314
    )
    caller_blooms = blooms is not None
    if blooms is None:
        # derive blooms for the QUERY's hot terms only — postings are
        # pre-filtered to them, so one query never pays for
        # materializing every corpus-wide hot term's doc_id array
        # (prebuilt blooms remain the at-scale path, bm25_api.sql:55)
        hdf = F.broadcast(
            local_df(spark, [(t,) for t in hot], "term string")
        )
        blooms = hot_term_blooms(
            BM25Stats(
                postings=stats.postings.join(hdf, "term"),
                corpus=stats.corpus,
            ),
            thr,
        )
    # membership in the CURRENT hot set decides which terms get the
    # approximation — not the df column persisted in the blooms table:
    # a term that cooled since the blooms were built already scores
    # exactly in `cold`, and filtering by its STALE df would add its
    # bloom bonus on top (double count). The current df replaces the
    # stored one for the score constant.
    hot_df_counts = F.broadcast(
        local_df(spark, [(t, dfs[t]) for t in hot], "term string, df long")
    )
    qblooms = blooms.drop("df").join(hot_df_counts, "term").select(
        "term", "df", "bloom"
    )
    if caller_blooms:
        # a caller-supplied blooms table may not cover every
        # currently-hot term (built under a different threshold, or
        # before the corpus grew): a hot term with no bloom row would
        # otherwise silently lose its bonus — and if NO hot term had a
        # row, the crossJoin below would return an EMPTY result
        # instead of the exact candidates. Derive just the missing
        # terms' blooms on the fly (postings pre-filtered to those
        # terms — bounded work). Internally-derived blooms cover every
        # hot term by construction, so the check is skipped.
        present = {r["term"] for r in qblooms.select("term").collect()}
        missing = [t for t in hot if t not in present]
        if missing:
            mdf = F.broadcast(
                local_df(spark, [(t,) for t in missing], "term string")
            )
            derived = hot_term_blooms(
                BM25Stats(
                    postings=stats.postings.join(mdf, "term"),
                    corpus=stats.corpus,
                ),
                thr,
            ).select("term", "df", "bloom")
            qblooms = qblooms.unionByName(derived)
    hot_df = (
        qblooms.crossJoin(F.broadcast(stats.corpus))
        .withColumn("approx_score", _approx_term_score_expr(k1, b))
        .select("term", "bloom", "approx_score")
    )
    from lantern_spark.operators.bloom import bloom_contains

    blended = (
        candidates.crossJoin(F.broadcast(hot_df))
        .withColumn("__hit", bloom_contains("bloom", "doc_id"))
        .groupBy("doc_id", "bm25_score")
        .agg(
            F.sum(
                F.when(F.col("__hit"), F.col("approx_score")).otherwise(0.0)
            ).alias("__bonus")
        )
        .select(
            "doc_id",
            (F.col("bm25_score") + F.col("__bonus")).alias("bm25_score"),
        )
    )
    if round_digits is not None:
        blended = blended.withColumn(
            "bm25_score", F.round("bm25_score", round_digits)
        )
    return blended.orderBy(
        F.col("bm25_score").desc(), F.col("doc_id").asc()
    ).limit(limit)


def merge_bm25_stats(a: BM25Stats, b: BM25Stats) -> BM25Stats:
    """Fold two stats builds into one (consolidate_bm25_table analog,
    bm25_api.sql:110-159 — the reference merges duplicate term rows
    created by incremental inserts; with normalized postings the merge
    is a union + one groupBy re-sum).

    A doc present in both inputs (re-indexed) keeps summed frequencies —
    callers replacing docs should anti-join the old postings out first.
    """
    postings = (
        a.postings.unionByName(b.postings)
        .groupBy("term", "doc_id", "doc_len")
        .agg(F.sum("fq").cast("int").alias("fq"))
        .select("term", "doc_id", "fq", "doc_len")
    )
    ca, cb = a.corpus, b.corpus
    corpus = (
        ca.unionByName(cb)
        .agg(
            F.sum("num_docs").cast("long").alias("num_docs"),
            (
                F.sum(F.col("avg_doc_len") * F.col("num_docs"))
                / F.sum("num_docs")
            ).alias("avg_doc_len"),
        )
    )
    return BM25Stats(postings=postings, corpus=corpus)


def bm25_score_one(
    stats: BM25Stats, document_tokens, query_terms, k1=BM25_DEFAULT_K1, b=BM25_DEFAULT_B
) -> float:
    """Driver-side helper scoring one doc against query terms using
    corpus stats (bm25_score analog, bm25_agg.rs:61-122). Test aid."""
    corpus = stats.corpus.first()
    n, avg = corpus["num_docs"], corpus["avg_doc_len"]
    dfs = {
        r["term"]: r["df"]
        for r in stats.postings.groupBy("term")
        .agg(F.count("*").alias("df"))
        .filter(F.col("term").isin(list(set(query_terms))))
        .collect()
    }
    doc_len = len(document_tokens)
    score = 0.0
    for t in set(query_terms):
        if t not in dfs:
            continue
        fq = sum(1 for x in document_tokens if x == t)
        if fq == 0:
            continue
        idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
        score += idf * fq * (k1 + 1.0) / (fq + k1 * (1 - b + b * doc_len / avg))
    return score
