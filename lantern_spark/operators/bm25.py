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
per-term score expression, and one groupBy(doc_id) shuffle. The
bloom-filter approximation tier (bm25_agg.rs:161-216, threshold 8000
postings) exists because Postgres must materialize giant arrays per
term; Spark's shuffle handles hot terms natively, so the approximation
is unnecessary — exact scores at any scale (semantics superset).

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

BM25_DEFAULT_K1 = 1.2  # lib.rs:44
BM25_DEFAULT_B = 0.75  # lib.rs:45


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
    from lantern_spark.functions.text import stem_token_list

    spark = stats.postings.sparkSession
    toks = [
        t
        for t in __import__("re").split("[^a-z0-9]+", query.lower())
        if t
    ]
    if stem:
        terms = sorted(set(stem_token_list(toks)))
    else:
        terms = sorted(set(toks))
    if not terms:
        return (
            stats.postings.select(
                F.col("doc_id"), F.lit(0.0).alias("bm25_score")
            ).limit(0)
        )

    qdf = F.broadcast(
        spark.createDataFrame([(t,) for t in terms], "term string")
    )
    # Restrict to query terms FIRST, then derive per-term doc frequency
    # from the matched rows with a window — a term's postings are all
    # matched, so count-over-term here equals the reference's term_freq
    # column (bm25_api.sql:36) without a full-postings groupBy shuffle.
    from pyspark.sql import Window

    matched = (
        stats.postings.join(qdf, "term")
        .withColumn(
            "df", F.count("*").over(Window.partitionBy("term")).cast("long")
        )
        .crossJoin(F.broadcast(stats.corpus))
    )
    scored = matched.withColumn("term_score", bm25_score_expr(k1, b))
    agg = scored.groupBy("doc_id").agg(
        F.sum("term_score").alias("bm25_score")
    )
    if round_digits is not None:
        agg = agg.withColumn("bm25_score", F.round("bm25_score", round_digits))
    return (
        agg.orderBy(F.col("bm25_score").desc(), F.col("doc_id").asc())
        .limit(limit)
    )


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
