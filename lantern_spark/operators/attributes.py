"""Attribute sidecars: tag once, filter many times (Dolma-style).

The architecture popularized by AI2's Dolma toolkit (Soldaini et al.
2024, arXiv:2402.00159): taggers write per-document attributes
(quality scores, language, PII counts, repetition stats) to NARROW
sidecar files keyed by document id, separate from the immutable text;
every downstream mixture experiment then filters on the sidecars and
joins back only the survivors. The reference's analog is its separate
index/metadata artifacts beside the heap table (index files store ids
+ derived structure, never the row payload).

Why this is the right 100 TB shape:

- A tagger pass is ONE scan over the text; its output is ~1% of the
  corpus bytes (an id and a few numerics per doc). Re-running a
  filter experiment reads only sidecars — the 100 TB text table is
  touched once per TAGGER, not once per EXPERIMENT.
- Filtering evaluates entirely on the sidecar scan (predicates push
  down to its parquet footer stats), producing a surviving-id set;
  text rows are recovered with a LEFT SEMI join on the id — the text
  columns never flow through the filter.
- The id join is big-big but key-only; for recurring experiments
  write both sides bucketed on the id (:func:`~lantern_spark.sources.
  layout.write_bucketed`) and the join plans with no Exchange.

``doc_id`` stability is the contract that makes sidecars durable:
use :func:`lantern_spark.sources.warc.wet_documents`'s hash ids (or
any id that survives re-partitioning), never
``monotonically_increasing_id``.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "default_taggers",
    "tag_documents",
    "write_attributes",
    "read_attributes",
    "attach_attributes",
    "filter_by_attributes",
]


def default_taggers(text_col: str = "text") -> "dict[str, Column]":
    """The standard curation tagger set, all pure Catalyst exprs —
    one fused codegen'd scan when written together."""
    from lantern_spark.operators.textstats import (
        alpha_word_fraction,
        dup_line_fraction,
        gopher_rules_ok,
        lang_id,
        lang_id_en,
        mean_word_len,
        pii_count,
        punct_ratio,
        quality_score,
        stopword_ratio,
        symbol_word_ratio,
        token_count_ws,
        top_ngram_fraction,
    )

    c = F.col(text_col)
    return {
        "n_tokens": token_count_ws(c),
        "stopword_ratio": stopword_ratio(c),
        "punct_ratio": punct_ratio(c),
        "mean_word_len": mean_word_len(c),
        "quality": quality_score(c),
        "lang": lang_id(c),
        # r11: the exact columns CurationConfig's sidecar-backed
        # heuristics consume (curate.py) — lang_en is the en/unk
        # binary the inline `require_english` rule uses (lang_id's
        # multi-language argmax can disagree on edge docs, and the
        # sidecar path must reproduce the inline path's decisions
        # exactly), gopher_ok / top2gram_fraction back the Gopher
        # knobs. All pure exprs: the tag pass stays one codegen scan.
        "lang_en": lang_id_en(c),
        "gopher_ok": gopher_rules_ok(c),
        "top2gram_fraction": top_ngram_fraction(c, 2),
        "pii_count": pii_count(c),
        "dup_line_fraction": dup_line_fraction(c),
        "symbol_word_ratio": symbol_word_ratio(c),
        "alpha_word_fraction": alpha_word_fraction(c),
    }


def tag_documents(
    df: DataFrame,
    taggers: Optional[Mapping[str, Column]] = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One scan → the narrow attribute table ``(id, *attrs)``.

    ``taggers`` maps attribute name → Column expression over ``df``'s
    columns (default: :func:`default_taggers`). Keep taggers
    expression-only where possible so the whole pass stays in one
    codegen stage; a Pandas-UDF tagger (e.g. a model scorer) still
    fits — it just adds an Arrow eval to this one pass instead of to
    every downstream experiment.
    """
    if taggers is None:
        taggers = default_taggers(text_col)
    bad = [k for k in taggers if k == id_col]
    if bad:
        raise ValueError(f"tagger name collides with id column: {bad}")
    return df.select(
        F.col(id_col), *[c.alias(name) for name, c in taggers.items()]
    )


def write_attributes(
    df: DataFrame,
    path: str,
    taggers: Optional[Mapping[str, Column]] = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "overwrite",
) -> None:
    """Tag and persist one sidecar. Text columns are never written."""
    tag_documents(df, taggers, id_col=id_col, text_col=text_col).write.mode(
        mode
    ).parquet(path)


def read_attributes(
    spark: SparkSession,
    paths: Sequence[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Read sidecar(s); multiple sidecars (different tagger runs over
    the same corpus) are aligned with inner equi-joins on the id.

    Narrow × narrow joins on the shared id — with sidecars written
    bucketed on the id they co-locate; either way the text table is
    not involved.
    """
    if isinstance(paths, str):
        paths = [paths]
    if not paths:
        raise ValueError("need at least one sidecar path")
    out = spark.read.parquet(paths[0])
    for p in paths[1:]:
        nxt = spark.read.parquet(p)
        overlap = (set(out.columns) & set(nxt.columns)) - {id_col}
        if overlap:
            raise ValueError(
                f"duplicate attribute columns across sidecars: {sorted(overlap)}"
            )
        out = out.join(nxt, on=id_col, how="inner")
    return out


def attach_attributes(
    docs: DataFrame,
    attrs: DataFrame,
    id_col: str = "doc_id",
    how: str = "left",
) -> DataFrame:
    """Join attributes onto the text table (for mixture weighting or
    inspection — prefer :func:`filter_by_attributes` for pure drops,
    which keeps text out of the filter entirely)."""
    return docs.join(attrs, on=id_col, how=how)


def filter_by_attributes(
    docs: DataFrame,
    attrs: DataFrame,
    predicate: Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep text rows whose sidecar attributes satisfy ``predicate``.

    The predicate evaluates on the SIDECAR scan (where it pushes down
    to parquet footer stats); survivors reach the text table via a
    LEFT SEMI join, so only the id crosses the join and the text
    columns are read exclusively for surviving rows. Docs with no
    sidecar row are dropped (an untagged doc is an unvetted doc —
    loud, conservative default)."""
    keep_ids = attrs.where(predicate).select(id_col)
    return docs.join(keep_ids, on=id_col, how="left_semi")
