"""Text analysis operators for training-data pipelines.

North-star extensions (BASELINE.json): language ID, quality scoring,
token counting, document fingerprinting. Every operator is a PURE
column expression (whole-stage codegen; no UDFs) and each has a 1:1
ANSI-SQL oracle form — these run as map-only passes at any scale.
"""

from __future__ import annotations

# module-level so pandas_udf type-hint inference (which resolves the
# stringified hints against module globals under
# `from __future__ import annotations`) can see them
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lantern_spark.functions.text import STOPWORDS, tokenize

# n-gram heuristic evidence set: high-frequency English function words
# (the tokenizer stopword list doubles as the language evidence set)
EN_MARKERS = STOPWORDS


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def token_count_ws(col) -> Column:
    """Whitespace token count."""
    return F.size(tokenize(col))


def token_count_bpe(col) -> Column:
    """BPE-ish subword count: runs of letters, runs of digits, and
    individual punctuation marks each count as one token — the classic
    pre-tokenizer regex."""
    return F.size(
        F.regexp_extract_all(
            F.lower(_c(col)), F.lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), 0
        )
    )


def stopword_ratio(col) -> Column:
    toks = tokenize(col)
    n = F.size(toks)
    sw = F.size(F.filter(toks, lambda t: t.isin(EN_MARKERS)))
    return F.when(n > 0, sw / n).otherwise(F.lit(0.0))


def punct_ratio(col) -> Column:
    """Non-alphanumeric, non-space chars / total chars."""
    c = _c(col)
    total = F.length(c)
    clean = F.length(F.regexp_replace(c, "[^a-zA-Z0-9 ]", ""))
    return F.when(total > 0, (total - clean) / total).otherwise(F.lit(0.0))


def mean_word_len(col) -> Column:
    toks = tokenize(col)
    n = F.size(toks)
    chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return F.when(n > 0, chars.cast("double") / n).otherwise(F.lit(0.0))


def lang_id_en(col, min_ratio: float = 0.05) -> Column:
    """n-gram-heuristic language ID: classify 'en' when the English
    function-word ratio clears ``min_ratio``, else 'unk'. (A real
    deployment plugs per-language marker sets into the same expression.)
    """
    return F.when(stopword_ratio(col) >= min_ratio, F.lit("en")).otherwise(
        F.lit("unk")
    )


def quality_score(col) -> Column:
    """Composite [0,1] quality score from length / punctuation /
    stopword signals (Gopher/C4-style heuristic filters, re-expressed
    as one codegen'd expression):
      - length term: saturating token count (n/64 capped at 1)
      - punctuation term: 1 − punct_ratio
      - naturalness term: stopword ratio capped at 4× weight
    """
    n = token_count_ws(col).cast("double")
    length_term = F.least(n / 64.0, F.lit(1.0))
    punct_term = 1.0 - punct_ratio(col)
    natural_term = F.least(4.0 * stopword_ratio(col), F.lit(1.0))
    return F.round((length_term + punct_term + natural_term) / 3.0, 6)


def doc_fingerprint(col) -> Column:
    """Normalized-content fingerprint: md5 of (lowercased, whitespace-
    collapsed, punctuation-stripped) text — stable under formatting
    noise; equal fingerprints ⇒ same normalized content."""
    norm = F.trim(
        F.regexp_replace(F.lower(_c(col)), "[^a-z0-9]+", " ")
    )
    return F.md5(norm)


def rolling_min_hash(col, k: int = 5) -> Column:
    """Winnowing-lite fingerprint: minimum md5 over character k-grams of
    the normalized text — robust to local edits (one changed char
    perturbs only k grams)."""
    norm = F.regexp_replace(F.lower(_c(col)), "[^a-z0-9]+", " ")
    n = F.length(norm)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: norm.substr(i, F.lit(k)))
    return F.array_min(F.transform(grams, lambda g: F.substring(F.md5(g), 1, 16)))


def text_stats(df, text_col: str, id_col: str):
    """All stats in one map-only projection."""
    from lantern_spark.types import ensure_parallelism

    return ensure_parallelism(df).select(
        F.col(id_col),
        token_count_ws(text_col).alias("n_tokens_ws"),
        token_count_bpe(text_col).alias("n_tokens_bpe"),
        F.round(stopword_ratio(text_col), 6).alias("stopword_ratio"),
        F.round(punct_ratio(text_col), 6).alias("punct_ratio"),
        F.round(mean_word_len(text_col), 6).alias("mean_word_len"),
        lang_id_en(text_col).alias("lang_pred"),
        quality_score(text_col).alias("quality"),
        doc_fingerprint(text_col).alias("fingerprint"),
    )



# ----------------------------------------------------------------------
# Repetition signals (the published Gopher repetition rules — Rae et
# al. 2021 Table A1): repetitive documents (boilerplate, scraped menus,
# generated spam) are the largest quality failure heuristic filters
# catch. All pure expressions — map-only at any scale.
# ----------------------------------------------------------------------

def dup_line_fraction(col) -> Column:
    """Fraction of non-empty lines that duplicate an earlier line
    (0 for ≤1 line). Gopher drops docs above 0.30."""
    lines = F.filter(
        F.transform(F.split(_c(col), "\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    n = F.size(lines)
    uniq = F.size(F.array_distinct(lines))
    return F.when(n <= 1, F.lit(0.0)).otherwise(
        (n - uniq).cast("double") / n.cast("double")
    )


def top_ngram_fraction(col, n: int = 2) -> Column:
    """Fraction of the document's tokens covered by its single most
    frequent word n-gram (Gopher: drop above ~0.20 for 2-grams, 0.18
    for 3-grams).

    Kernel shape (r8, review r7 item 1): tokenization stays a pure
    JVM expression (byte-identical to every other consumer of
    :func:`tokenize`), and only the per-row frequency count crosses to
    an Arrow-batched pandas UDF — one ``Counter`` pass over the
    sliding windows, O(tokens) per row. The previous pure-expression
    form (kept as :func:`top_ngram_fraction_expr`, and pinned equal in
    ``tests/test_textstats.py``) re-scanned the gram array once per
    DISTINCT gram inside interpreted HOF closures — O(tokens²) lambda
    evaluations per row, a measured scale-killer on real web documents
    (a 2k-token page costs ~4M closure evals; ``repetition_stats`` →
    ``curate_corpus`` runs this corpus-wide). Still map-only: no
    shuffle, one ArrowEvalPython stage.

    Deviations from the cited rule (ADVICE r6): Gopher's measure is
    CHARACTER-based (chars in the top gram's occurrences / total
    chars); this one is token-based, so the published 0.20/0.18
    thresholds are approximate analogs here. And because occurrences
    of an n-gram can OVERLAP ('a a a' has two overlapping 2-grams of
    'a a'), top_count·n can exceed the token count — the result is
    clamped to 1.0 so downstream threshold filters see a fraction."""
    from collections import Counter

    nn = int(n)
    if nn < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    @F.pandas_udf(T.DoubleType())
    def _top_frac(tok_arrays: pd.Series) -> pd.Series:
        out = []
        for toks in tok_arrays:
            if toks is None:
                out.append(0.0)
                continue
            toks = list(toks)
            size = len(toks)
            n_grams = size - nn + 1
            if n_grams <= 0:
                out.append(0.0)
                continue
            counts = Counter(
                tuple(toks[j : j + nn]) for j in range(n_grams)
            )
            top = max(counts.values())
            # same arithmetic as the expression form: int*int, then
            # IEEE double divide, then clamp — bit-identical results
            out.append(min(1.0, float(top * nn) / float(size)))
        return pd.Series(out, dtype="float64")

    return _top_frac(tokenize(_c(col)))


def top_ngram_fraction_expr(col, n: int = 2) -> Column:
    """Pure-expression form of :func:`top_ngram_fraction` — O(tokens²)
    interpreted-HOF work per row (the max occurrence count aggregates
    over the DISTINCT grams, re-scanning the gram array for each).
    Kept as the no-Python-worker fallback and as the drift pin for the
    linear Arrow kernel above; do not use in corpus-wide curation."""
    from lantern_spark.functions.text import ngram_windows

    c = _c(col)
    toks = tokenize(c)
    grams = ngram_windows(toks, n)
    top_count = F.aggregate(
        F.array_distinct(grams),
        F.lit(0),
        lambda acc, g: F.greatest(
            acc, F.size(F.filter(grams, lambda x: x == g))
        ),
    )
    return F.when(F.size(grams) == 0, F.lit(0.0)).otherwise(
        F.least(
            F.lit(1.0),
            (top_count * n).cast("double") / F.size(toks).cast("double"),
        )
    )


def repetition_stats(df, text_col: str, id_col: str):
    """(id, dup_line_frac, top2gram_frac, top3gram_frac) — the Gopher
    repetition signal block, one map-only pass."""
    return df.select(
        F.col(id_col),
        dup_line_fraction(text_col).alias("dup_line_frac"),
        top_ngram_fraction(text_col, 2).alias("top2gram_frac"),
        top_ngram_fraction(text_col, 3).alias("top3gram_frac"),
    )


# ----------------------------------------------------------------------
# PII redaction (C4/FineWeb-style pre-training scrub)
# ----------------------------------------------------------------------

# Ordered (kind, pattern): emails first (they contain dots and digits
# that the later patterns would partially match), then SSN before phone
# (an SSN is 9 dash-separated digits — a phone-shaped string). Patterns
# are deliberately restricted to the regex intersection of Java
# (Spark's engine) and RE2 (DuckDB / Go tooling): no backreferences,
# no lookaround — so the scrub replays byte-identically cross-engine.
#
# Known dialect frontier (r8, hypothesis-found, pinned in
# test_properties.py): the engines disagree on \b ONLY where a
# non-ASCII word character directly abuts ASCII PII — Java's \b sees
# no boundary in '0.0.0.0٠' (U+0660 is a word char there) and
# conservatively skips it, while ASCII-\b engines (RE2, Python
# re.ASCII) would redact. The byte-identical contract therefore holds
# for text whose PII-ADJACENT characters are ASCII; PII followed by
# e.g. Arabic-Indic digits is left unredacted by this engine (it is
# not a cleanly-delimited token).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("phone", r"\(\d{3}\)\s?\d{3}-\d{4}|\b\d{3}-\d{3}-\d{4}\b"),
]


def redact_pii(col, kinds=None) -> Column:
    """Replace PII spans with ``<KIND>`` placeholder tokens — the
    standard pre-training scrub (C4 kept a variant of this; FineWeb
    anonymizes emails/IPs the same way). Pure chained regexp_replace:
    whole-stage codegen, map-only, no UDF — a 100 TB scrub is exactly
    one scan. ``kinds`` restricts to a subset of PII_PATTERNS kinds."""
    out = _c(col)
    for kind, pat in PII_PATTERNS:
        if kinds is not None and kind not in kinds:
            continue
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out


def pii_count(col, kinds=None) -> Column:
    """Total count of PII matches across kinds (audit metric for the
    scrub: corpora report redactions/doc before training).

    Counts run on the PROGRESSIVELY REDACTED text in the same pattern
    order as :func:`redact_pii`, so overlapping kinds (an SSN is also
    phone-shaped) are attributed to exactly one kind and the total
    equals the number of placeholder tokens the scrub inserted."""
    c = _c(col)
    total = F.lit(0)
    for kind, pat in PII_PATTERNS:
        if kinds is not None and kind not in kinds:
            continue
        total = total + F.regexp_count(c, F.lit(pat))
        c = F.regexp_replace(c, pat, f"<{kind.upper()}>")
    return total
