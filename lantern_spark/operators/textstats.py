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
    """All stats in one map-only pass over a STAGED count projection
    (r15, guide §4): the token/stopword/char counts evaluate once in
    an intermediate select and every ratio/score derives from the
    staged ints with the SAME IEEE expressions the per-stat helpers
    use. The former single-projection form re-evaluated the
    interpreted tokenize chain inside each referencing stat — HOF
    kernels (filter/aggregate) are CodegenFallback, so codegen's
    subexpression elimination cannot share their children — measured
    0.82 → 0.47 s at sf0.1. Output values are bit-identical (pinned in
    tests/test_textstats.py against the per-stat helpers)."""
    from lantern_spark.types import ensure_parallelism

    c = _c(text_col)
    toks = tokenize(c)
    staged = ensure_parallelism(df).select(
        F.col(id_col),
        F.size(toks).alias("__n"),
        F.size(
            F.filter(toks, lambda t: t.isin(EN_MARKERS))
        ).alias("__sw"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("__chars"),
        token_count_bpe(c).alias("__bpe"),
        F.length(c).alias("__total"),
        F.length(F.regexp_replace(c, "[^a-zA-Z0-9 ]", "")).alias("__clean"),
        doc_fingerprint(c).alias("fingerprint"),
    )
    n = F.col("__n")
    nd = n.cast("double")
    swr = F.when(n > 0, F.col("__sw") / n).otherwise(F.lit(0.0))
    pr = F.when(
        F.col("__total") > 0,
        (F.col("__total") - F.col("__clean")) / F.col("__total"),
    ).otherwise(F.lit(0.0))
    mwl = F.when(n > 0, F.col("__chars").cast("double") / n).otherwise(
        F.lit(0.0)
    )
    quality = F.round(
        (
            F.least(nd / 64.0, F.lit(1.0))
            + (1.0 - pr)
            + F.least(4.0 * swr, F.lit(1.0))
        )
        / 3.0,
        6,
    )
    return staged.select(
        F.col(id_col),
        n.alias("n_tokens_ws"),
        F.col("__bpe").alias("n_tokens_bpe"),
        F.round(swr, 6).alias("stopword_ratio"),
        F.round(pr, 6).alias("punct_ratio"),
        F.round(mwl, 6).alias("mean_word_len"),
        F.when(swr >= 0.05, F.lit("en")).otherwise(F.lit("unk")).alias(
            "lang_pred"
        ),
        quality.alias("quality"),
        "fingerprint",
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


def compression_ratio(col, level: int = 6) -> Column:
    """zlib-compressed bytes / raw UTF-8 bytes — the Dolma-family
    quality signal (a DEFLATE pass is a cheap universal repetition
    detector): boilerplate/templated/looping text compresses far below
    natural prose (≲ 0.3), while random-looking byte soup compresses
    above it (≳ 1.0 with header overhead). Pipelines keep a middle
    band — both tails are junk.

    Arrow-batched pandas UDF (zlib is not a Catalyst expression) at
    the default compression level 6 — O(bytes) per row, map-only, no
    shuffle. NULL → NULL; empty text → 0.0 (nothing to compress, and a
    divide-by-zero guard)."""
    import zlib

    lv = int(level)

    @F.pandas_udf(T.DoubleType())
    def _ratio(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            raw = t.encode("utf-8", "surrogatepass")
            if not raw:
                out.append(0.0)
                continue
            out.append(len(zlib.compress(raw, lv)) / len(raw))
        return pd.Series(out, dtype="float64")

    return _ratio(_c(col))


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


# ----------------------------------------------------------------------
# Gopher Table A1 quality rules (Rae et al. 2021, arXiv:2112.11446)
# ----------------------------------------------------------------------

def _ws_words(col):
    """Whitespace words (\\S+ runs) — Gopher's 'word' unit, as opposed
    to the alnum `tokenize` the lexical stats use."""
    return F.filter(
        F.split(F.coalesce(_c(col), F.lit("")), r"\s+"), lambda w: w != ""
    )


def _lines(col):
    return F.filter(
        F.split(F.coalesce(_c(col), F.lit("")), r"\n"),
        lambda ln: F.trim(ln) != "",
    )


def symbol_word_ratio(col) -> Column:
    """(# of '#' and '...' occurrences) / word count — Gopher drops
    above 0.1 (hashtag/ellipsis soup)."""
    c = F.coalesce(_c(col), F.lit(""))
    hashes = F.size(F.regexp_extract_all(c, F.lit("#"), 0))
    dots = F.size(F.regexp_extract_all(c, F.lit(r"\.\.\."), 0))
    n = F.size(_ws_words(col))
    return F.when(n > 0, (hashes + dots).cast("double") / n).otherwise(
        F.lit(0.0)
    )


def bullet_line_fraction(col) -> Column:
    """Fraction of non-empty lines starting with a bullet marker —
    Gopher drops above 0.9 (pure listings)."""
    lines = _lines(col)
    n = F.size(lines)
    hits = F.size(
        F.filter(lines, lambda ln: F.trim(ln).rlike(r"^[-*•‣◦]"))
    )
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def ellipsis_line_fraction(col) -> Column:
    """Fraction of non-empty lines ending with an ellipsis — Gopher
    drops above 0.3 (truncated-teaser pages)."""
    lines = _lines(col)
    n = F.size(lines)
    hits = F.size(
        F.filter(
            lines,
            lambda ln: F.trim(ln).rlike(r"(\.\.\.|…)$"),
        )
    )
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def alpha_word_fraction(col) -> Column:
    """Fraction of words containing at least one alphabetic character —
    Gopher requires >= 0.8 (number/symbol soup fails)."""
    words = _ws_words(col)
    n = F.size(words)
    hits = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


#: Gopher's required-stopword set: a document must contain >= 2 of
#: these (Table A1's "stop word" rule — distinct from the lexical
#: stopword RATIO above).
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_stopword_count(col) -> Column:
    """How many DISTINCT Gopher stopwords the document contains."""
    toks = F.array_distinct(
        F.filter(
            F.transform(_ws_words(col), lambda w: F.lower(w)),
            lambda w: w.isin(GOPHER_STOPWORDS),
        )
    )
    return F.size(toks)


def gopher_rules_ok(
    col,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopwords: int = 2,
) -> Column:
    """The full Gopher Table A1 document-level rule block as ONE
    boolean column expression (published defaults; the repetition
    rules live in :func:`dup_line_fraction` / :func:`top_ngram_fraction`
    and `CurationConfig(max_dup_line_frac=, max_top2gram_frac=)` —
    compose both for the complete filter). Pure expressions: fuses
    into the heuristic scan, no UDF, no shuffle."""
    n_words = F.size(_ws_words(col))
    words = _ws_words(col)
    word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mwl = F.when(
        n_words > 0, word_chars.cast("double") / n_words
    ).otherwise(F.lit(0.0))
    return (
        _c(col).isNotNull()
        & (n_words >= min_words)
        & (n_words <= max_words)
        & (mwl >= min_mean_word_len)
        & (mwl <= max_mean_word_len)
        & (symbol_word_ratio(col) <= max_symbol_word_ratio)
        & (bullet_line_fraction(col) <= max_bullet_line_frac)
        & (ellipsis_line_fraction(col) <= max_ellipsis_line_frac)
        & (alpha_word_fraction(col) >= min_alpha_word_frac)
        & (gopher_stopword_count(col) >= min_stopwords)
    )


# ----------------------------------------------------------------------
# C4 cleaning rules (Raffel et al. 2020, arXiv:1910.10683 §2.2)
# ----------------------------------------------------------------------

#: a page containing any of these is dropped outright (C4's
#: placeholder/code heuristics; the policy-phrase list is a deployment
#: choice layered on the same expression).
C4_BAD_PAGE_MARKERS = ["lorem ipsum", "{"]


def c4_clean_lines(
    col,
    min_words: int = 3,
    require_terminal_punct: bool = True,
) -> Column:
    """Rewrite a page keeping only C4-clean lines: at least
    ``min_words`` words and (optionally) ending in terminal
    punctuation — the C4 line-level retention rule. Pure expressions
    (filter + array_join); dropped lines shrink the page, page-level
    decisions belong to :func:`c4_page_ok`."""
    lines = _lines(col)

    def ok(ln):
        cond = F.size(
            F.filter(F.split(F.trim(ln), r"\s+"), lambda w: w != "")
        ) >= min_words
        if require_terminal_punct:
            cond = cond & F.trim(ln).rlike(r"[.!?\"']$")
        return cond

    return F.when(
        _c(col).isNotNull(),
        F.array_join(F.filter(lines, ok), "\n"),
    )


def c4_page_ok(col, min_sentences: int = 5) -> Column:
    """C4 page-level keep rule: no bad marker ('lorem ipsum',
    code-brace) and at least ``min_sentences`` sentences (terminal
    punctuation marks approximate sentence ends, the paper's
    heuristic)."""
    c = F.coalesce(_c(col), F.lit(""))
    low = F.lower(c)
    bad = F.lit(False)
    for marker in C4_BAD_PAGE_MARKERS:
        bad = bad | low.contains(marker)
    sentences = F.size(F.regexp_extract_all(c, F.lit(r"[.!?]"), 0))
    return _c(col).isNotNull() & ~bad & (sentences >= min_sentences)


# ----------------------------------------------------------------------
# Multi-language ID (the lang_id_en heuristic generalized)
# ----------------------------------------------------------------------

#: Function-word marker sets per language — the highest-frequency
#: closed-class words, which are near-disjoint across these languages
#: (the textcat-style evidence signal). A deployment extends/replaces
#: the sets; the expression is unchanged.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was",
           "for", "with", "as", "his", "this", "have", "not"],
    "es": ["el", "la", "los", "las", "de", "que", "y", "en", "un",
           "una", "es", "por", "con", "para", "del", "se"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "en", "que",
           "une", "dans", "pour", "qui", "au", "pas", "sur"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den",
           "nicht", "ein", "eine", "auf", "sich", "dem", "des", "im"],
    "it": ["il", "la", "di", "che", "e", "un", "una", "per", "non",
           "sono", "con", "del", "gli", "nel", "alla", "anche"],
    "pt": ["o", "os", "de", "que", "e", "do", "da", "em", "um", "uma",
           "para", "com", "nao", "por", "mais", "como"],
}


#: Within-script function-word tables (r10, review r9 item 3): the
#: script tier identifies the SCRIPT; these tables disambiguate the
#: big same-script language families AFTER it — Cyrillic (ru/uk/bg),
#: Arabic script (ar/fa/ur). List order = preference order: the FIRST
#: language wins ties, and heads its family as the default when no
#: marker clears the family floor (the script-level proxy label).
#: Shared function words legitimately appear in several lists; the
#: distinctive ones (uk і/що/це, bg да/се/ще, fa است/که/را, ur
#: ہے/اور/کے) decide. Matching tokenizes with the UNICODE tokenizer —
#: the ASCII default would strip these scripts entirely.
SCRIPT_FAMILY_MARKERS = {
    "cyrillic": [
        ("ru", ["и", "что", "это", "не", "на", "он", "она", "как",
                "его", "но", "же", "из", "был", "была", "мы", "только",
                "или", "чтобы"]),
        ("uk", ["і", "що", "це", "він", "вона", "як", "його", "але",
                "із", "був", "була", "ми", "тільки", "або", "та", "й",
                "до", "щоб"]),
        ("bg", ["и", "да", "не", "се", "на", "той", "тя", "като",
                "но", "от", "за", "това", "са", "ще", "или", "беше",
                "ние", "бъде"]),
    ],
    "arabic": [
        ("ar", ["في", "من", "على", "إلى", "أن", "هذا", "هذه", "التي",
                "الذي", "كان", "مع", "عن", "لا", "ما", "هو", "هي",
                "و", "أو"]),
        ("fa", ["در", "از", "به", "که", "این", "آن", "را", "با",
                "برای", "است", "بود", "شد", "می", "ها", "تا", "خود",
                "ما", "یک"]),
        ("ur", ["میں", "سے", "کے", "کی", "کا", "کو", "نے", "پر",
                "ہے", "ہیں", "تھا", "اور", "یہ", "وہ", "ہم", "رہے",
                "لیے", "گیا"]),
    ],
    # r11 (review r10 item 5): Devanagari covers Hindi, Marathi and
    # Nepali — mr/ne misfiled as 'hi' under the bare script proxy.
    # Distinctive closed-class words: hi है/के/की (copula +
    # genitive), mr आहे/आणि/मध्ये (copula/and/in — Marathi's copula
    # is unmistakably not Hindi's), ne छ/गरेको/पनि (copula +
    # perfective + 'also'). को/का/मा are shared hi/ne postpositions
    # and appear in both lists; the copulas decide.
    "devanagari": [
        ("hi", ["है", "के", "की", "का", "में", "से", "और", "को",
                "पर", "यह", "नहीं", "हो", "था", "कि", "ने", "भी",
                "एक", "हैं"]),
        ("mr", ["आहे", "आणि", "च्या", "मध्ये", "आहेत", "हे", "तो",
                "ती", "या", "व", "होते", "केली", "असून", "येथे",
                "करण्यात", "त्यांनी", "झाली", "नाही"]),
        ("ne", ["छ", "छन्", "र", "को", "का", "मा", "पनि", "गरेको",
                "भएको", "हुन्", "लागि", "गर्न", "भने", "यो", "हो",
                "गरी", "हुने", "थियो"]),
    ],
}


#: Unicode script ranges as Java-regex character-class bodies — the
#: big non-Latin pretraining scripts. Pure ``regexp_count`` exprs; a
#: deployment extends the dict (plus a label in :func:`lang_id`'s
#: script chain) to add coverage.
SCRIPT_RANGES = {
    "han": "\\u4e00-\\u9fff\\u3400-\\u4dbf\\uf900-\\ufaff",
    "kana": "\\u3040-\\u309f\\u30a0-\\u30ff\\u31f0-\\u31ff",
    "hangul": "\\uac00-\\ud7af\\u1100-\\u11ff\\u3130-\\u318f",
    "cyrillic": "\\u0400-\\u04ff\\u0500-\\u052f",
    "arabic": "\\u0600-\\u06ff\\u0750-\\u077f\\u08a0-\\u08ff",
    "devanagari": "\\u0900-\\u097f",
}


def script_fraction(col, script: str) -> Column:
    """Fraction of non-whitespace characters in a Unicode script
    (:data:`SCRIPT_RANGES` key, or a raw char-class body). Two
    ``regexp_count`` passes — pure expressions, fuse into any scan.
    Whitespace-blind so CJK text (no word spaces) and spaced scripts
    measure on the same denominator."""
    ranges = SCRIPT_RANGES.get(script, script)
    c = F.coalesce(_c(col), F.lit(""))
    total = F.regexp_count(c, F.lit(r"\S"))
    hits = F.regexp_count(c, F.lit(f"[{ranges}]"))
    return F.when(total > 0, hits.cast("double") / total).otherwise(
        F.lit(0.0)
    )


#: Family-tier token split: keeps COMBINING MARKS (\\p{M}) with their
#: base letters — Devanagari matras, Arabic harakat, Hebrew niqqud are
#: marks, and the plain \\p{L}\\p{N} split shatters words at each one
#: ("आहे" → "आह" + debris, so no marker could ever match). The
#: lexical-stat tokenizer (functions/text.py) keeps the reference's
#: is_alphanumeric contract; this split exists only for marker
#: matching, where word identity must survive the script's own
#: orthography.
TOKEN_SPLIT_RE_MARKS = r"[^\p{L}\p{M}\p{N}]+"


def lang_marker_ratio(col, markers, unicode_tokens: bool = False) -> Column:
    """Fraction of tokens that are in ``markers`` (lowercased alnum
    tokens — the same tokenizer every lexical stat uses).
    ``unicode_tokens=True`` switches to the marks-preserving Unicode
    split (:data:`TOKEN_SPLIT_RE_MARKS`) — the ASCII default strips
    non-Latin scripts outright, and a marks-blind Unicode split
    breaks mark-bearing scripts (Devanagari) at every matra, so
    within-script family markers must match with this one."""
    if unicode_tokens:
        toks = F.filter(
            F.split(F.lower(_c(col)), TOKEN_SPLIT_RE_MARKS),
            lambda x: x != "",
        )
    else:
        toks = tokenize(_c(col))
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: t.isin(list(markers))))
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def _family_pick(col, family, family_min: float) -> Column:
    """Within-script argmax over a :data:`SCRIPT_FAMILY_MARKERS`
    family: the first (preference-ordered) language whose marker
    coverage equals the family max wins; the family head is the
    default when nothing clears ``family_min`` (the script-level
    proxy label — e.g. plain 'ru' for marker-free Cyrillic)."""
    ratios = [
        (name, lang_marker_ratio(col, ws, unicode_tokens=True))
        for name, ws in family
    ]
    best = F.greatest(*[r for _, r in ratios])
    out = F.lit(family[0][0])
    for name, r in reversed(ratios):
        out = F.when((r == best) & (best >= family_min), F.lit(name)).otherwise(out)
    return out


def lang_id(
    col,
    markers: dict = None,
    min_ratio: float = 0.04,
    script_min: float = 0.3,
    kana_min: float = 0.05,
    family_markers: dict = None,
    family_min: float = 0.02,
) -> Column:
    """Three-tier language ID, all pure expressions fused into one
    scan:

    1. SCRIPT tier (r9, review r8 item 3): Unicode-script character
       fractions decide non-Latin text FIRST — the marker tier
       whitespace-tokenizes, so CJK (no word spaces) and
       Cyrillic/Arabic/Devanagari corpora all classified 'unk' before.
       Kana presence (≥ ``kana_min``) → 'ja' (kana is uniquely
       Japanese; ja text mixes Han + kana, so this check precedes
       Han); then Han/Hangul ≥ ``script_min`` → 'zh'/'ko',
       Devanagari → 'hi'.
    2. FAMILY tier (r10, review r9 item 3; r11 added Devanagari):
       Cyrillic-, Arabic- and Devanagari-script text disambiguates
       WITHIN the script by function-word argmax over
       :data:`SCRIPT_FAMILY_MARKERS` (Unicode-tokenized) — uk/bg no
       longer misfile as 'ru', fa/ur as 'ar', mr/ne as 'hi'. The
       family head ('ru'/'ar'/'hi') remains the default when no
       marker clears ``family_min`` (marker-free text is still best
       labeled by its script). ``family_markers={}`` disables the
       tier (legacy script-proxy labels).
    3. MARKER tier: argmax function-word coverage over
       :data:`LANG_MARKERS` (or a caller set) — the language whose
       function words cover the largest token fraction wins, 'unk'
       when none clears ``min_ratio``. Ties break by language-key
       order (deterministic).

    Honest scope: a script/closed-class-word heuristic, not a trained
    classifier. Remaining proxy: 'zh' = Han without kana — this is
    the kana GATE, not a guess: Japanese prose is structurally
    impossible without kana particles (は/が/の/です), so
    Han-with-no-kana is Chinese (or a kanji-only fragment too short
    to classify either way; ``kana_min`` tunes the gate). Mixed
    Hanja/Hangul Korean still labels 'ko': Hanja is <1% of modern ko
    text, so the Han fraction never clears ``script_min`` before
    Hangul does. Within-family coverage is
    {ru,uk,bg}/{ar,fa,ur}/{hi,mr,ne} — extend
    :data:`SCRIPT_FAMILY_MARKERS` for more, or plug
    `operators/quality_clf` with language labels (same serving
    shape)."""
    fams = (
        SCRIPT_FAMILY_MARKERS if family_markers is None else family_markers
    )
    cyr = (
        _family_pick(col, fams["cyrillic"], family_min)
        if fams.get("cyrillic")
        else F.lit("ru")
    )
    arb = (
        _family_pick(col, fams["arabic"], family_min)
        if fams.get("arabic")
        else F.lit("ar")
    )
    dev = (
        _family_pick(col, fams["devanagari"], family_min)
        if fams.get("devanagari")
        else F.lit("hi")
    )
    script_pred = (
        F.when(script_fraction(col, "kana") >= kana_min, F.lit("ja"))
        .when(script_fraction(col, "han") >= script_min, F.lit("zh"))
        .when(script_fraction(col, "hangul") >= script_min, F.lit("ko"))
        .when(script_fraction(col, "cyrillic") >= script_min, cyr)
        .when(script_fraction(col, "arabic") >= script_min, arb)
        .when(script_fraction(col, "devanagari") >= script_min, dev)
    )
    sets = markers or LANG_MARKERS
    ratios = [(name, lang_marker_ratio(col, ws)) for name, ws in sorted(sets.items())]
    best = F.greatest(*[r for _, r in ratios]) if len(ratios) > 1 else ratios[0][1]
    out = F.lit("unk")
    # reversed: the FIRST language in key order wins ties (when chains
    # evaluate in order, so build from the last backwards)
    for name, r in reversed(ratios):
        out = F.when((r == best) & (best >= min_ratio), F.lit(name)).otherwise(out)
    return F.coalesce(script_pred, out)
