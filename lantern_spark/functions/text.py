"""Text tokenization + stemming.

Reference: lantern_extras/src/stemmers.rs
- ``text_to_stem_array`` (rust engine, stemmers.rs:96-117): lowercase →
  replace non-alphanumeric with space → split whitespace → Snowball
  English stem → drop 33 hardcoded stopwords.

Spark design:
- ``tokenize(col)`` — the lowercase/strip/split stage as a PURE column
  expression (codegen'd, also expressible 1:1 in the DuckDB oracle).
  ASCII alphanumerics; the reference uses Unicode is_alphanumeric —
  documented deviation, driver testdata is ASCII.
- ``stem(col)`` / ``stem_tokens(col)`` — Porter stemmer as a vectorized
  pandas UDF (Arrow-batched; model-free, pure Python). The stemmer is a
  from-scratch implementation of the public Porter algorithm (Porter,
  1980, "An algorithm for suffix stripping") — it reproduces the
  reference test goldens (stemmers.rs:155-166: "jumps"→"jump",
  "lazy"→"lazi").
- ``text_to_stem_array(col)`` — the full reference pipeline.
"""

from __future__ import annotations

from typing import Iterable, List

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# stemmers.rs:99-103 — exact 33-word stopword list
STOPWORDS = [
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
]

TOKEN_SPLIT_RE = "[^a-z0-9]+"
# Unicode parity with the reference's rust is_alphanumeric
# (stemmers.rs:97-120): any Unicode letter or digit is token material.
TOKEN_SPLIT_RE_UNICODE = r"[^\p{L}\p{N}]+"

# set_user_stopwords / get_user_stopwords analog (stemmers.rs:24-64 —
# the reference persists a userdefined.stop dictionary file; here it is
# session config honored by every tokenize/stem call made after it)
_USER_STOPWORDS: list = []


def set_user_stopwords(words):
    global _USER_STOPWORDS
    _USER_STOPWORDS = sorted({str(w).lower() for w in words})


def get_user_stopwords():
    return list(_USER_STOPWORDS)


def all_stopwords():
    return STOPWORDS + [w for w in _USER_STOPWORDS if w not in STOPWORDS]


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def tokenize(col, drop_stopwords: bool = False, unicode: bool = False) -> Column:
    """Lowercase → strip non-alphanumerics → split. Pure column expr.

    ``unicode=True`` matches the reference rust engine's
    ``is_alphanumeric`` (stemmers.rs:97-120): any Unicode letter/digit
    survives (``[^\\p{L}\\p{N}]+`` split). The ASCII default is the
    fast path used by the oracle-checked queries (driver corpus is
    ASCII); non-ASCII parity is pinned by golden tests.

    Oracle-parity SQL (DuckDB):
    ``list_filter(string_split_regex(lower(x), '[^a-z0-9]+'), t -> t <> '')``
    """
    pattern = TOKEN_SPLIT_RE_UNICODE if unicode else TOKEN_SPLIT_RE
    toks = F.filter(
        F.split(F.lower(_c(col)), pattern), lambda x: x != ""
    )
    if drop_stopwords:
        toks = F.filter(toks, lambda x: ~x.isin(all_stopwords()))
    return toks


# ----------------------------------------------------------------------
# Porter stemmer (from-scratch implementation of the published algorithm)
# ----------------------------------------------------------------------

_VOWELS = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences (the Porter 'm' measure)."""
    m = 0
    prev_cons = True
    seen_vowel = False
    for i in range(len(stem)):
        c = _is_cons(stem, i)
        if not c:
            seen_vowel = True
        elif seen_vowel:
            m += 1
            seen_vowel = False
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    if not (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
    ):
        return False
    return word[-1] not in "wxy"


def porter_stem(word: str) -> str:
    """Porter (1980) suffix-stripping algorithm, steps 1a–5b."""
    if len(word) <= 2:
        return word
    w = word

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            flag_1b = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    step2 = [
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
        ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
        ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
        ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
        ("biliti", "ble"),
    ]
    for suf, rep in step2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 3
    step3 = [
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ]
    for suf, rep in step3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 4
    step4 = [
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ]
    for suf in step4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                w = stem
            break
        if suf == "ent" and w.endswith("ion"):
            stem = w[:-3]
            if _measure(stem) > 1 and stem and stem[-1] in "st":
                w = stem
            break

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


def stem_token_list(tokens: Iterable[str], drop_stopwords: bool = True) -> List[str]:
    """Stem a token list + drop stopwords (reference order: stem FIRST,
    then filter — stemmers.rs:110-113 filters on the stemmed form)."""
    out = []
    for t in tokens:
        s = porter_stem(t)
        if drop_stopwords and s in all_stopwords():
            continue
        out.append(s)
    return out


@F.pandas_udf(T.ArrayType(T.StringType()))
def _stem_tokens_udf(tokens: pd.Series) -> pd.Series:
    return tokens.map(
        lambda ts: None if ts is None else stem_token_list(list(ts))
    )


@F.pandas_udf(T.ArrayType(T.StringType()))
def _stem_tokens_keep_stops_udf(tokens: pd.Series) -> pd.Series:
    return tokens.map(
        lambda ts: None
        if ts is None
        else stem_token_list(list(ts), drop_stopwords=False)
    )


def stem_tokens(col, drop_stopwords: bool = True) -> Column:
    """Stem an array<string> column (vectorized pandas UDF).
    ``drop_stopwords`` filters on the STEMMED form (rust engine
    semantics); pass False when stopwords were already filtered
    pre-stem (ts engine semantics)."""
    if drop_stopwords:
        return _stem_tokens_udf(_c(col))
    return _stem_tokens_keep_stops_udf(_c(col))


def text_to_stem_array(col, engine: str = "rust") -> Column:
    """Full reference pipeline: tokenize → stem → stopword-filter.

    ``engine`` mirrors the reference's two stemmer engines
    (stemmer_api.sql:1-50):
    - ``"rust"`` (stemmers.rs:96-117): Unicode tokenize → stem →
      filter stopwords on the STEMMED form (stemmers.rs:110-113).
    - ``"ts"`` (to_tsvector-backed): stopwords are checked on the
      original lowercased word BEFORE stemming, the Postgres
      dictionary order. Deviation: Postgres' extra token classes
      (urls, emails, numerics) are not parsed — plain
      letter/digit tokens only; plug the full english.stop list via
      ``set_user_stopwords`` if needed.
    """
    if engine == "rust":
        return stem_tokens(tokenize(col, unicode=True))
    if engine == "ts":
        toks = tokenize(col, drop_stopwords=True, unicode=True)
        return stem_tokens(toks, drop_stopwords=False)
    raise ValueError(f"unknown stemmer engine {engine!r} (rust|ts)")


def duck_tokenize_sql(expr: str, drop_stopwords: bool = False) -> str:
    """The DuckDB expression exactly equivalent to ``tokenize``."""
    base = (
        f"list_filter(string_split_regex(lower({expr}), '[^a-z0-9]+'),"
        " t -> t <> '')"
    )
    if drop_stopwords:
        stop = ",".join(f"'{s}'" for s in STOPWORDS)
        base = f"list_filter({base}, t -> NOT list_contains([{stop}], t))"
    return base


def ngram_windows(toks: Column, k: int, joined: bool = True) -> Column:
    """All order-``k`` sliding windows of an ``array<string>`` column —
    THE shared windowing kernel (ngram_lm counting, decontamination,
    repetition stats all window the same way; three hand-rolled copies
    drifted on the short-input guard before this existed).

    Guard contract: arrays shorter than ``k`` — and NULL arrays —
    yield an EMPTY array. The naive ``sequence(1, size(toks)-k+1)``
    upper bound is a footgun twice over: Spark's ``sequence(1, 0)``
    is the DESCENDING ``[1, 0]``, and ``greatest(NULL, 0)`` skips the
    NULL to 0 — both emit junk short-slice windows.

    ``joined=True`` returns space-joined strings; ``joined=False``
    returns ``array<array<string>>`` windows.
    """
    body = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        (lambda i: F.array_join(F.slice(toks, i, k), " "))
        if joined
        else (lambda i: F.slice(toks, i, k)),
    )
    empty = (
        F.array().cast("array<string>")
        if joined
        else F.array().cast("array<array<string>>")
    )
    return F.when(F.size(toks) >= k, body).otherwise(empty)
