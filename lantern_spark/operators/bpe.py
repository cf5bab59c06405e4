"""Byte-pair-encoding tokenizer: distributed counting, driver merges,
distributed encoding — the core training-data-pipeline operator that
``textstats.token_count_bpe`` only approximates with a regex.

Training follows the published BPE algorithm (Sennrich et al. 2016) at
cluster scale the way production tokenizer trainers do it: the ONLY
pass over the corpus is one tokenize→explode→groupBy producing the
word-frequency table (a corpus of any size compresses to its distinct
words — ~10⁵-10⁶ rows), which is collected and the merge loop runs
driver-side over that tiny table. Merges are therefore exact —
identical to single-machine training on the concatenated corpus —
while the corpus itself is touched exactly once, distributed.

Encoding is a vectorized pandas UDF over a broadcast merge list: each
word applies merges in learned priority order (the standard greedy BPE
apply), with an LRU word cache per batch since natural text repeats
words heavily. End-of-word is marked with the ``</w>`` convention from
the paper.

Determinism: pair-count ties break lexicographically (sorted pair), so
the same corpus always learns the same merge table — required for the
retry-safe pipeline contract shared with operators/pack (no rand()).
"""

from __future__ import annotations

from collections import Counter
from typing import List, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lantern_spark.functions.text import tokenize

EOW = "</w>"


# ----------------------------------------------------------------------
# driver-side merge-loop core (operates on the word-frequency table)
# ----------------------------------------------------------------------

def _word_symbols(word: str) -> Tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + EOW,) if word else ()


def train_bpe_from_counts(
    word_counts: List[Tuple[str, int]], num_merges: int
) -> List[Tuple[str, str]]:
    """Exact BPE merge learning over a (word, count) table.

    Classic algorithm: repeatedly merge the most frequent adjacent
    symbol pair, weighting each word's pairs by its corpus count. Ties
    break on the lexicographically smallest pair — deterministic for a
    deterministic input table. Returns merges in learned order."""
    vocab = {
        _word_symbols(w): int(c) for w, c in word_counts if w
    }
    merges: List[Tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt
        if not pairs:
            break
        best_n = max(pairs.values())
        best = min(p for p, n in pairs.items() if n == best_n)
        if best_n < 2:
            break  # nothing repeats — further merges memorize noise
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab = {}
        for syms, cnt in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


def _encode_series(texts: "pd.Series", ranks: dict, vocab: Optional[dict]):
    """Shared encode kernel for the Arrow UDFs (one implementation, so
    the tokenizer front end — split regex, word cache, NULL contract —
    can never diverge between the string and id paths): subword tokens
    per text, mapped through ``vocab`` to ids when given."""
    import re

    cache: dict = {}

    def enc(t):
        if t is None:
            return None
        out: list = []
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if not w:
                continue
            hit = cache.get(w)
            if hit is None:
                hit = apply_bpe_word(w, ranks)
                if vocab is not None:
                    hit = [vocab[s] for s in hit]
                if len(cache) < 100_000:
                    cache[w] = hit
            out.extend(hit)
        return out

    return texts.map(enc)


def apply_bpe_word(word: str, ranks: dict) -> List[str]:
    """Greedy BPE apply: repeatedly merge the best-ranked adjacent pair
    (the standard inference algorithm — identical output to replaying
    the merge list in order)."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


# ----------------------------------------------------------------------
# Spark surface
# ----------------------------------------------------------------------

class BPETokenizer:
    """A learned merge table + encode/decode surface."""

    def __init__(self, merges: List[Tuple[str, str]]):
        self.merges = [tuple(m) for m in merges]
        self.ranks = {m: i for i, m in enumerate(self.merges)}

    # -- persistence (tiny artifact, JSON) ------------------------------

    def save(self, path: str) -> None:
        import json
        import os

        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "bpe_merges.json"), "w") as fh:
            json.dump({"format_version": "1.1", "merges": self.merges}, fh)

    @classmethod
    def load(cls, path: str) -> "BPETokenizer":
        import json
        import os

        from lantern_spark.types import check_format_version

        with open(os.path.join(path, "bpe_merges.json")) as fh:
            d = json.load(fh)
        check_format_version(d.get("format_version", "1.0"), path)
        return cls([tuple(m) for m in d["merges"]])

    # -- vocab ----------------------------------------------------------

    def vocab(self) -> List[str]:
        """Merge products in learned order (the subword vocabulary the
        merge table induces beyond single characters)."""
        return [a + b for a, b in self.merges]

    # -- column kernels --------------------------------------------------

    def encode_expr(self, col) -> Column:
        """array<string> of subword tokens for a text column —
        vectorized pandas UDF over the broadcast-by-closure ranks
        (the merge table is KBs; an LRU word cache exploits natural
        text's word repetition)."""
        ranks = dict(self.ranks)

        @F.pandas_udf(T.ArrayType(T.StringType()))
        def _encode(texts: pd.Series) -> pd.Series:
            return _encode_series(texts, ranks, None)

        c = col if isinstance(col, Column) else F.col(col)
        return _encode(c)

    def token_count_expr(self, col) -> Column:
        return F.size(self.encode_expr(col))

    def id_vocab(self, specials: Sequence[str] = ()) -> dict:
        """Deterministic token→id map covering every token
        :meth:`encode_expr` can emit: the 72 base symbols (a-z, 0-9,
        each with and without the end-of-word mark) in sorted order,
        then merge products in learned merge order, with ``specials``
        (pad/bos/eos/unk strings) FIRST so their ids are stable small
        integers regardless of vocabulary size."""
        base = sorted(
            [c for c in "abcdefghijklmnopqrstuvwxyz0123456789"]
            + [c + EOW for c in "abcdefghijklmnopqrstuvwxyz0123456789"]
        )
        toks = list(specials) + base + [a + b for a, b in self.merges]
        out: dict = {}
        for t in toks:
            if t not in out:
                out[t] = len(out)
        return out

    def token_ids_expr(self, col, specials: Sequence[str] = ()) -> Column:
        """array<int> of token ids for a text column — the trainer-
        facing twin of :meth:`encode_expr`, fused into ONE Arrow pass
        (encode + id lookup share the per-batch word cache; ids
        assigned by :meth:`id_vocab`, the map is KBs, shipped by
        closure)."""
        vocab = self.id_vocab(specials)
        ranks = dict(self.ranks)

        @F.pandas_udf(T.ArrayType(T.IntegerType()))
        def _ids(texts: pd.Series) -> pd.Series:
            return _encode_series(texts, ranks, vocab)

        c = col if isinstance(col, Column) else F.col(col)
        return _ids(c)

    @staticmethod
    def decode_tokens(tokens: List[str]) -> str:
        """Inverse of encode for one token list (words rejoin at
        ``</w>`` boundaries, space-separated — the paper's convention;
        the original inter-word punctuation is not retained, matching
        the lossy lowercase+strip tokenize front end)."""
        text = "".join(tokens)
        return text.replace(EOW, " ").strip()


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int = 1000,
    max_distinct_words: Optional[int] = None,
) -> BPETokenizer:
    """Learn a BPE merge table from a corpus — ONE distributed pass.

    Plan: tokenize (pure expression) → explode → groupBy(word).count —
    a single shuffle producing the word-frequency table; the merge loop
    then runs driver-side over that table, which is exact (BPE only
    ever consumes pair counts weighted by word frequency, and the table
    IS those weights). ``max_distinct_words`` optionally keeps the top
    frequent words (deterministic (count desc, word) order) as a
    driver-memory bound for open-vocabulary corpora at 100 TB — the
    tail it drops are hapax words whose pairs almost never reach the
    merge threshold."""
    counts = (
        df.select(F.explode(tokenize(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    if max_distinct_words:
        counts = counts.orderBy(
            F.col("c").desc(), F.col("w").asc()
        ).limit(int(max_distinct_words))
    rows = counts.collect()
    # deterministic driver-side order regardless of shuffle layout
    table = sorted(((r["w"], r["c"]) for r in rows))
    return BPETokenizer(train_bpe_from_counts(table, num_merges))
