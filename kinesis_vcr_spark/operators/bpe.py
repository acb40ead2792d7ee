"""Byte-pair-encoding vocabulary training and tokenization, Spark-first.

The canonical scalable BPE recipe (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units"; the GPT-2
tokenizer trains the same way): BPE statistics depend only on the
corpus's **word-frequency dictionary**, not on the corpus itself — so

1. **aggregate**: one distributed ``explode → groupBy(word) → count``
   pass reduces a 100 TB corpus to a word-type dict (10⁵–10⁷ rows —
   Heaps' law, corpus-size-*sub*linear);
2. **train**: the merge loop runs over that dict in driver memory —
   each iteration counts adjacent symbol pairs weighted by word
   frequency and merges the argmax pair.  This is exact, cheap
   (seconds for 10⁴ merges), and is how every production tokenizer
   trains; distributing the loop itself would shuffle per merge for no
   benefit;
3. **encode**: applying the learned merge ranks is embarrassingly
   parallel — an Arrow-batched Pandas UDF with the merge table held in
   a broadcast-sized dict (≤ num_merges entries).

Determinism: ties in pair counts break on the lexicographically
smallest pair, so the same corpus always yields the same vocabulary on
any engine or partitioning.

Scale posture: one shuffle (the word-frequency groupBy, map-side
combinable) + one narrow Pandas-UDF stage for encode.  The driver holds
the word dict — bounded by vocabulary, not data; for corpora whose
type count explodes (code, URLs), cap it with ``min_count``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

#: end-of-word marker appended to each word's final symbol (Sennrich
#: §3.2) — lets a merge distinguish "low" the word from "low-" the
#: prefix, and makes decoding unambiguous.
END = "</w>"


def word_frequencies(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """The distributed half of training: ``(word, freq)`` over the
    corpus.  One explode + one map-side-combinable groupBy."""
    out = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    if min_count > 1:
        out = out.where(F.col("freq") >= min_count)
    return out


def _word_symbols(word: str) -> tuple[str, ...]:
    if not word:
        return ()
    chars = list(word)
    chars[-1] = chars[-1] + END
    return tuple(chars)


def train_bpe(
    word_freqs: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """The merge loop, exact over a word-frequency dict.

    Pure Python on purpose (see module docstring): the dict is
    vocabulary-sized, and each iteration is O(types).  Returns merges
    in rank order; stops early when no pair occurs twice.
    """
    vocab: dict[tuple[str, ...], int] = {}
    for w, f in word_freqs:
        sym = _word_symbols(w)
        if sym:
            vocab[sym] = vocab.get(sym, 0) + f

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, f in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        # deterministic argmax: highest count, then smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, f in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges


def train_bpe_distributed(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    min_count: int = 1,
) -> list[tuple[str, str]]:
    """End-to-end training: distributed word-frequency aggregate, then
    the driver-side merge loop over the (vocabulary-sized) result."""
    freqs = [
        (r["word"], r["freq"])
        for r in word_frequencies(df, text_col, min_count).collect()
    ]
    return train_bpe(freqs, num_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge application (the standard BPE
    encoder): repeatedly merge the present pair with the smallest
    training rank until none applies."""
    sym = list(_word_symbols(word))
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_tokens(
    merges: list[tuple[str, str]], text_col: str | Column = "text"
) -> Column:
    """Column expression: BPE token array for a text column.

    Arrow-batched Pandas UDF; the merge-rank dict (≤ num_merges
    entries) ships once per executor in the serialized closure —
    broadcast-sized by construction.
    """
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def _encode(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks: list[str] = []
            if t:
                for w in t.split(" "):
                    if w:
                        toks.extend(encode_word(w, ranks))
            out.append(toks)
        return pd.Series(out)

    return _encode(F.col(text_col) if isinstance(text_col, str) else text_col)
