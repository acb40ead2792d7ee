"""BPE trainer/encoder tests (operators/bpe.py): hand-worked merges,
decode roundtrip, determinism, and the distributed aggregate path."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.bpe import (
    END,
    bpe_tokens,
    encode_word,
    train_bpe,
    train_bpe_distributed,
    word_frequencies,
)


def test_train_bpe_hand_worked():
    # classic Sennrich example shape: {"low":5, "lower":2}
    merges = train_bpe([("low", 5), ("lower", 2)], 10)
    # 'l o' occurs 7x -> first merge ('l','o'); then ('lo','w</w>') 5x
    # vs ('lo','w') 2x ... ('lo','w</w>') wins
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", f"w{END}")


def test_encode_uses_rank_order():
    merges = train_bpe([("low", 5), ("lower", 2)], 10)
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("low", ranks) == [f"low{END}"]
    # unseen word falls back to chars + learned prefixes
    toks = encode_word("lowest", ranks)
    assert "".join(toks).replace(END, "") == "lowest"


def test_tie_break_deterministic():
    # "ab" and "cd" each occur once -> all pairs count 1 -> stop (<2)
    assert train_bpe([("ab", 1), ("cd", 1)], 5) == []
    # equal counts >= 2 -> lexicographically smallest pair first
    merges = train_bpe([("ab", 2), ("cd", 2)], 1)
    assert merges == [("a", f"b{END}")]


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.text(alphabet="abcd", min_size=1, max_size=6),
                  st.integers(min_value=1, max_value=9)),
        min_size=1, max_size=8,
    ),
    st.integers(min_value=0, max_value=20),
)
def test_encode_roundtrip_property(freqs, n_merges):
    """Concatenating a word's BPE tokens always reconstructs the word
    (+ end marker) — merges never lose or reorder characters."""
    merges = train_bpe(freqs, n_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in freqs:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + END


def test_distributed_matches_local(spark):
    rows = [("low low low lower",), ("lowest low newer",), ("low lower",)]
    df = spark.createDataFrame(rows, ["text"])
    merges = train_bpe_distributed(df, "text", num_merges=6)
    # local reference over the same word counts
    from collections import Counter

    counts = Counter(w for (t,) in rows for w in t.split(" "))
    assert merges == train_bpe(sorted(counts.items()), 6)


def test_word_frequencies_plan_is_partial_agg(spark):
    df = spark.createDataFrame([("a b a",)], ["text"])
    plan = word_frequencies(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2  # map-side combine


def test_bpe_tokens_column(spark):
    df = spark.createDataFrame([("low lower",), ("",)], ["text"])
    merges = train_bpe([("low", 5), ("lower", 2)], 10)
    got = df.select(bpe_tokens(merges).alias("toks")).collect()
    assert got[0]["toks"][0] == f"low{END}"
    assert got[1]["toks"] == []


def test_corpus_token_count_decreases_with_merges(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    m0 = train_bpe_distributed(docs, "text", num_merges=0)
    m20 = train_bpe_distributed(docs, "text", num_merges=20)
    n0 = docs.select(F.explode(bpe_tokens(m0)).alias("t")).count()
    n20 = docs.select(F.explode(bpe_tokens(m20)).alias("t")).count()
    assert n20 < n0
