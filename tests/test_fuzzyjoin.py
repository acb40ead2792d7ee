"""Blocked fuzzy join (operators/fuzzyjoin.py): affix-blocking contract
+ exact Levenshtein verification."""

import pytest
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.fuzzyjoin import edit_distance_pairs


def _pairs(df):
    return sorted((r.id_a, r.id_b, r.dist) for r in df.collect())


def test_substitution_in_prefix_found_via_suffix(spark):
    rows = [
        (0, "alpha beta gamma delta"),
        (1, "Xlpha beta gamma delta"),  # sub at char 1: prefix breaks
        (2, "alpha beta gamma deltX"),  # sub at last char: suffix breaks
        (3, "completely different words"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = _pairs(edit_distance_pairs(df, "id", "t", max_dist=1))
    assert got == [(0, 1, 1), (0, 2, 1)]  # 1-2 differ in both affixes


def test_insertion_preserves_suffix_content(spark):
    # an early insertion shifts positions but the LAST 8 chars' content
    # is unchanged, so the suffix block still matches
    rows = [(0, "hello wonderful world"), (1, "Xhello wonderful world")]
    df = spark.createDataFrame(rows, "id long, t string")
    assert _pairs(edit_distance_pairs(df, "id", "t", max_dist=1)) == [
        (0, 1, 1)
    ]


def test_both_affixes_edited_is_contract_miss(spark):
    # distance 2 but both blocks broken: the documented bounded miss
    rows = [(0, "abcdefgh-middle-stuvwxyz"), (1, "Xbcdefgh-middle-stuvwxyZ")]
    df = spark.createDataFrame(rows, "id long, t string")
    assert _pairs(edit_distance_pairs(df, "id", "t", max_dist=2)) == []


def test_exact_duplicates_distance_zero(spark):
    rows = [(0, "same text here"), (1, "same text here"), (2, "same text here")]
    df = spark.createDataFrame(rows, "id long, t string")
    got = _pairs(edit_distance_pairs(df, "id", "t", max_dist=0))
    assert got == [(0, 1, 0), (0, 2, 0), (1, 2, 0)]


def test_short_strings_whole_text_block(spark):
    # texts shorter than affix_len: prefix == suffix == whole text on
    # both engines (substring clamps). Consequence of the contract: any
    # edit to a short string touches its only block, so only EXACT
    # short duplicates link — "cat"/"cut" is a documented miss (use a
    # smaller affix_len for short-string corpora).
    rows = [(0, "cat"), (1, "cut"), (2, "cat")]
    df = spark.createDataFrame(rows, "id long, t string")
    assert _pairs(edit_distance_pairs(df, "id", "t", max_dist=1)) == [
        (0, 2, 0)
    ]
    # with affix_len=1 the first-char block links cat/cut
    assert _pairs(
        edit_distance_pairs(df, "id", "t", max_dist=1, affix_len=1)
    ) == [(0, 1, 1), (0, 2, 0), (1, 2, 1)]


def test_length_band_prunes_before_distance(spark):
    rows = [(0, "aaaaaaaaaaaa"), (1, "aaaaaaaaaaaaXXXX")]  # len diff 4
    df = spark.createDataFrame(rows, "id long, t string")
    assert _pairs(edit_distance_pairs(df, "id", "t", max_dist=2)) == []


def test_block_member_cap_drops_degenerate_blocks(spark):
    # 30 records sharing both affixes: capped away entirely
    rows = [(i, f"prefixAA {i:02d} suffixZZ") for i in range(30)]
    df = spark.createDataFrame(rows, "id long, t string")
    capped = edit_distance_pairs(
        df, "id", "t", max_dist=2, block_member_cap=10
    )
    assert _pairs(capped) == []
    uncapped = edit_distance_pairs(
        df, "id", "t", max_dist=2, block_member_cap=None
    )
    assert len(_pairs(uncapped)) > 0


def test_validation(spark):
    df = spark.createDataFrame([(0, "x")], "id long, t string")
    with pytest.raises(ValueError, match="max_dist"):
        edit_distance_pairs(df, "id", "t", max_dist=-1)
    with pytest.raises(ValueError, match="affix_len"):
        edit_distance_pairs(df, "id", "t", affix_len=0)


def test_matches_naive_on_random_corpus(spark):
    """On a corpus whose close pairs never edit both affixes at once,
    blocked == naive all-pairs (the planted-fixture regime)."""
    import random

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "omega", "sigma"]
    base = [
        " ".join(rng.choice(vocab) for _ in range(6)) for _ in range(40)
    ]
    rows = [(i, t) for i, t in enumerate(base)]
    # mutate char 10 (mid-string: neither affix) of every 4th text
    rows += [
        (100 + i, t[:10] + "#" + t[11:])
        for i, t in enumerate(base)
        if i % 4 == 0
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = _pairs(edit_distance_pairs(df, "id", "t", max_dist=2))

    import itertools

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    naive = sorted(
        (x, y, lev(tx, ty))
        for (x, tx), (y, ty) in itertools.combinations(sorted(rows), 2)
        if lev(tx, ty) <= 2 and (tx[:8] == ty[:8] or tx[-8:] == ty[-8:])
    )
    # every naive pair here shares an affix (mid-string edits), so the
    # block rule loses nothing:
    assert got == naive
