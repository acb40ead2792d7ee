"""Exact prefix-filtered similarity join (operators/setjoin.py)."""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.setjoin import jaccard_join_exact


def _df(spark, sets):
    return spark.createDataFrame(
        [(i, list(s)) for i, s in enumerate(sets)],
        "id long, toks array<string>",
    )


def _pairs(df):
    return {
        (r["id_a"], r["id_b"]): (r["inter"], r["uni"]) for r in df.collect()
    }


def _naive(sets, pct):
    out = {}
    for a, b in itertools.combinations(range(len(sets)), 2):
        sa, sb = set(sets[a]), set(sets[b])
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        uni = len(sa | sb)
        if 100 * inter >= pct * uni:
            out[(a, b)] = (inter, uni)
    return out


def test_identical_and_disjoint(spark):
    sets = [["a", "b", "c"], ["a", "b", "c"], ["x", "y", "z"]]
    got = _pairs(jaccard_join_exact(_df(spark, sets), "id", "toks", 80))
    assert got == {(0, 1): (3, 3)}


def test_exact_threshold_boundary_inclusive(spark):
    # J = 2/4 = exactly 0.50: included at pct=50, excluded at pct=51 —
    # the integer-arithmetic boundary contract
    sets = [["a", "b", "c"], ["a", "b", "d"]]
    assert _pairs(
        jaccard_join_exact(_df(spark, sets), "id", "toks", 50)
    ) == {(0, 1): (2, 4)}
    assert (
        jaccard_join_exact(_df(spark, sets), "id", "toks", 51).count() == 0
    )


def test_duplicate_tokens_are_set_semantics(spark):
    sets = [["a", "a", "a", "b"], ["a", "b", "b"]]
    got = _pairs(jaccard_join_exact(_df(spark, sets), "id", "toks", 99))
    assert got == {(0, 1): (2, 2)}


def test_empty_sets_never_pair(spark):
    sets = [[], [], ["a"]]
    assert jaccard_join_exact(_df(spark, sets), "id", "toks", 10).count() == 0


def test_completeness_vs_naive_random(spark):
    # the exact-recall guarantee: prefix filtering loses NO qualifying
    # pair on a random corpus, at several thresholds
    rnd = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    sets = [
        rnd.sample(vocab, rnd.randrange(3, 15)) for _ in range(60)
    ]
    df = _df(spark, sets)
    for pct in (30, 50, 80):
        got = _pairs(jaccard_join_exact(df, "id", "toks", pct))
        assert got == _naive(sets, pct), f"mismatch at pct={pct}"


def test_threshold_validation(spark):
    df = _df(spark, [["a"]])
    with pytest.raises(ValueError):
        jaccard_join_exact(df, "id", "toks", 0)
    with pytest.raises(ValueError):
        jaccard_join_exact(df, "id", "toks", 101)


def test_hot_token_stays_out_of_prefixes(spark):
    # a stopword shared by every doc must NOT make everything a
    # candidate: rarest-first ordering keeps it out of prefixes when
    # rarer tokens exist, so disjoint-but-for-the-stopword docs pair
    # only if the threshold admits them (here it doesn't)
    sets = [["the", f"u{i}", f"v{i}", f"w{i}"] for i in range(20)]
    got = jaccard_join_exact(_df(spark, sets), "id", "toks", 50)
    assert got.count() == 0


def test_plan_no_cartesian_no_python(spark):
    df = _df(spark, [["a", "b"], ["a", "c"], ["d", "e"]])
    plan = (
        jaccard_join_exact(df, "id", "toks", 50)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "PythonUDF" not in plan and "ArrowEvalPython" not in plan
