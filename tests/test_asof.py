"""As-of join semantics: backward/forward direction, exact matches,
tolerance nulling, missing-match nulls — checked against hand-computed
expectations (pd.merge_asof parity cases)."""

from __future__ import annotations

from kinesis_vcr_spark.operators.asof import asof_join
import pytest


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "k", 100), (2, "k", 205), (3, "k", 300), (4, "x", 50)],
        "lid long, key string, ts long",
    )
    right = spark.createDataFrame(
        [("k", 100, "a"), ("k", 200, "b"), ("k", 400, "c")],
        "key string, ts long, val string",
    )
    return left, right


def _run(spark, **kw):
    left, right = _frames(spark)
    rows = asof_join(
        left, right, on="key", left_ts="ts", right_ts="ts",
        right_value_cols=["val"], **kw,
    ).collect()
    return {r["lid"]: r["val_right"] for r in rows}


def test_backward_exact_allowed(spark):
    got = _run(spark)
    # lid1@100 matches right@100 exactly; lid2@205 -> right@200;
    # lid3@300 -> right@200 (400 is later); key x has no rights -> null
    assert got == {1: "a", 2: "b", 3: "b", 4: None}


def test_forward_exact_allowed(spark):
    got = _run(spark, direction="forward")
    # lid1@100 matches right@100 (exact, not 200); lid2@205 -> 400;
    # lid3@300 -> 400; x -> null
    assert got == {1: "a", 2: "c", 3: "c", 4: None}


def test_backward_tolerance(spark):
    got = _run(spark, tolerance=10)
    # lid3@300 is 100 away from right@200 -> nulled
    assert got == {1: "a", 2: "b", 3: None, 4: None}


def test_forward_tolerance(spark):
    got = _run(spark, direction="forward", tolerance=100)
    # lid2@205 -> right@400 is 195 away -> nulled; lid3@300 -> 400 kept
    assert got == {1: "a", 2: None, 3: "c", 4: None}


def test_bad_direction_raises(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="direction"):
        asof_join(
            left, right, on="key", left_ts="ts", right_ts="ts",
            right_value_cols=["val"], direction="nearest",
        )
