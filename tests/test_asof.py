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


def test_matches_pandas_merge_asof_on_random_frames(spark):
    """Property: asof_join == pd.merge_asof on random keyed frames,
    including NULL right-value fields (the ADVICE r02 bug: a NULL field
    of the matched row must NOT be backfilled from an older row — all
    carried columns must come from the same matched right row)."""
    import random

    import pandas as pd

    rng = random.Random(7)
    for trial in range(4):
        direction = ("backward", "forward")[trial % 2]
        tolerance = (None, 50)[trial // 2]
        lrows = [
            (i, f"k{rng.randrange(3)}", rng.randrange(0, 500))
            for i in range(40)
        ]
        # unique (key, ts) on the right, as asof_join requires
        seen = set()
        rrows = []
        for j in range(30):
            key, ts = f"k{rng.randrange(3)}", rng.randrange(0, 500)
            if (key, ts) in seen:
                continue
            seen.add((key, ts))
            # v1 sometimes NULL while v2 is set -> catches column mixing
            v1 = None if rng.random() < 0.4 else j
            rrows.append((key, ts, v1, j * 10))
        left = spark.createDataFrame(lrows, "lid long, key string, ts long")
        right = spark.createDataFrame(
            rrows, "key string, ts long, v1 long, v2 long"
        )
        got = {
            r["lid"]: (r["v1_r"], r["v2_r"])
            for r in asof_join(
                left, right, on="key", left_ts="ts", right_ts="ts",
                right_value_cols=["v1", "v2"], suffix="_r",
                direction=direction, tolerance=tolerance,
            ).collect()
        }

        lpd = pd.DataFrame(lrows, columns=["lid", "key", "ts"]).sort_values("ts")
        rpd = pd.DataFrame(
            rrows, columns=["key", "ts", "v1", "v2"]
        ).sort_values("ts")
        merged = pd.merge_asof(
            lpd, rpd, on="ts", by="key", direction=direction,
            tolerance=tolerance, suffixes=("", "_r"),
        )
        want = {
            int(r.lid): (
                None if pd.isna(r.v1) else int(r.v1),
                None if pd.isna(r.v2) else int(r.v2),
            )
            for r in merged.itertuples()
        }
        assert got == want, f"direction={direction} tolerance={tolerance}"
