"""Expectations validator: each rule kind counts exactly, the report is
single-pass, and malformed rule sets are rejected."""

from __future__ import annotations

import pytest

from kinesis_vcr_spark.operators.validate import (
    expect_expr,
    expect_in_range,
    expect_in_set,
    expect_matches,
    expect_not_null,
    expect_unique,
    validate,
)


@pytest.fixture()
def messy(spark):
    rows = [
        (1, "click", 5.0, '{"k": 1}'),
        (2, "view", -1.0, '{"k": 2}'),      # range violation (lo=0)
        (2, "click", 10.0, "not-json"),     # dup id + pattern violation
        (4, "weird", 3.0, '{"k": 4}'),      # not in allowed set
        (None, "click", None, '{"k": 5}'),  # null id + null value
    ]
    return spark.createDataFrame(
        rows, "event_id long, event_type string, value double, props string"
    )


def test_each_rule_counts_exactly(messy):
    report = {
        r.rule: (r.violations, r.passed)
        for r in validate(
            messy,
            [
                expect_not_null("event_id"),
                expect_unique("event_id"),
                expect_in_range("value", lo=0.0, hi=100.0),
                expect_in_set("event_type", ["click", "view", "purchase"]),
                expect_matches("props", r"^\{.*\}$"),
                expect_expr("value_null_iff_id_null",
                            "(value IS NULL) = (event_id IS NULL)"),
            ],
        ).collect()
    }
    assert report["event_id_not_null"] == (1, False)
    assert report["event_id_unique"] == (1, False)       # one extra '2'
    assert report["value_in_range"] == (2, False)        # -1.0 and NULL
    assert report["event_type_in_set"] == (1, False)     # 'weird'
    assert report["props_matches"] == (1, False)         # 'not-json'
    assert report["value_null_iff_id_null"] == (0, True)
    rows = validate(messy, [expect_not_null("event_type")]).collect()
    assert rows[0].violations == 0 and rows[0].passed
    assert rows[0].n_rows == 5


def test_single_pass_plan(messy):
    """All rules ride ONE aggregation over ONE scan of the input."""
    import io
    from contextlib import redirect_stdout

    df = validate(
        messy,
        [
            expect_not_null("event_id"),
            expect_in_range("value", lo=0.0),
            expect_matches("props", r"^\{"),
        ],
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    # count leaves in the TREE section only (the detail section repeats
    # each node header once more)
    tree = plan.split("(1)")[0]
    assert tree.count("Scan") == 1
    assert "BatchEvalPython" not in plan


def test_bad_rule_sets_rejected(messy):
    with pytest.raises(ValueError, match="no expectations"):
        validate(messy, [])
    with pytest.raises(ValueError, match="duplicate"):
        validate(
            messy, [expect_not_null("event_id"), expect_not_null("event_id")]
        )
    with pytest.raises(ValueError, match="unknown expectation kind"):
        from kinesis_vcr_spark.operators.validate import Expectation

        validate(messy, [Expectation("x", "bogus", "event_id")]).collect()


def test_empty_input_passes_everything(spark):
    """0 rows violate nothing: violations must be 0 (not NULL) so both
    `passed` and `~passed` enforcement filters behave."""
    empty = spark.createDataFrame([], "event_id long, props string")
    rows = validate(
        empty,
        [expect_not_null("event_id"), expect_unique("event_id"),
         expect_matches("props", r"^\{")],
    ).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.violations == 0 and r.passed is True and r.n_rows == 0
