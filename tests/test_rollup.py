"""Incremental mergeable rollup (operators/rollup.py): any split of
the input, rolled up part-by-part and merged, must equal the direct
single-pass rollup bit-for-bit — scalars AND the HLL estimate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.rollup import (
    build_rollup,
    merge_rollups,
    rollup_report,
)
from kinesis_vcr_spark.tables import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").localCheckpoint()


def _report_rows(rollup):
    return sorted(
        tuple(r) for r in rollup_report(rollup).collect()
    )


def test_three_way_split_equals_direct(events):
    direct = build_rollup(
        events, "ts_ns", ["event_type"], ["value"], "user_id"
    )
    parts = [
        build_rollup(
            events.where(F.pmod("event_id", F.lit(3)) == i),
            "ts_ns",
            ["event_type"],
            ["value"],
            "user_id",
        )
        for i in range(3)
    ]
    assert _report_rows(merge_rollups(*parts)) == _report_rows(direct)


def test_merge_is_order_insensitive(events):
    parts = [
        build_rollup(
            events.where(F.pmod("event_id", F.lit(2)) == i),
            "ts_ns",
            ["event_type"],
            ["value"],
            "user_id",
        )
        for i in range(2)
    ]
    ab = _report_rows(merge_rollups(parts[0], parts[1]))
    ba = _report_rows(merge_rollups(parts[1], parts[0]))
    assert ab == ba


def test_merge_with_empty_part_is_identity(events):
    full = build_rollup(
        events, "ts_ns", ["event_type"], ["value"], "user_id"
    )
    empty = build_rollup(
        events.where(F.lit(False)),
        "ts_ns",
        ["event_type"],
        ["value"],
        "user_id",
    )
    assert _report_rows(merge_rollups(full, empty)) == _report_rows(full)


def test_grain_mismatch_rejected(events):
    a = build_rollup(events, "ts_ns", ["event_type"], ["value"], "user_id")
    b = build_rollup(events, "ts_ns", [], ["value"], "user_id")
    with pytest.raises(ValueError):
        merge_rollups(a, b)
    with pytest.raises(ValueError):
        merge_rollups()


def test_register_state_is_bounded(events):
    r = build_rollup(events, "ts_ns", ["event_type"], ["value"], "user_id")
    per_group = (
        r.registers.groupBy("day", "event_type")
        .agg(F.count("*").alias("c"))
        .agg(F.max("c"))
        .first()[0]
    )
    assert per_group <= 256  # ≤ m rows per (day, key) regardless of input
