"""CLI verb dispatch (KinesisVcr.java:33-71 equivalent)."""

from __future__ import annotations

import pytest

from kinesis_vcr_spark.__main__ import _parse_range, main


def test_parse_range_date_and_datetime():
    start, end = _parse_range(["2024-01-01", "2024-01-02T06:30:00"], "play")
    assert start.isoformat() == "2024-01-01T00:00:00"
    assert end.isoformat() == "2024-01-02T06:30:00"


def test_parse_range_missing_end_defaults_later():
    start, end = _parse_range(["2024-01-01"], "play")
    assert end is None  # default_end applies downstream


def test_parse_range_bad_start_exits():
    with pytest.raises(SystemExit):
        _parse_range(["not-a-date"], "estimate")
    with pytest.raises(SystemExit):
        _parse_range([], "estimate")


def test_unknown_verb(monkeypatch):
    monkeypatch.setenv("VCR_BUCKET", "/tmp/nowhere")
    monkeypatch.setenv("VCR_SOURCE_STREAM", "events")
    assert main(["frobnicate"]) == 2


def test_estimate_manifest_flag_requires_path(monkeypatch):
    monkeypatch.setenv("VCR_BUCKET", "/tmp/nowhere")
    monkeypatch.setenv("VCR_SOURCE_STREAM", "events")
    from kinesis_vcr_spark.__main__ import main

    assert main(["estimate", "--manifest"]) == 2


def test_usage_error_paths_leave_session_conf_alone(spark, monkeypatch):
    """main() must not spin up (or mutate) Spark before arguments are
    validated: get_spark's builder.getOrCreate() on an existing session
    applies its conf as RUNTIME conf — an unknown-verb call used to
    flip spark.sql.shuffle.partitions for the rest of the session."""
    monkeypatch.setenv("VCR_BUCKET", "/tmp/nowhere")
    monkeypatch.setenv("VCR_SOURCE_STREAM", "events")
    before = spark.conf.get("spark.sql.shuffle.partitions")
    assert main(["frobnicate"]) == 2
    assert main(["estimate", "--manifest"]) == 2
    with pytest.raises(SystemExit):
        main(["estimate", "not-a-date"])
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
