"""Backoff runner (X1) + config validation (VcrConfiguration semantics)."""

import pytest

from kinesis_vcr_spark.config import VcrConfig
from kinesis_vcr_spark.retry import run_with_backoff
from kinesis_vcr_spark.sinks.kinesis import PartialFailure, put_with_retry


class FakeClock:
    def __init__(self):
        self.t = 0.0
        self.sleeps = []

    def now(self):
        return self.t

    def sleep(self, s):
        self.sleeps.append(s)
        self.t += s


def test_backoff_schedule_doubles_and_clamps():
    clock = FakeClock()
    attempts = []

    def task():
        attempts.append(1)
        raise RuntimeError("always")

    result = run_with_backoff(
        task,
        should_retry=lambda e: True,
        budget_seconds=10.0,
        clock=clock.now,
        sleep=clock.sleep,
    )
    assert result is None  # budget exhausted → Optional.empty()
    # 1, 2, 4 then clamp to remaining 3 (ExponentialBackoffRunner.java:37-41)
    assert clock.sleeps == [1.0, 2.0, 4.0, 3.0]


def test_backoff_nonretryable_raises():
    with pytest.raises(KeyError):
        run_with_backoff(
            lambda: (_ for _ in ()).throw(KeyError("nope")),
            should_retry=lambda e: isinstance(e, RuntimeError),
            budget_seconds=5.0,
        )


def test_backoff_success_returns_value():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return 42

    clock = FakeClock()
    assert (
        run_with_backoff(flaky, lambda e: True, 60.0, clock=clock.now, sleep=clock.sleep)
        == 42
    )


def test_put_with_retry_resubmits_only_failed_entries():
    """K3: partial failure rebuilds the request with failed entries only
    (KinesisPlayer.java:131-144)."""
    calls = []

    def fake_put(StreamName, Records):
        calls.append(list(Records))
        if len(calls) == 1:  # fail records 1 and 3 on first attempt
            return {
                "FailedRecordCount": 2,
                "Records": [
                    {"SequenceNumber": "1"},
                    {"ErrorCode": "ProvisionedThroughputExceededException"},
                    {"SequenceNumber": "2"},
                    {"ErrorCode": "InternalFailure"},
                ],
            }
        return {"FailedRecordCount": 0, "Records": [{} for _ in Records]}

    entries = [{"Data": bytes([i]), "PartitionKey": str(i)} for i in range(4)]
    assert put_with_retry(fake_put, "target", entries, budget_seconds=5.0) == 0
    assert len(calls) == 2
    assert calls[1] == [entries[1], entries[3]]


def test_partial_failure_carries_entries():
    exc = PartialFailure([{"Data": b"x"}])
    assert exc.failed_entries == [{"Data": b"x"}]


def test_config_validation():
    with pytest.raises(ValueError):
        VcrConfig(archive_root="", source_stream="s")
    with pytest.raises(ValueError):
        VcrConfig(archive_root="/a", source_stream="")
    with pytest.raises(ValueError):
        VcrConfig(archive_root="/a", source_stream="s", buffer_size_bytes=0)
    cfg = VcrConfig(archive_root="/a/", source_stream="s")
    assert cfg.archive_path == "/a/s"


def test_config_from_env_defaults():
    cfg = VcrConfig.from_env(
        {"VCR_BUCKET": "/data", "VCR_SOURCE_STREAM": "events"}
    )
    assert cfg.buffer_size_bytes == 1024 * 1024 * 100  # 100 MB default
    assert cfg.buffer_time_millis == 60_000  # 60 s default
    assert cfg.target_stream is None
