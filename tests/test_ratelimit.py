"""Token-bucket replay pacing (kinesis_vcr_spark/ratelimit.py, E106):
virtual-clock determinism for the bucket itself, the per-writer rate
split, and the paced kinesis writer end-to-end against a fake sink —
the same AWS-free discipline as the batching/retry tests."""

from __future__ import annotations

import pytest

from kinesis_vcr_spark.ratelimit import (
    PER_SHARD_BYTES_PER_S,
    TokenBucket,
    per_writer_rate,
)


class VirtualClock:
    def __init__(self):
        self.t = 0.0
        self.sleeps: list[float] = []

    def clock(self) -> float:
        return self.t

    def sleep(self, s: float) -> None:
        self.sleeps.append(s)
        self.t += s


def _bucket(rate, cap=None):
    vc = VirtualClock()
    return vc, TokenBucket(rate, cap, clock=vc.clock, sleep=vc.sleep)


def test_burst_then_exact_pacing():
    vc, b = _bucket(1000.0)  # 1000 B/s, capacity 1000
    assert b.acquire(600) == 0.0  # burst within capacity
    assert b.acquire(400) == 0.0  # exactly drains the bucket
    # next 500 must wait 0.5 s (deficit / rate), minted exactly
    assert b.acquire(500) == pytest.approx(0.5)
    assert vc.sleeps == [pytest.approx(0.5)]
    assert b.total_slept == pytest.approx(0.5)


def test_refill_restores_tokens():
    vc, b = _bucket(1000.0)
    b.acquire(1000)
    vc.t += 0.25  # 250 tokens refill
    assert b.acquire(250) == 0.0
    assert b.acquire(100) == pytest.approx(0.1)


def test_oversize_request_borrows():
    """A request above capacity is paced, not rejected: the wait is
    the full deficit at rate."""
    vc, b = _bucket(100.0, cap=50)
    assert b.acquire(250) == pytest.approx(2.0)  # (250-50)/100


def test_sustained_throughput_equals_rate():
    vc, b = _bucket(1_000_000.0)  # 1 MB/s
    total = 0
    for _ in range(50):
        b.acquire(900_000)
        total += 900_000
    # elapsed virtual time must be >= (total - capacity) / rate
    assert vc.t == pytest.approx((total - 1_000_000) / 1_000_000.0)


def test_validation():
    with pytest.raises(ValueError):
        TokenBucket(0)
    with pytest.raises(ValueError):
        TokenBucket(10, capacity_bytes=0)
    _, b = _bucket(10)
    with pytest.raises(ValueError):
        b.acquire(-1)


def test_per_writer_rate_matches_estimate_arithmetic():
    # 8 shards, 10 writers: aggregate 8 MB/s split evenly
    assert per_writer_rate(8, 10) == pytest.approx(
        8 * PER_SHARD_BYTES_PER_S / 10
    )
    with pytest.raises(ValueError):
        per_writer_rate(0, 10)


def test_paced_kinesis_writer_end_to_end():
    """The writer acquires each batch's WIRE byte size (data + UTF-8
    partition key — what AWS counts toward 1 MB/s/shard) before the
    put: with a virtual clock, delivering 3 MB of data at 1 MB/s
    sleeps ~2 s total plus the key overhead (the first MB rides the
    burst), and everything is delivered."""
    from kinesis_vcr_spark.sinks.kinesis import kinesis_partition_writer

    vc = VirtualClock()
    delivered = []

    def fake_put(StreamName, Records):
        delivered.extend(Records)
        return {"FailedRecordCount": 0}

    writer = kinesis_partition_writer(
        "s", lambda: fake_put,
        bucket_factory=lambda: TokenBucket(
            1_000_000.0, clock=vc.clock, sleep=vc.sleep
        ),
    )
    rows = [{"data": b"x" * 100_000} for _ in range(30)]  # 3 MB
    failed = writer(iter(rows))
    assert failed == 0
    assert len(delivered) == 30
    # wire bytes = 3 MB data + 30 UUID keys (36 B each), minus 1 MB burst
    key_bytes = sum(len(e["PartitionKey"].encode()) for e in delivered)
    assert key_bytes == 30 * 36
    assert vc.t == pytest.approx((3_000_000 + key_bytes - 1_000_000) / 1e6)


def test_entry_bytes_counts_data_plus_key():
    from kinesis_vcr_spark.sinks.kinesis import entry_bytes

    entries = [
        {"Data": b"abc", "PartitionKey": "k1"},
        {"Data": b"", "PartitionKey": "é"},  # 2-byte UTF-8 key
    ]
    assert entry_bytes(entries) == (3 + 2) + (0 + 2)


def test_retry_reacquires_tokens_for_resent_subset():
    """Records retried inside put_with_retry are re-sent on the wire,
    so each retry must re-acquire tokens for the still-pending subset
    — otherwise actual egress exceeds the per-writer budget under
    ProvisionedThroughputExceeded storms (the exact condition pacing
    exists to avoid)."""
    from kinesis_vcr_spark.sinks.kinesis import (
        entry_bytes,
        put_with_retry,
    )

    vc = VirtualClock()
    bucket = TokenBucket(1000.0, clock=vc.clock, sleep=vc.sleep)
    entries = [
        {"Data": b"a" * 500, "PartitionKey": "k1"},
        {"Data": b"b" * 300, "PartitionKey": "k2"},
    ]
    calls = []

    def flaky_put(StreamName, Records):
        calls.append(list(Records))
        if len(calls) == 1:
            # second record fails -> retried alone
            return {
                "FailedRecordCount": 1,
                "Records": [{}, {"ErrorCode": "InternalFailure"}],
            }
        return {"FailedRecordCount": 0, "Records": [{} for _ in Records]}

    # caller acquires for the first attempt (mirrors the writer)
    bucket.acquire(entry_bytes(entries))
    failed = put_with_retry(
        flaky_put, "s", entries, budget_seconds=30.0, bucket=bucket
    )
    assert failed == 0
    assert [len(c) for c in calls] == [2, 1]
    # total minted tokens = first attempt (804) + retried subset (302);
    # bucket capacity 1000 covers the burst, the rest is slept
    resent = entry_bytes([entries[1]])
    assert resent == 302
    expected_wait = (entry_bytes(entries) + resent - 1000) / 1000.0
    assert bucket.total_slept == pytest.approx(expected_wait)
