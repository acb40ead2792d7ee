"""Batcher (reference B2) — exact OperatorBufferKinesisBatch semantics."""

from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis_vcr_spark.operators.batching import iter_batches


def test_count_limit_flush():
    payloads = [b"x"] * 1201
    batches = list(iter_batches(payloads, max_count=500, max_bytes=10**6))
    assert [len(b) for b in batches] == [500, 500, 201]


def test_byte_limit_flushes_partial_then_starts_fresh():
    # 3 records of 400 bytes with max 1000: [r1, r2] flushed, [r3] remains
    payloads = [b"a" * 400, b"b" * 400, b"c" * 400]
    batches = list(iter_batches(payloads, max_count=500, max_bytes=1000))
    assert [len(b) for b in batches] == [2, 1]
    assert batches[1] == [b"c" * 400]


def test_oversize_record_dropped_with_callback():
    dropped = []
    payloads = [b"ok", b"z" * 2000, b"ok2"]
    batches = list(
        iter_batches(payloads, max_count=500, max_bytes=1000, on_drop=dropped.append)
    )
    assert dropped == [b"z" * 2000]
    assert [p for b in batches for p in b] == [b"ok", b"ok2"]


def test_final_flush_of_remainder():
    assert list(iter_batches([b"a"], max_count=500, max_bytes=1000)) == [[b"a"]]


def test_empty_input_yields_nothing():
    assert list(iter_batches([], max_count=500, max_bytes=1000)) == []


def test_invalid_limits_raise():
    import pytest

    with pytest.raises(ValueError):
        list(iter_batches([b"a"], max_count=0))
    with pytest.raises(ValueError):
        list(iter_batches([b"a"], max_bytes=0))


@given(
    payloads=st.lists(st.binary(min_size=0, max_size=300), max_size=200),
    max_count=st.integers(min_value=1, max_value=10),
    max_bytes=st.integers(min_value=1, max_value=500),
)
@settings(max_examples=200, deadline=None)
def test_batching_invariants(payloads, max_count, max_bytes):
    """Every batch obeys both limits; no record lost except oversize drops;
    order preserved (the reference concatenates in buffer order)."""
    dropped = []
    batches = list(
        iter_batches(payloads, max_count, max_bytes, on_drop=dropped.append)
    )
    for b in batches:
        assert 1 <= len(b) <= max_count
        assert sum(len(p) for p in b) <= max_bytes
    flattened = [p for b in batches for p in b]
    assert flattened == [p for p in payloads if len(p) <= max_bytes]
    assert dropped == [p for p in payloads if len(p) > max_bytes]
