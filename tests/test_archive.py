"""Archive write/read roundtrip + range semantics on a local filesystem
(stands in for S3 — Spark file sources are URI-agnostic; SURVEY.md §5)."""

import os
from datetime import datetime, timedelta

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kinesis_vcr_spark.model import RECORD_SCHEMA
from kinesis_vcr_spark.sources.archive import (
    archive_listing,
    read_archive,
    read_archive_lines,
    write_archive,
)


def make_records(spark, n=40, payload=b"\x00" * 400, day="2024-03-05"):
    """Reference Test-1 shaped fixture: n identical fixed-size payloads
    (KinesisRecorderTest.java:119-128 uses 10 x 40,000 zero bytes)."""
    base = datetime.fromisoformat(day)
    rows = [
        Row(
            data=payload,
            sequence_number=str(i).zfill(20),
            partition_key=f"pk-{i}",
            shard_id="shardId-000000000000",
            arrival_ts=base + timedelta(seconds=i),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, RECORD_SCHEMA)


@pytest.fixture
def archive(spark, tmp_path):
    path = str(tmp_path / "archive" / "events")
    write_archive(make_records(spark, n=40, day="2024-03-05"), path)
    write_archive(make_records(spark, n=10, day="2024-03-06"), path)
    return path


def test_roundtrip_byte_identity(spark, archive):
    """Reference Test 1 oracle: what goes in comes out, bytes exact."""
    got = read_archive(
        spark, archive, datetime(2024, 3, 5), datetime(2024, 3, 7), mtime_filter=False
    )
    payloads = [r["data"] for r in got.collect()]
    assert len(payloads) == 50
    assert all(p == b"\x00" * 400 for p in payloads)


def test_partition_pruning_by_dt(spark, archive):
    """F2: only day folders inside the range are read."""
    one_day = read_archive_lines(
        spark, archive, datetime(2024, 3, 6), datetime(2024, 3, 7), mtime_filter=False
    )
    assert one_day.count() == 10
    # only files under the in-range partition are touched
    files = {r["file_path"] for r in one_day.select("file_path").distinct().collect()}
    assert files and all("dt=2024-03-06" in f for f in files)


def test_archive_lines_are_base64_of_payload(spark, archive):
    """Reference Test 2 oracle: archive line k == base64(payload_k)."""
    import base64

    lines = read_archive_lines(
        spark, archive, datetime(2024, 3, 5), datetime(2024, 3, 7), mtime_filter=False
    )
    expected = base64.b64encode(b"\x00" * 400).decode()
    vals = [r["value"] for r in lines.collect()]
    assert len(vals) == 50
    assert all(v == expected for v in vals)


def test_mtime_filter_strictly_exclusive(spark, tmp_path):
    """F3: start < mtime < end at second granularity; boundary EXCLUDED."""
    path = str(tmp_path / "arc")
    write_archive(make_records(spark, n=5, day="2024-03-05"), path)
    # pin every data file's mtime to a known second
    pinned = datetime(2024, 3, 5, 12, 0, 0)
    epoch = pinned.timestamp()
    for root, _, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                os.utime(os.path.join(root, f), (epoch, epoch))

    def count(start, end):
        return read_archive_lines(spark, path, start, end, mtime_filter=True).count()

    # mtime strictly inside → included
    assert count(pinned - timedelta(seconds=1), pinned + timedelta(seconds=1)) == 5
    # mtime == start → EXCLUDED (strict >)
    assert count(pinned, pinned + timedelta(hours=1)) == 0
    # mtime == end → EXCLUDED (strict <)
    assert count(pinned - timedelta(hours=1), pinned) == 0


def test_empty_lines_skipped(spark, tmp_path):
    """F7: zero-length lines between records are dropped."""
    d = tmp_path / "arc2" / "dt=2024-03-05"
    d.mkdir(parents=True)
    (d / "part-0.txt").write_text("YQ==\n\nYg==\n\n\n")
    got = read_archive(
        spark,
        str(tmp_path / "arc2"),
        datetime(2024, 3, 5),
        datetime(2024, 3, 6),
        mtime_filter=False,
    )
    assert sorted(r["data"] for r in got.collect()) == [b"a", b"b"]


def test_inverted_range_rejected(spark, archive):
    with pytest.raises(ValueError):
        read_archive(spark, archive, datetime(2024, 3, 7), datetime(2024, 3, 5))


def test_default_end_single_day(spark, archive):
    """F4: end=None covers exactly start's day (start+1d-1s)."""
    got = read_archive(spark, archive, datetime(2024, 3, 5), None, mtime_filter=False)
    assert got.count() == 40


def test_listing_is_metadata_only_and_filters(spark, archive):
    listing = archive_listing(
        spark, archive, datetime(2024, 3, 5), datetime(2024, 3, 7), mtime_filter=False
    )
    rows = listing.collect()
    assert all(r["file_size"] > 0 for r in rows)
    days = {str(r["dt"]) for r in rows}
    assert days == {"2024-03-05", "2024-03-06"}
