"""Emulated Kinesis source (streaming/kinesis_emulator.py): shard-log
semantics, offset resume across query runs, starting positions, and
the S1 e2e — put_records → emulated source → record_stream → archive."""

from __future__ import annotations

import base64
from datetime import datetime, timezone

import pytest

from kinesis_vcr_spark.config import VcrConfig
from kinesis_vcr_spark.streaming.kinesis_emulator import (
    _EmulatedKinesisStreamReader,
    create_stream,
    put_records,
    read_kinesis_emulated,
)
from kinesis_vcr_spark.streaming.record import record_stream

STREAM = "events-stream"
TS = datetime(2024, 3, 5, 12, 0, 0, tzinfo=timezone.utc)


def _put(endpoint, n, offset=0):
    return put_records(
        endpoint,
        STREAM,
        [
            (f"payload-{offset + i}".encode(), f"pk-{offset + i}")
            for i in range(n)
        ],
        arrival_ts=TS,
    )


def _reader(endpoint, starting="TRIM_HORIZON"):
    return _EmulatedKinesisStreamReader({
        "kinesis.streamname": STREAM,
        "kinesis.endpointdir": endpoint,
        "kinesis.startingposition": starting,
    })


def test_offsets_and_partitions(tmp_path):
    endpoint = str(tmp_path)
    create_stream(endpoint, STREAM, shards=4)
    _put(endpoint, 10)

    r = _reader(endpoint)
    start = r.initialOffset()
    assert set(start) == {f"shardId-{i:012d}" for i in range(4)}
    assert all(v == 0 for v in start.values())
    tips = r.latestOffset()
    assert sum(tips.values()) == 10

    parts = r.partitions(start, tips)
    rows = [row for p in parts for row in r.read(p)]
    assert len(rows) == 10
    assert {r_[0] for r_ in rows} == {f"payload-{i}".encode() for i in range(10)}
    # per-shard monotonic sequence numbers, shard ids well-formed
    by_shard: dict[str, list[int]] = {}
    for data, seq, pkey, shard, ts in rows:
        by_shard.setdefault(shard, []).append(int(seq))
        assert ts == TS.replace(tzinfo=None) or ts.year == 2024
    for seqs in by_shard.values():
        assert sorted(seqs) == list(range(min(seqs), max(seqs) + 1))

    # LATEST starts at the tip; AT_TIMESTAMP is the real connector's job
    assert _reader(endpoint, "LATEST").initialOffset() == tips
    with pytest.raises(NotImplementedError):
        _reader(endpoint, "AT_TIMESTAMP(2024-01-01)")


def test_same_partition_key_routes_to_same_shard(tmp_path):
    endpoint = str(tmp_path)
    create_stream(endpoint, STREAM, shards=4)
    put_records(endpoint, STREAM,
                [(b"a", "stable-key"), (b"b", "other")], arrival_ts=TS)
    put_records(endpoint, STREAM,
                [(b"c", "stable-key")], arrival_ts=TS)
    r = _reader(endpoint)
    rows = [
        row
        for p in r.partitions(r.initialOffset(), r.latestOffset())
        for row in r.read(p)
    ]
    shards = {data: shard for data, _, _, shard, _ in rows}
    assert shards[b"a"] == shards[b"c"]


def test_replay_into_emulated_kinesis(spark, tmp_path):
    """The other half of the loop: a recorded archive REPLAYED through
    the production K2 sink writer (500/1MB batching, retry shell) into
    the emulated stream — every archived payload lands exactly once,
    readable back through the emulated source."""
    from datetime import datetime as dt

    from kinesis_vcr_spark.play import replay
    from kinesis_vcr_spark.sinks.kinesis import kinesis_partition_writer
    from kinesis_vcr_spark.streaming.kinesis_emulator import (
        boto3_style_put_records_factory,
    )
    from kinesis_vcr_spark.sources.archive import write_archive
    from tests.test_archive import make_records

    endpoint = str(tmp_path / "aws")
    create_stream(endpoint, "replay-target", shards=3)

    arc = str(tmp_path / "arc")
    write_archive(make_records(spark, n=57, day="2024-03-05"), arc)

    writer = kinesis_partition_writer(
        "replay-target", boto3_style_put_records_factory(endpoint)
    )
    result = replay(
        spark, arc, dt(2024, 3, 5), dt(2024, 3, 6), writer,
        parallelism=4, mtime_filter=False,
    )
    assert (result.records_attempted, result.records_failed) == (57, 0)

    r = _EmulatedKinesisStreamReader({
        "kinesis.streamname": "replay-target",
        "kinesis.endpointdir": endpoint,
        "kinesis.startingposition": "TRIM_HORIZON",
    })
    rows = [
        row
        for p in r.partitions(r.initialOffset(), r.latestOffset())
        for row in r.read(p)
    ]
    assert len(rows) == 57
    landed = sorted(row[0] for row in rows)
    expected = sorted(
        row["data"]
        for row in make_records(spark, n=57, day="2024-03-05").collect()
    )
    assert landed == expected


def test_s1_e2e_record_stream_and_resume(spark, tmp_path):
    """The S1 loop the sandbox can run: PutRecords → emulated Kinesis
    source (same option contract as the production connector) →
    record_stream → base64 archive; a second query run against the
    same checkpoint resumes from the stored offsets (the checkpoint
    playing the KCL lease table) and archives ONLY the new records."""
    endpoint = str(tmp_path / "aws")
    create_stream(endpoint, STREAM, shards=4)
    _put(endpoint, 25)

    cfg = VcrConfig(
        archive_root=str(tmp_path / "bucket"),
        source_stream=STREAM,
        checkpoint_location=str(tmp_path / "ckpt"),
    )

    def drain():
        stream = read_kinesis_emulated(
            spark, endpoint, STREAM, "us-east-1",
            startingPosition="TRIM_HORIZON",
        )
        record_stream(stream, cfg, available_now=True).awaitTermination(300)

    def archived():
        out = set()
        for p in (tmp_path / "bucket").rglob("*.txt"):
            if p.is_file() and not p.name.startswith("."):
                out |= {
                    base64.b64decode(ln).decode()
                    for ln in p.read_text().splitlines() if ln
                }
        return out

    drain()
    assert archived() == {f"payload-{i}" for i in range(25)}

    # day 2: 10 more records; same checkpoint → only the delta lands
    _put(endpoint, 10, offset=25)
    drain()
    assert archived() == {f"payload-{i}" for i in range(35)}

    # LATEST from a fresh checkpoint: nothing to drain
    cfg2 = VcrConfig(
        archive_root=str(tmp_path / "bucket2"),
        source_stream=STREAM,
        checkpoint_location=str(tmp_path / "ckpt2"),
    )
    stream = read_kinesis_emulated(
        spark, endpoint, STREAM, "us-east-1", startingPosition="LATEST"
    )
    record_stream(stream, cfg2, available_now=True).awaitTermination(300)
    assert not (tmp_path / "bucket2").exists() or not [
        p for p in (tmp_path / "bucket2").rglob("*.txt")
    ]
