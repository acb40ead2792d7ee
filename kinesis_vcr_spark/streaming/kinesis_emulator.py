"""Emulated Kinesis streaming source — a pure-Python Spark DataSource
that closes the S1 test gap.

The reference's record side consumes a LIVE Kinesis stream through the
KCL (kinesis-vcr/src/main/java/com/scopely/infrastructure/kinesis/
KinesisRecorder.java:23-49); this sandbox has no AWS, so until now S1
was wiring plus an option-contract test. PySpark 4's Python DataSource
API makes the next-best thing possible: a REAL Structured Streaming
source, exercised through the SAME reader-option contract
(:func:`kinesis_vcr_spark.streaming.record.kinesis_reader_options`),
that reads a local shard-log directory emulating Kinesis semantics —

- one directory per shard (``shardId-000000000000`` naming),
- per-shard strictly-monotonic integer sequence numbers,
- a PutRecords-style writer that routes records to shards by md5 of
  the partition key (Kinesis's hash-range routing, collapsed to mod),
- ``TRIM_HORIZON`` / ``LATEST`` starting positions with offsets
  tracked per shard (the query checkpoint plays the KCL lease table,
  exactly as the production wiring documents),
- one InputPartition PER SHARD per micro-batch → shard-parallel reads,
  the emulated analogue of KCL shard workers (P3).

Out of scope, documented: resharding (split/merge — the emulator's
shard set is fixed after creation), AT_TIMESTAMP (raises), and
enhanced fan-out. The production path stays
``read_kinesis_stream`` + the connector jar; swapping source format
strings is the ONLY difference between the two, which is the point.
Python stream sources don't implement Trigger.AvailableNow — Spark
logs a fallback to single-batch execution, which drains everything up
to the offset captured at query start (exactly what the tests need;
a long-running production query uses processing-time triggers anyway).

Batch output rows match ``model.RECORD_SCHEMA`` exactly, so
``record_stream`` consumes the emulator unchanged (the e2e test drives
put_records → emulated source → record_stream → archive).
"""

from __future__ import annotations

import hashlib
import json
import os
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

EMULATED_SOURCE_NAME = "kinesis-emulated"
_SHARD_FMT = "shardId-{:012d}"


# ---------------------------------------------------------------------------
# writer side (test/fixture surface — PutRecords semantics)
# ---------------------------------------------------------------------------


def create_stream(endpoint_dir: str, stream_name: str, shards: int) -> None:
    """CreateStream: materialize the shard directories."""
    for i in range(shards):
        os.makedirs(
            os.path.join(endpoint_dir, stream_name, _SHARD_FMT.format(i)),
            exist_ok=True,
        )


def _shard_dirs(endpoint_dir: str, stream_name: str) -> list[str]:
    root = os.path.join(endpoint_dir, stream_name)
    return sorted(
        os.path.join(root, d)
        for d in os.listdir(root)
        if d.startswith("shardId-")
    )


def _next_seq(shard_dir: str) -> int:
    seqs = [
        int(f.split("-")[-1].split(".")[0])
        for f in os.listdir(shard_dir)
        if f.endswith(".jsonl")
    ]
    return (max(seqs) + 1) if seqs else 0


def put_records(
    endpoint_dir: str,
    stream_name: str,
    records: list[tuple[bytes, str]],
    arrival_ts: datetime | None = None,
) -> int:
    """PutRecords: route each ``(data, partition_key)`` to a shard by
    md5(partition_key) (hash-range routing mod shard count), assign
    per-shard monotonic sequence numbers, append one JSONL file per
    (shard, call). Returns the number of records written."""
    import base64

    shard_dirs = _shard_dirs(endpoint_dir, stream_name)
    if not shard_dirs:
        raise ValueError(
            f"stream {stream_name!r} does not exist under {endpoint_dir} "
            "(create_stream first)"
        )
    ts = (arrival_ts or datetime.now(tz=timezone.utc)).isoformat()
    by_shard: dict[str, list] = {}
    for data, pkey in records:
        h = int.from_bytes(hashlib.md5(pkey.encode()).digest()[:8], "big")
        by_shard.setdefault(shard_dirs[h % len(shard_dirs)], []).append(
            (data, pkey)
        )
    for shard_dir, recs in by_shard.items():
        # per-shard flock: concurrent writers (replay runs one sink
        # writer per partition) must see gap-free monotonic sequences
        import fcntl  # noqa: PLC0415

        with open(os.path.join(shard_dir, ".lock"), "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            first = _next_seq(shard_dir)
            last = first + len(recs) - 1
            path = os.path.join(shard_dir, f"{first:020d}-{last:020d}.jsonl")
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                for i, (data, pkey) in enumerate(recs):
                    f.write(json.dumps({
                        "seq": first + i,
                        "data_b64": base64.b64encode(data).decode(),
                        "partition_key": pkey,
                        "arrival_ts": ts,
                    }) + "\n")
            os.replace(tmp, path)  # atomic: readers never see partials
    return len(records)


# ---------------------------------------------------------------------------
# reader side (the streaming DataSource)
# ---------------------------------------------------------------------------


class _ShardSlice(InputPartition):
    def __init__(self, shard_dir: str, shard_id: str, start: int, end: int):
        self.shard_dir = shard_dir
        self.shard_id = shard_id
        self.start = start
        self.end = end


class _EmulatedKinesisStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        stream = options.get("kinesis.streamname") or options.get(
            "kinesis.streamName"
        )
        endpoint = options.get("kinesis.endpointdir") or options.get(
            "kinesis.endpointDir"
        )
        if not stream or not endpoint:
            raise ValueError(
                "kinesis.streamName and kinesis.endpointDir are required"
            )
        self.endpoint = endpoint
        self.stream = stream
        starting = str(options.get("kinesis.startingposition", "LATEST"))
        if starting.upper() not in ("LATEST", "TRIM_HORIZON"):
            raise NotImplementedError(
                "emulator supports TRIM_HORIZON and LATEST starting "
                "positions (AT_TIMESTAMP needs the real connector)"
            )
        self.starting = starting.upper()

    def _tips(self) -> dict[str, int]:
        return {
            os.path.basename(d): _next_seq(d)
            for d in _shard_dirs(self.endpoint, self.stream)
        }

    def initialOffset(self) -> dict:
        if self.starting == "TRIM_HORIZON":
            return {s: 0 for s in self._tips()}
        return self._tips()

    def latestOffset(self) -> dict:
        return self._tips()

    def partitions(self, start: dict, end: dict):
        root = os.path.join(self.endpoint, self.stream)
        out = []
        for shard, e in end.items():
            s = start.get(shard, 0)
            if e > s:
                out.append(
                    _ShardSlice(os.path.join(root, shard), shard, s, e)
                )
        # empty micro-batch: the API requires >= 1 partition
        if not out:
            any_shard = sorted(end) or ["shardId-000000000000"]
            out.append(
                _ShardSlice(
                    os.path.join(root, any_shard[0]), any_shard[0], 0, 0
                )
            )
        return out

    def read(self, partition: _ShardSlice):
        import base64

        if partition.end <= partition.start:
            return
        for fname in sorted(os.listdir(partition.shard_dir)):
            if not fname.endswith(".jsonl"):
                continue
            first, last = (
                int(x) for x in fname[: -len(".jsonl")].split("-")
            )
            if last < partition.start or first >= partition.end:
                continue  # file-level pruning on the seq-range name
            with open(os.path.join(partition.shard_dir, fname)) as f:
                for line in f:
                    rec = json.loads(line)
                    if not partition.start <= rec["seq"] < partition.end:
                        continue
                    yield (
                        base64.b64decode(rec["data_b64"]),
                        str(rec["seq"]),
                        rec["partition_key"],
                        partition.shard_id,
                        datetime.fromisoformat(rec["arrival_ts"]),
                    )

    def commit(self, end: dict) -> None:
        pass  # offsets live in the query checkpoint (the "lease table")


class KinesisEmulatedDataSource(DataSource):
    """``spark.readStream.format("kinesis-emulated")`` after
    ``spark.dataSource.register(KinesisEmulatedDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return EMULATED_SOURCE_NAME

    def schema(self) -> str:
        return (
            "data binary, sequence_number string, partition_key string, "
            "shard_id string, arrival_ts timestamp"
        )

    def streamReader(self, schema):
        return _EmulatedKinesisStreamReader(
            {k.lower(): v for k, v in self.options.items()}
        )


def boto3_style_put_records_factory(endpoint_dir: str):
    """A ``put_records_factory`` for
    :func:`kinesis_vcr_spark.sinks.kinesis.kinesis_partition_writer`
    backed by the emulator — the boto3 call shape (StreamName /
    Records / Data / PartitionKey in, FailedRecordCount out), so the
    K2/K3 replay sink runs unchanged against the shard logs. The
    emulator never fails a put; partial-failure retry is exercised by
    the dedicated fake in the sink tests."""

    def factory():
        def put(StreamName: str, Records: list) -> dict:  # noqa: N803
            put_records(
                endpoint_dir,
                StreamName,
                [(r["Data"], r["PartitionKey"]) for r in Records],
            )
            return {
                "FailedRecordCount": 0,
                "Records": [{} for _ in Records],
            }

        return put

    return factory


def read_kinesis_emulated(
    spark, endpoint_dir: str, stream_name: str, region: str, **options
):
    """The emulator twin of
    :func:`kinesis_vcr_spark.streaming.record.read_kinesis_stream`:
    SAME validated option contract (via ``kinesis_reader_options``),
    different format string + the endpoint directory. Registers the
    Python DataSource idempotently."""
    from kinesis_vcr_spark.streaming.record import kinesis_reader_options

    opts = kinesis_reader_options(stream_name, region, **options)
    opts["kinesis.endpointDir"] = endpoint_dir
    spark.dataSource.register(KinesisEmulatedDataSource)
    reader = spark.readStream.format(EMULATED_SOURCE_NAME)
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()
