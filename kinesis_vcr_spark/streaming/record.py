"""``record`` — streaming ingest to a date-partitioned base64 archive
(reference §3.1: S1, T1/T2, F1, B1, K1).

The reference's record pipeline is fixed 4-stage: transform (Record →
bytes), filter (all-pass extension point), buffer (100 MB / 60 s), emit
(one S3 object per flush, base64 lines, keyed by write date + sequence
range) — S3RecorderPipeline.java:22-65, InjectableS3Emitter.java:48-77.

Spark-first shape::

    source stream (RECORD_SCHEMA)
      .filter(predicate)                  # F1 extension point
      .select(base64(data), write-date)   # T2 + processing-time dt
      .writeStream.format("text").partitionBy("dt")
      .trigger(processingTime=buffer_time)
      .option("checkpointLocation", ...)  # replaces the KCL DynamoDB lease table

Semantic deltas, by design (SURVEY.md §7.4):

- Flush is time/epoch-triggered, not byte-triggered — object sizes
  differ from the reference; archive *content* is identical (which is
  what the reference's own tests check).
- Spark's file sink is exactly-once (manifest-committed), strictly
  stronger than the reference's at-least-once emit-retry
  (InjectableS3Emitter.java:56-59). Replays of reference-written
  archives can carry duplicates → see
  :func:`kinesis_vcr_spark.operators.dedup.dedup_exact`.
- Sequence ranges land in a manifest table, not filenames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kinesis_vcr_spark.config import VcrConfig


def encode_archive_rows(records: DataFrame, filter_expr: Column | None = None) -> DataFrame:
    """Envelope records → (value=base64(data), dt=processing-time date).

    ``dt`` is the WRITE date (processing time), matching
    ``Clock.systemUTC()`` at flush (InjectableS3Emitter.java:40) — not
    record event time; a replay range can miss late-recorded data, by
    design (SURVEY.md §4 quirk 3).
    """
    df = records
    if filter_expr is not None:  # F1 — the reference's IFilter slot
        df = df.where(filter_expr)
    return df.select(
        F.base64(F.col("data")).alias("value"),
        F.to_date(F.current_timestamp()).alias("dt"),
    )


def record_stream(
    source: DataFrame,
    config: VcrConfig,
    filter_expr: Column | None = None,
    trigger_seconds: float | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Start the record query: source stream → base64 text archive.

    ``source`` is any streaming DataFrame with a binary ``data`` column —
    the Kinesis DSv2 source in production, a file/rate source in tests
    (the source is pluggable exactly like the reference's connector
    interfaces). Trigger interval defaults to the reference's buffer time
    (60 s); ``available_now=True`` drains a bounded source and stops
    (test/backfill mode).
    """
    if config.checkpoint_location is None:
        raise ValueError("checkpoint_location is required for record()")
    if trigger_seconds is None:
        trigger_seconds = config.buffer_time_millis / 1000.0

    out = encode_archive_rows(source, filter_expr)
    writer = (
        out.writeStream.format("text")
        .partitionBy("dt")
        .option("path", config.archive_path)
        .option("checkpointLocation", config.checkpoint_location)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{int(trigger_seconds)} seconds")
    return writer.start()


def _archive_file_writer(archive_path: str, max_file_bytes: int | None = None):
    """Per-partition executor function: write one ``{firstSeq}-{lastSeq}``
    file per (shard_id, dt) group and yield its manifest row.

    This is the exact-naming writer of InjectableS3Emitter.java:37-42
    (SURVEY.md §7.4 decision 1): buffer order within a shard becomes
    sequence order within the file. Grouping is by (shard_id, dt), NOT
    by the shuffle partition: two shards hashed into the same partition
    must land in separate files, and the shard lives in the path
    (``dt=…/shard=<id>/first-last``) because Kinesis sequence numbers
    are unique only PER SHARD — a shard-less ``{first}-{last}`` name
    could collide across shards and silently overwrite (ADVICE r02).
    ``max_file_bytes`` is B1's byte bound (100 MB default in the
    reference, VcrConfiguration.java:13): a shard's batch is split into
    sequence-contiguous files of at most that payload size — completing
    the size half of the reference's size-OR-time flush (the time half
    is the streaming trigger). A single record larger than the bound
    still gets its own (oversized) file — the record side never drops
    data, unlike the replay batcher's documented 1 MB drop rule.
    Writes with plain file IO — local paths / NFS here; an S3 deployment
    swaps in a boto3 put (same shape as the Kinesis sink factory).
    """

    def write_rows(rows):
        import os
        import re
        from collections import defaultdict

        groups: dict = defaultdict(list)
        for r in rows:
            groups[(r["shard_id"], str(r["dt"]))].append(
                (r["sequence_number"], r["value"])
            )
        for (shard, dt), items in groups.items():
            # decimal-string sequence numbers → numeric order
            items.sort(key=lambda t: (len(t[0]), t[0]))
            # keep the dir name visible to Spark's file index (no leading
            # '_'/'.') while staying filesystem-safe
            safe_shard = re.sub(r"[^A-Za-z0-9-]", "-", str(shard))
            part_dir = os.path.join(
                archive_path, f"dt={dt}", f"shard={safe_shard}"
            )
            os.makedirs(part_dir, exist_ok=True)
            # greedy sequence-contiguous chunks of ≤ max_file_bytes
            chunks: list[list] = [[]]
            chunk_bytes = 0
            for seq, val in items:
                line_len = len(val) + 1  # newline per line
                if (
                    max_file_bytes is not None
                    and chunks[-1]
                    and chunk_bytes + line_len > max_file_bytes
                ):
                    chunks.append([])
                    chunk_bytes = 0
                chunks[-1].append((seq, val))
                chunk_bytes += line_len
            for chunk in chunks:
                first, last = chunk[0][0], chunk[-1][0]
                path = os.path.join(part_dir, f"{first}-{last}")
                payload = ("\n".join(v for _, v in chunk) + "\n").encode()
                with open(path, "wb") as fh:  # idempotent: same name ⇒ same bytes
                    fh.write(payload)
                yield (shard, dt, path, first, last, len(chunk), len(payload))

    return write_rows


def write_archive_with_manifest(
    records: DataFrame,
    archive_path: str,
    manifest_path: str,
    max_file_bytes: int | None = None,
) -> None:
    """One micro-batch (or batch backfill) → seq-range-named archive
    files + appended MANIFEST_SCHEMA rows.

    Each file holds ONE shard's contiguous ``[firstSeq, lastSeq]`` range
    under ``dt=…/shard=<id>/`` — the writer groups by (shard_id, dt)
    like the reference's per-shard KCL buffers (SURVEY.md §1.4). The
    manifest is written AS A DISTRIBUTED DataFrame straight from the
    writer's RDD — at 10^6 archive files a ``collect()`` of per-file
    rows would spike driver memory for no reason (VERDICT r02 item 5).
    Batch replays can re-run, so manifest readers dedup by ``file_path``
    (see :func:`read_manifest`).
    """
    rows = records.select(
        F.base64(F.col("data")).alias("value"),
        F.col("sequence_number"),
        F.date_format(F.current_timestamp(), "yyyy-MM-dd").alias("dt"),
        "shard_id",
    ).repartition(F.col("shard_id"))
    spark = records.sparkSession
    manifest_df = spark.createDataFrame(
        rows.rdd.mapPartitions(
            _archive_file_writer(archive_path, max_file_bytes)
        ),
        "shard_id string, dt string, file_path string, first_seq string,"
        " last_seq string, record_count long, byte_size long",
    )
    (
        manifest_df.select(
            "shard_id",
            F.col("dt").cast("date").alias("dt"),
            "file_path",
            "first_seq",
            "last_seq",
            "record_count",
            "byte_size",
        )
        .write.mode("append")
        .parquet(manifest_path)
    )


def record_stream_with_manifest(
    source: DataFrame,
    config: VcrConfig,
    manifest_path: str,
    trigger_seconds: float | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Record variant that preserves the reference's sequence-range file
    naming AND emits the manifest table — ``foreachBatch`` wiring of
    :func:`write_archive_with_manifest`."""
    if config.checkpoint_location is None:
        raise ValueError("checkpoint_location is required for record()")
    if trigger_seconds is None:
        trigger_seconds = config.buffer_time_millis / 1000.0

    def handle_batch(batch_df: DataFrame, _epoch_id: int) -> None:
        # B1 complete: byte bound from config (100 MB reference default)
        # splits files inside the batch; the trigger is the time bound
        write_archive_with_manifest(
            batch_df,
            config.archive_path,
            manifest_path,
            max_file_bytes=config.buffer_size_bytes,
        )

    writer = (
        source.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", config.checkpoint_location)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{int(trigger_seconds)} seconds")
    return writer.start()


def read_manifest(spark, manifest_path: str) -> DataFrame:
    """Manifest rows, deduplicated by file path (foreachBatch replays
    append duplicate rows; the file writes themselves are idempotent)."""
    from kinesis_vcr_spark.operators.dedup import dedup_exact

    return dedup_exact(
        spark.read.parquet(manifest_path), ["file_path"], "first_seq"
    )


KINESIS_SOURCE_FORMAT = "aws-kinesis"
_VALID_STARTING_POSITIONS = ("LATEST", "TRIM_HORIZON", "AT_TIMESTAMP")


def kinesis_reader_options(
    stream_name: str, region: str, **options
) -> dict[str, str]:
    """The exact DSv2 reader options for the Kinesis source (S1) — a
    pure function so the contract is testable without a live stream or
    the connector jar (tests/test_record_replay.py pins it).

    Mirrors the reference's consumer configuration
    (KinesisRecorder.java:26-35): stream name + region; the KCL DynamoDB
    lease table (:27-28) is replaced by the query's checkpoint, and
    ``startingPosition`` defaults to LATEST like a fresh KCL worker with
    no prior lease.
    """
    if not stream_name:
        raise ValueError("stream_name is required")
    if not region:
        raise ValueError("region is required")
    starting = str(options.pop("startingPosition", "LATEST"))
    if (
        starting.upper() not in _VALID_STARTING_POSITIONS
        and not starting.upper().startswith("AT_TIMESTAMP")
    ):
        raise ValueError(
            f"startingPosition must be one of {_VALID_STARTING_POSITIONS}, "
            f"got {starting!r}"
        )
    opts = {
        "kinesis.streamName": stream_name,
        "kinesis.region": region,
        "kinesis.startingposition": starting,
    }
    opts.update({str(k): str(v) for k, v in options.items()})
    return opts


def read_kinesis_stream(spark, stream_name: str, region: str, **options) -> DataFrame:
    """Production source: Kinesis DSv2 connector (S1).

    Requires the spark-sql-kinesis connector jar on the classpath; the
    KCL DynamoDB lease table of the reference (KinesisRecorder.java:27-28)
    is replaced by the query's checkpoint. Import/availability gated —
    raises with guidance when the connector isn't present.
    """
    opts = kinesis_reader_options(stream_name, region, **options)
    try:
        reader = spark.readStream.format(KINESIS_SOURCE_FORMAT)
        for k, v in opts.items():
            reader = reader.option(k, v)
        return reader.load()
    except Exception as exc:  # connector jar missing in this environment
        raise RuntimeError(
            "Kinesis DSv2 connector not on classpath; in AWS-free "
            "environments feed record_stream() a file/rate source with "
            "RECORD_SCHEMA instead"
        ) from exc
