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


def read_kinesis_stream(spark, stream_name: str, region: str, **options) -> DataFrame:
    """Production source: Kinesis DSv2 connector (S1).

    Requires the spark-sql-kinesis connector jar on the classpath; the
    KCL DynamoDB lease table of the reference (KinesisRecorder.java:27-28)
    is replaced by the query's checkpoint. Import/availability gated —
    raises with guidance when the connector isn't present.
    """
    try:
        reader = (
            spark.readStream.format("aws-kinesis")
            .option("kinesis.streamName", stream_name)
            .option("kinesis.region", region)
            .option("kinesis.startingposition", options.pop("startingPosition", "LATEST"))
        )
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.load()
    except Exception as exc:  # connector jar missing in this environment
        raise RuntimeError(
            "Kinesis DSv2 connector not on classpath; in AWS-free "
            "environments feed record_stream() a file/rate source with "
            "RECORD_SCHEMA instead"
        ) from exc
