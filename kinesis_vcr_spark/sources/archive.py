"""Archive read path — pruned scan, time filter, decode (reference S2/S3,
F2/F3/F7, T3).

The reference replays by enumerating one S3 prefix per day in range
(KinesisPlayer.java:219-221), filtering objects to
``start < lastModified < end`` strictly-exclusively at second resolution
(:209-212), GETting each object, splitting on ``\\n`` and base64-decoding
each line (:160-189). Spark-first equivalents:

- day enumeration → Hive partition pruning on ``dt`` (Catalyst file-index
  prune; zero files outside the range are even listed);
- lastModified filter → ``_metadata.file_modification_time`` predicate,
  evaluated per file before rows are produced;
- line split / empty-line skip / decode → ``spark.read.text`` semantics +
  ``length(value) > 0`` + ``F.unbase64``.

All of it is one declarative plan; at 100 TB the scan parallelizes by
file split with no driver-side iteration.
"""

from __future__ import annotations

import calendar
from datetime import datetime

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_vcr_spark.timeparse import default_end, validate_range


def _utc_epoch(dt: datetime) -> int:
    """Naive datetime → epoch seconds AS UTC, regardless of host TZ.

    The reference pins UTC (``start.atOffset(ZoneOffset.UTC)
    .toEpochSecond()``, KinesisPlayer.java:209-212); ``dt.timestamp()``
    would interpret naive values in the driver's LOCAL zone and shift
    the window on non-UTC hosts.
    """
    if dt.tzinfo is not None:
        return int(dt.timestamp())
    return calendar.timegm(dt.timetuple())


def _mtime_filter(start: datetime, end: datetime) -> Column:
    """start < mtime < end, strictly exclusive, **second** granularity.

    The reference compares ``lastModified.getTime()/1000`` against
    ``start.toEpochSecond()`` with ``<``/``>`` (KinesisPlayer.java:209-212)
    — a file modified exactly at either bound is EXCLUDED, and sub-second
    precision is truncated before comparing.
    """
    mtime_s = F.unix_timestamp(F.col("_metadata.file_modification_time"))
    return (mtime_s > F.lit(_utc_epoch(start))) & (
        mtime_s < F.lit(_utc_epoch(end))
    )


def _dt_filter(start: datetime, end: datetime) -> Column:
    """Partition-pruning predicate: day range [start.date, end.date]."""
    return F.col("dt").between(
        F.lit(start.strftime("%Y-%m-%d")).cast("date"),
        F.lit(end.strftime("%Y-%m-%d")).cast("date"),
    )


def read_archive_lines(
    spark: SparkSession,
    archive_path: str,
    start: datetime,
    end: datetime | None = None,
    mtime_filter: bool = True,
) -> DataFrame:
    """Scan the base64 lines of an archive in [start, end).

    Returns columns ``value`` (base64 string), ``dt`` (partition date),
    ``file_path``, ``file_mtime``, ``file_size``. Range semantics follow
    the reference exactly (F2 prune, F3 strict-exclusive mtime, F4 default
    end, F7 empty-line skip).

    Set ``mtime_filter=False`` for rebuilt/copied archives whose file
    mtimes no longer reflect write time (the dt partition still prunes).
    """
    end = default_end(start, end)
    validate_range(start, end)

    df = spark.read.text(archive_path).where(_dt_filter(start, end))
    if mtime_filter:
        df = df.where(_mtime_filter(start, end))
    return df.select(
        "value",
        F.col("_metadata.file_path").alias("file_path"),
        F.col("_metadata.file_modification_time").alias("file_mtime"),
        F.col("_metadata.file_size").alias("file_size"),
        "dt",
    ).where(F.length("value") > 0)


def read_archive(
    spark: SparkSession,
    archive_path: str,
    start: datetime,
    end: datetime | None = None,
    mtime_filter: bool = True,
) -> DataFrame:
    """Decoded archive records in range: ``data`` binary + ``dt``.

    The replay-side projection: base64 line → raw payload
    (KinesisPlayer.java:188). Ordering is NOT preserved — the reference
    deliberately randomizes replay order/partitioning (SURVEY.md §1.4).
    """
    lines = read_archive_lines(spark, archive_path, start, end, mtime_filter)
    return lines.select(F.unbase64("value").alias("data"), "dt")


def write_archive(
    records: DataFrame,
    archive_path: str,
    dt_from: str = "arrival_ts",
    mode: str = "append",
) -> None:
    """Batch-write envelope records as a date-partitioned base64 archive.

    Test/backfill counterpart of the streaming record path
    (:mod:`kinesis_vcr_spark.streaming.record`): encodes ``data`` to one
    base64 line per record (T2, S3RecorderPipeline.java:52-57) under
    ``dt=yyyy-MM-dd``. ``dt_from`` names the timestamp column that stands
    in for write time (the reference stamps processing time,
    InjectableS3Emitter.java:40).
    """
    (
        records.select(
            F.base64(F.col("data")).alias("value"),
            F.to_date(F.col(dt_from)).alias("dt"),
        )
        .write.mode(mode)
        .partitionBy("dt")
        .text(archive_path)
    )


def archive_listing(
    spark: SparkSession,
    archive_path: str,
    start: datetime,
    end: datetime | None = None,
    mtime_filter: bool = True,
) -> DataFrame:
    """Metadata-only listing of archive files in range — never reads rows.

    The estimate path (KinesisVcr.java:74-82) must stay O(files): this
    uses the Hadoop FileSystem listing (same pruned day enumeration as the
    reference's per-day prefix listing, KinesisPlayer.java:234-260) and
    returns a small DataFrame ``(dt, file_path, file_size, file_mtime)``.

    Listing cost is proportional to files in range only; at 100 TB with
    ~100 MB objects a single-day range is ~10^4 keys — driver-trivial, and
    S3A/HDFS pagination + retries are handled by the filesystem client.
    Days list CONCURRENTLY (py4j serves each Python thread on its own
    gateway connection): a multi-year range over a remote store pays one
    round-trip latency per ~16 days instead of per day, matching the
    reference's pipelined listing (KinesisPlayer.java:225,259).
    """
    from concurrent.futures import ThreadPoolExecutor

    from kinesis_vcr_spark.timeparse import day_range

    end = default_end(start, end)
    validate_range(start, end)

    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    start_s, end_s = _utc_epoch(start), _utc_epoch(end)

    def list_day(day: datetime) -> list[tuple]:
        day_rows = []
        path = jvm.org.apache.hadoop.fs.Path(
            f"{archive_path.rstrip('/')}/dt={day.strftime('%Y-%m-%d')}"
        )
        fs = path.getFileSystem(conf)
        if not fs.exists(path):
            return day_rows

        def add_file(st) -> None:
            name = st.getPath().getName()
            if name.startswith("_") or name.startswith("."):
                return  # sink metadata, hidden files
            mtime_seconds = st.getModificationTime() // 1000
            if mtime_filter and not (start_s < mtime_seconds < end_s):
                return  # F3: strictly exclusive, second granularity
            day_rows.append(
                (
                    day.date(),
                    st.getPath().toString(),
                    int(st.getLen()),
                    mtime_seconds,
                )
            )

        # explicit two-level walk: flat files (text-sink layout) plus
        # one level of shard=<id> subdirs (manifest-writer layout).
        # A fully recursive listFiles iterator stats every entry through
        # the RemoteIterator protocol and measured ~2x slower on the
        # flat case — and would happily descend into unrelated nesting.
        for st in fs.listStatus(path):
            if st.isDirectory():
                if st.getPath().getName().startswith("shard="):
                    for sub in fs.listStatus(st.getPath()):
                        if not sub.isDirectory():
                            add_file(sub)
                continue
            add_file(st)
        return day_rows

    days = list(day_range(start, end))
    rows: list[tuple] = []
    with ThreadPoolExecutor(max_workers=min(len(days), 16)) as pool:
        for day_rows in pool.map(list_day, days):  # deterministic order
            rows.extend(day_rows)
    return spark.createDataFrame(
        rows, "dt date, file_path string, file_size long, file_mtime_s long"
    )
