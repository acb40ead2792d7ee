"""Streaming analytics: windowed throughput (batch + streaming parity),
session windows, stateful sequence-gap detection."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import Row

from kinesis_vcr_spark.model import RECORD_SCHEMA
from kinesis_vcr_spark.streaming.windows import (
    detect_sequence_gaps,
    session_activity,
    windowed_throughput,
)

BASE = datetime(2024, 3, 5, 10, 0, 0)


def _records(spark, specs):
    """specs: (seq, shard, offset_seconds[, pk])"""
    rows = [
        Row(
            data=b"x" * 10,
            sequence_number=str(s[0]),
            partition_key=(s[3] if len(s) > 3 else f"pk-{s[0]}"),
            shard_id=s[1],
            arrival_ts=BASE + timedelta(seconds=s[2]),
        )
        for s in specs
    ]
    return spark.createDataFrame(rows, RECORD_SCHEMA)


def test_windowed_throughput_batch(spark):
    df = _records(
        spark,
        [(1, "a", 0), (2, "a", 30), (3, "a", 70), (4, "b", 10)],
    )
    got = {
        (r["window_start"], r["shard_id"]): (r["record_count"], r["byte_count"])
        for r in windowed_throughput(df, window="1 minute").collect()
    }
    assert got[(BASE, "a")] == (2, 20)
    assert got[(BASE + timedelta(minutes=1), "a")] == (1, 10)
    assert got[(BASE, "b")] == (1, 10)


def test_windowed_throughput_sliding(spark):
    df = _records(spark, [(1, "a", 0), (2, "a", 70)])
    rows = windowed_throughput(
        df, window="2 minutes", slide="1 minute"
    ).collect()
    # each record lands in 2 overlapping windows
    assert sum(r["record_count"] for r in rows) == 4


def test_session_activity_batch(spark):
    df = _records(
        spark,
        [(1, "a", 0, "u1"), (2, "a", 60, "u1"), (3, "a", 1000, "u1"),
         (4, "a", 30, "u2")],
    )
    rows = session_activity(df, gap="5 minutes").collect()
    u1 = sorted(
        (r["record_count"] for r in rows if r["partition_key"] == "u1")
    )
    assert u1 == [1, 2]  # 2 events within gap, 1 later session


def test_detect_sequence_gaps_streaming(spark, tmp_path):
    src = str(tmp_path / "src")
    _records(
        spark,
        [(1, "a", 0), (2, "a", 1), (5, "a", 2),  # gap 2→5
         (10, "b", 0), (11, "b", 1)],  # no gap
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(RECORD_SCHEMA).parquet(src)
    q = (
        detect_sequence_gaps(stream)
        .writeStream.format("memory")
        .queryName("gaps")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM gaps").collect()
    assert len(rows) == 1
    g = rows[0]
    assert (g["shard_id"], g["prev_seq"], g["seq"], g["gap"]) == ("a", 2, 5, 3)


def test_gap_state_carries_across_batches(spark, tmp_path):
    """Second micro-batch sees state from the first: a gap spanning the
    batch boundary is detected."""
    src = tmp_path / "src2"
    src.mkdir()
    _records(spark, [(1, "a", 0), (2, "a", 1)]).coalesce(1).write.parquet(
        str(src / "b1")
    )
    stream = (
        spark.readStream.schema(RECORD_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "gaps_out")
    q = (
        detect_sequence_gaps(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # batch 2 arrives later with a gap relative to batch 1's last seq;
    # restarting from the checkpoint must restore per-shard state
    _records(spark, [(7, "a", 2)]).coalesce(1).write.parquet(str(src / "b2"))
    q2 = (
        detect_sequence_gaps(
            spark.readStream.schema(RECORD_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert any(
        (r["prev_seq"], r["seq"], r["gap"]) == (2, 7, 5) for r in rows
    )


def test_dedup_stream_drops_redelivered(spark, tmp_path):
    """Streaming dedup: a redelivered (same shard, same sequence) batch
    is dropped by the stateful operator; distinct records survive."""
    import datetime as dt

    from kinesis_vcr_spark.model import RECORD_SCHEMA
    from kinesis_vcr_spark.streaming.windows import dedup_stream

    src = tmp_path / "src"
    src.mkdir()
    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    def write_batch(name, rows):
        spark.createDataFrame(rows, RECORD_SCHEMA).write.parquet(
            str(src / name)
        )

    rows1 = [
        (b"a", "1", "pk", "shard-0", base),
        (b"b", "2", "pk", "shard-0", base + dt.timedelta(seconds=1)),
    ]
    # redelivery of seq 2 + one new record — and the same seq on another
    # shard, which must NOT be treated as a duplicate
    rows2 = [
        (b"b", "2", "pk", "shard-0", base + dt.timedelta(seconds=1)),
        (b"c", "3", "pk", "shard-0", base + dt.timedelta(seconds=2)),
        (b"d", "2", "pk", "shard-1", base + dt.timedelta(seconds=3)),
    ]
    write_batch("b1", rows1)
    write_batch("b2", rows2)

    stream = spark.readStream.schema(RECORD_SCHEMA).parquet(str(src / "*"))
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        dedup_stream(stream)
        .selectExpr("cast(data as string) AS payload")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        r["payload"] for r in spark.read.parquet(out_dir).collect()
    )
    assert got == ["a", "b", "c", "d"]


def test_dedup_stream_batch_fallback(spark):
    import datetime as dt

    from kinesis_vcr_spark.model import RECORD_SCHEMA
    from kinesis_vcr_spark.streaming.windows import dedup_stream

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (b"a", "1", "pk", "s0", base),
            (b"a", "1", "pk", "s0", base),
            (b"b", "2", "pk", "s0", base),
        ],
        RECORD_SCHEMA,
    )
    assert dedup_stream(df).count() == 2


def test_streaming_approx_distinct_matches_batch_sketch(spark, tmp_path):
    """The streaming HLL (registers as applyInPandasWithState state)
    must emit the IDENTICAL rounded estimate as the batch sketch over
    the same data — same pinned hash/bucket/rank arithmetic, sketches
    mergeable across the batch/streaming boundary."""
    from pyspark.sql import functions as F

    from kinesis_vcr_spark.operators.sketch import hll_estimate, hll_sketch
    from kinesis_vcr_spark.streaming.windows import streaming_approx_distinct

    rows = [
        (f"type-{i % 3}", (i * 7919) % 400)  # ~400 distinct values
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    src = str(tmp_path / "src")
    df.write.mode("overwrite").parquet(src)

    batch = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_estimate(
            hll_sketch(df, ["event_type"], "user_id"), ["event_type"]
        ).collect()
    }

    stream = spark.readStream.schema("event_type string, user_id long").parquet(src)
    q = (
        streaming_approx_distinct(stream, "event_type", "user_id")
        .writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["event_type"]: r["approx_distinct"]
        for r in spark.sql(
            "SELECT * FROM hll_stream"
        ).groupBy("event_type").agg(
            F.last("approx_distinct").alias("approx_distinct")
        ).collect()
    }
    assert got == batch


def test_streaming_frequency_matches_batch_cms(spark, tmp_path):
    """The streaming CMS (counter matrix as applyInPandasWithState
    state) must converge to the batch sketch's point estimates over the
    same data — identical pinned hash arithmetic, merge = cell sum."""
    from pyspark.sql import functions as F

    from kinesis_vcr_spark.operators.sketch import cms_estimate, cms_sketch
    from kinesis_vcr_spark.streaming.windows import streaming_frequency

    rows = [
        ("type-%d" % (i % 2), (i * 13) % 50)  # 50 values, skewed-ish
        for i in range(4000)
    ] + [("type-0", 7)] * 500                  # one heavy hitter
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    src = str(tmp_path / "cms_src")
    df.write.mode("overwrite").parquet(src)

    sketch = cms_sketch(df, ["event_type"], "user_id")
    items = df.select("event_type", "user_id").distinct()
    batch = {
        (r["event_type"], r["user_id"]): r["est_n"]
        for r in cms_estimate(items, sketch, ["event_type"], "user_id").collect()
    }

    stream = spark.readStream.schema("event_type string, user_id long").parquet(src)
    q = (
        streaming_frequency(stream, "event_type", "user_id")
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_type"], r["user_id"]): r["est_n"]
        for r in spark.sql("SELECT * FROM cms_stream")
        .groupBy("event_type", "user_id")
        .agg(F.last("est_n").alias("est_n"))
        .collect()
    }
    assert got == batch
    # CMS never undercounts: the planted heavy hitter's estimate covers
    # its true count
    assert got[("type-0", 7)] >= 500


def test_streaming_sample_k_matches_batch(spark, tmp_path):
    """The streaming min-k ticket state must converge to the batch
    topk_per_group sample over the same data — across multiple
    micro-batches, with duplicate redeliveries, and nesting in k."""
    from pyspark.sql import functions as F

    from kinesis_vcr_spark.operators.sampling import sample_ticket
    from kinesis_vcr_spark.operators.topk import topk_per_group
    from kinesis_vcr_spark.streaming.windows import streaming_sample_k

    rows = [("src-%d" % (i % 3), i) for i in range(900)]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    src = str(tmp_path / "sample_src")
    # three files -> three micro-batches, plus a redelivered slice
    for j in range(3):
        df.where(F.pmod("doc_id", F.lit(3)) == j).coalesce(1).write.parquet(
            f"{src}/f{j}.parquet"
        )
    df.where(F.col("doc_id") < 60).coalesce(1).write.parquet(
        f"{src}/dup.parquet"
    )

    batch = {
        (r["source"], r["doc_id"])
        for r in topk_per_group(
            df.select(
                "source", "doc_id",
                sample_ticket("doc_id", seed="s6").alias("__t"),
            ),
            ["source"],
            [F.col("__t"), F.col("doc_id")],
            12,
        ).collect()
    }

    stream = (
        spark.readStream.schema("source string, doc_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        streaming_sample_k(stream, "source", "doc_id", 12, seed="s6")
        .writeStream.format("memory")
        .queryName("sample_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["source"], r["doc_id"])
        for r in spark.sql("""
            SELECT source, doc_id FROM sample_stream s
            WHERE version = (SELECT max(version) FROM sample_stream m
                             WHERE m.source = s.source)
        """).collect()
    }
    out = spark.sql("SELECT * FROM sample_stream")
    assert got == batch
    # every emission is <= k rows and versions increase per key
    sizes = out.groupBy("source", "version").count().collect()
    assert all(r["count"] <= 12 for r in sizes)
