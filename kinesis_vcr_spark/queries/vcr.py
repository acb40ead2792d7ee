"""VCR-semantics queries expressed over the ``events`` table.

The archive itself is a filesystem artifact (covered by tests/bench);
these queries re-express the reference's query surface — base64 encode
(T2), strictly-exclusive time-range selection (F3), decode roundtrip
(T3), estimate aggregation (A1/A2/A6), count-capped batching (B2) — in a
DuckDB-checkable form over the synthetic stream table, treating each
event's serialized ``props`` as the opaque payload.

Scale notes: every query here is a single scan + single (partial-agg)
shuffle; filters sit directly on scan columns (parquet pushdown) and the
windowed batch plan partitions by shard — the same key the data would
arrive partitioned by from a real stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_vcr_spark.queries import QuerySpec, register
from kinesis_vcr_spark.tables import load_table

# Whole-second UTC bounds inside the events range (2024-01-01..2024-01-30)
RANGE_START = "2024-01-08 00:00:00"
RANGE_END = "2024-01-22 00:00:00"
_NS = 1_000_000_000
START_NS = 1704672000 * _NS  # 2024-01-08T00:00:00Z
END_NS = 1705881600 * _NS  # 2024-01-22T00:00:00Z


def vcr_estimate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 per archive day: record count + encoded archive bytes.

    Archive bytes = base64(payload) length + 1 (the newline the text
    sink appends per record — S3RecorderPipeline.java:52-57).
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.where((F.col("ts_ns") > START_NS) & (F.col("ts_ns") < END_NS))
        .select(
            F.date_format("ts", "yyyy-MM-dd").alias("dt"),
            (F.length(F.base64(F.encode(F.col("props"), "utf-8"))) + 1).alias(
                "line_bytes"
            ),
        )
        .groupBy("dt")
        .agg(
            F.count("*").alias("record_count"),
            F.sum("line_bytes").alias("archive_bytes"),
        )
        .orderBy("dt")
    )


VCR_ESTIMATE_DAILY_SQL = f"""
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS dt,
       count(*) AS record_count,
       CAST(sum(length(to_base64(props::BLOB)) + 1) AS BIGINT) AS archive_bytes
FROM events
WHERE ts > TIMESTAMP '{RANGE_START}' AND ts < TIMESTAMP '{RANGE_END}'
GROUP BY dt
ORDER BY dt
"""


def vcr_replay_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2→T3 roundtrip inside the strict-exclusive window: encode each
    payload to its archive line, decode it back, prove byte identity."""
    events = load_table(spark, sf_dir, "events")
    line = F.base64(F.encode(F.col("props"), "utf-8"))
    decoded = F.decode(F.unbase64(line), "utf-8")
    return (
        events.where((F.col("ts_ns") > START_NS) & (F.col("ts_ns") < END_NS))
        .select(
            "event_id",
            F.length(line).alias("b64_len"),
            (decoded == F.col("props")).alias("roundtrip_ok"),
        )
        .orderBy("event_id")
    )


VCR_REPLAY_ROUNDTRIP_SQL = f"""
SELECT event_id,
       length(to_base64(props::BLOB)) AS b64_len,
       (decode(from_base64(to_base64(props::BLOB))) = props) AS roundtrip_ok
FROM events
WHERE ts > TIMESTAMP '{RANGE_START}' AND ts < TIMESTAMP '{RANGE_END}'
ORDER BY event_id
"""


def vcr_batch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2's count cap as a declarative plan: per shard (user_id mod 8),
    500-record batches in sequence order; one row per batch.

    The byte-weight cap is procedural (see operators.batching / the
    replay path); the count cap is exactly expressible with a window —
    this is the form a 1000-executor cluster wants anyway: one shuffle
    by shard, sequence-sorted within partitions.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("shard").orderBy("event_id")
    return (
        events.select(
            (F.col("user_id") % 8).alias("shard"),
            "event_id",
            F.length("props").alias("payload_bytes"),
        )
        .withColumn("batch_index", ((F.row_number().over(w) - 1) / 500).cast("long"))
        .groupBy("shard", "batch_index")
        .agg(
            F.count("*").alias("record_count"),
            F.sum("payload_bytes").alias("batch_bytes"),
            F.min("event_id").alias("first_seq"),
            F.max("event_id").alias("last_seq"),
        )
        .orderBy("shard", "batch_index")
    )


VCR_BATCH_PLAN_SQL = """
WITH numbered AS (
  SELECT user_id % 8 AS shard, event_id, length(props) AS payload_bytes,
         row_number() OVER (PARTITION BY user_id % 8 ORDER BY event_id) AS rn
  FROM events
)
SELECT shard, CAST(floor((rn - 1) / 500) AS BIGINT) AS batch_index,
       count(*) AS record_count,
       CAST(sum(payload_bytes) AS BIGINT) AS batch_bytes,
       min(event_id) AS first_seq, max(event_id) AS last_seq
FROM numbered
GROUP BY shard, batch_index
ORDER BY shard, batch_index
"""


register(
    QuerySpec(
        "vcr_estimate_daily",
        vcr_estimate_daily,
        VCR_ESTIMATE_DAILY_SQL,
        "estimate: per-day record count + archive byte size (A1/A2)",
    )
)
register(
    QuerySpec(
        "vcr_replay_roundtrip",
        vcr_replay_roundtrip,
        VCR_REPLAY_ROUNDTRIP_SQL,
        "base64 encode/decode byte-identity in a strict-exclusive range (T2/T3/F3)",
    )
)
register(
    QuerySpec(
        "vcr_batch_plan",
        vcr_batch_plan,
        VCR_BATCH_PLAN_SQL,
        "500-record batch planning per shard (B2 count cap)",
    )
)
