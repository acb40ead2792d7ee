"""Streaming analytics over the record envelope — event-time windowed
aggregations with watermarks, and a custom stateful operator.

The reference's only streaming computation is the record pipeline's
time/size buffer (B1); a Spark-native engine gets event-time windows,
late-data handling, and arbitrary keyed state on top of the same
envelope for free — these are the building blocks a stream-monitoring
user (records/s per shard, sequence-gap alarms) needs.

The windowed/session aggregations accept BOTH streaming and batch
DataFrames — the same query graph runs under ``readStream``
(incremental, watermark-driven state eviction) or as a batch backfill
over the archive (Spark's unified-semantics guarantee, relied on by the
tests). The stateful gap detector is streaming-first (its cross-batch
state lives in the query checkpoint).

Scale posture: windowed aggregation state is per (key, window) with
watermark eviction — bounded by (shards x windows-in-watermark), not by
throughput. The stateful gap detector keeps O(1) state per shard
(last sequence number seen).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def windowed_throughput(
    records: DataFrame,
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Records/bytes per shard per event-time window (tumbling, or
    sliding when ``slide`` is given), tolerating ``watermark`` of
    lateness before window state is finalized/evicted.
    """
    with_wm = records.withWatermark("arrival_ts", watermark)
    win = (
        F.window("arrival_ts", window, slide)
        if slide
        else F.window("arrival_ts", window)
    )
    return (
        with_wm.groupBy(win.alias("win"), "shard_id")
        .agg(
            F.count("*").alias("record_count"),
            F.sum(F.length("data")).alias("byte_count"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "shard_id",
            "record_count",
            "byte_count",
        )
    )


def session_activity(
    records: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-partition-key activity sessions (dynamic session windows that
    close after ``gap`` of silence)."""
    return (
        records.withWatermark("arrival_ts", watermark)
        .groupBy(
            F.session_window("arrival_ts", gap).alias("sess"),
            "partition_key",
        )
        .agg(F.count("*").alias("record_count"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "partition_key",
            "record_count",
        )
    )


GAP_OUTPUT_SCHEMA = StructType(
    [
        StructField("shard_id", StringType(), False),
        StructField("prev_seq", LongType(), True),
        StructField("seq", LongType(), False),
        StructField("gap", LongType(), False),
        StructField("arrival_ts", TimestampType(), True),
    ]
)

GAP_STATE_SCHEMA = StructType([StructField("last_seq", LongType(), True)])


def detect_sequence_gaps(
    records: DataFrame, expected_step: int = 1
) -> DataFrame:
    """Custom stateful operator: per-shard sequence-gap detection via
    ``applyInPandasWithState``.

    Emits one row per gap (consecutive sequence numbers differing by
    more than ``expected_step``) — the monitoring counterpart of the
    reference's per-shard ordered ingestion (SURVEY.md §1.4): a gap in
    the archive's sequence numbers means dropped or not-yet-recorded
    data. State is one long per shard; streaming state is evicted only
    by timeout (none here — shard sets are small and stable).
    """

    def find_gaps(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (shard_id,) = key
        last_seq = state.get[0] if state.exists else None
        out: list[dict] = []
        for pdf in batches:
            pdf = pdf.sort_values("__seq")
            for seq, ts in zip(pdf["__seq"], pdf["arrival_ts"]):
                seq = int(seq)
                if last_seq is not None and seq - last_seq > expected_step:
                    out.append(
                        {
                            "shard_id": shard_id,
                            "prev_seq": last_seq,
                            "seq": seq,
                            "gap": seq - last_seq,
                            "arrival_ts": ts,
                        }
                    )
                last_seq = seq if last_seq is None else max(last_seq, seq)
        state.update((last_seq,))
        yield pd.DataFrame(out, columns=[f.name for f in GAP_OUTPUT_SCHEMA])

    prepared = records.select(
        "shard_id",
        F.col("sequence_number").cast("long").alias("__seq"),
        "arrival_ts",
    )
    return prepared.groupBy("shard_id").applyInPandasWithState(
        find_gaps,
        outputStructType=GAP_OUTPUT_SCHEMA,
        stateStructType=GAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
