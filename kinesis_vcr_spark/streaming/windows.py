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
    ArrayType,
    DoubleType,
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


def streaming_approx_distinct(
    records: DataFrame,
    key_col: str,
    value_col: str,
    m: int | None = None,
) -> DataFrame:
    """Streaming approximate COUNT(DISTINCT value) per key — the
    portable HLL sketch (:mod:`kinesis_vcr_spark.operators.sketch`) as
    ``applyInPandasWithState`` state.

    State per key is the m-register rank array (m longs — constant, no
    matter the throughput); each trigger merges the batch into the
    registers (``max`` per bucket — the sketch's merge operation) and
    emits the running estimate. The numpy arithmetic here is the SAME
    pinned hash/bucket/rank as the batch sketch, so a streaming run and
    a batch ``hll_estimate(hll_sketch(...))`` over the same data emit
    the IDENTICAL rounded estimate (pinned by the tests) — and a
    streaming sketch can be merged into batch sketches later.
    """
    import math

    from kinesis_vcr_spark.operators.sketch import (
        HLL_A,
        HLL_B,
        HLL_M,
        HLL_P,
        HLL_W,
    )

    m = HLL_M if m is None else m
    if m <= 0 or m & (m - 1):
        raise ValueError("m must be a positive power of two")
    shift = m.bit_length() - 1
    alpha = 0.7213 / (1 + 1.079 / m)

    out_schema = StructType(
        [
            StructField(key_col, records.schema[key_col].dataType, True),
            StructField("approx_distinct", DoubleType(), False),
        ]
    )
    state_schema = StructType(
        [StructField("ranks", ArrayType(LongType()), True)]
    )

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        ranks = (
            np.array(state.get[0], dtype=np.int64)
            if state.exists
            else np.zeros(m, dtype=np.int64)
        )
        for pdf in batches:
            v = pdf["__v"].to_numpy(dtype=np.int64)
            h = (v * HLL_A + HLL_B) % HLL_P
            hv = h >> shift
            bitlen = np.zeros(len(hv), dtype=np.int64)
            nz = hv > 0
            # exact for hv < 2^23: log2 is correctly rounded and 2^k
            # boundaries land exactly on integers
            bitlen[nz] = np.floor(np.log2(hv[nz])).astype(np.int64) + 1
            rank = np.where(nz, HLL_W - bitlen + 1, HLL_W + 1)
            np.maximum.at(ranks, h & (m - 1), rank)
        state.update((ranks.tolist(),))

        obs = ranks > 0
        n_obs = int(obs.sum())
        # exact powers of two: sum order cannot perturb the double sum
        sum_obs = float(np.sum(2.0 ** (-ranks[obs].astype(np.float64))))
        zeros = m - n_obs
        raw = alpha * m * m / (sum_obs + zeros)
        est = (
            m * math.log(m / zeros)
            if (raw <= 2.5 * m and zeros > 0)
            else raw
        )
        yield pd.DataFrame(
            [{key_col: key[0], "approx_distinct": round(est, 4)}]
        )

    prepared = records.select(
        key_col, F.col(value_col).cast("long").alias("__v")
    )
    return prepared.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(
    records: DataFrame,
    key_cols: list[str] | None = None,
    watermark_col: str = "arrival_ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup — drop replays/duplicates as they arrive.

    The reference's archive is at-least-once (emit failure redelivers
    the whole buffer, InjectableS3Emitter.java:56-59,73-76), so a live
    consumer of a recorded stream sees duplicates; this is the streaming
    counterpart of :func:`operators.dedup.dedup_exact`.

    ``dropDuplicatesWithinWatermark`` keys state by ``key_cols``
    (default: the record identity ``(shard_id, sequence_number)`` —
    Kinesis resharding reuses sequence ranges only across shards) and
    evicts each key once the event-time watermark passes it by
    ``watermark_delay`` — bounded state (keys within the watermark
    horizon), unlike an unbounded ``dropDuplicates`` which would
    accumulate every key forever. A duplicate arriving later than the
    delay is NOT caught: pick the delay to cover the redelivery window
    (the reference retries a failed emit on the next buffer flush, i.e.
    within one buffer_time — minutes, not hours).

    Works on batch DataFrames too (falls back to plain dropDuplicates
    semantics) — used by the tests' backfill comparison.
    """
    if key_cols is None:
        key_cols = ["shard_id", "sequence_number"]
    wm = records.withWatermark(watermark_col, watermark_delay)
    if records.isStreaming:
        return wm.dropDuplicatesWithinWatermark(key_cols)
    return records.dropDuplicates(key_cols)


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "arrival_ts",
    right_ts: str = "arrival_ts",
    within: str = "1 hour",
    watermark_delay: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join.

    Pairs every left row with the right rows sharing its key whose
    event time falls in ``[left_ts − within, left_ts]`` — the streaming
    counterpart of the bucketed interval join (operators/rangejoin.py)
    and the enrichment shape a live replay monitor needs (e.g. join
    emitted records to their delivery acks within an hour).

    Both sides carry watermarks, so Spark bounds the join state: a
    buffered left row is evicted once the right watermark passes
    ``left_ts + within``; right rows age out after ``within`` plus the
    watermark delay. Without the time condition the state would grow
    unboundedly — the interval bound IS the state bound (watermark +
    condition → state eviction). Outer joins emit the unmatched side
    only after the watermark closes the interval, per Spark semantics.

    ``left_ts`` and ``right_ts`` must be differently-named columns (or
    rename before calling): the joined schema keeps both. Works on
    batch frames too (watermarks are streaming-only — skipped) — the
    tests pin batch/streaming result parity.
    """
    if left_ts == right_ts:
        raise ValueError(
            "left_ts and right_ts must differ in name; rename one side "
            f"(both are {left_ts!r})"
        )
    lw = left.withWatermark(left_ts, watermark_delay) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark_delay) if right.isStreaming else right
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (lw[k] == rw[k])
    cond = (
        cond
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {within}"))
        & (F.col(right_ts) <= F.col(left_ts))
    )
    joined = lw.join(rw, cond, how)
    # single copy of the (equal) key columns
    return joined.drop(*[rw[k] for k in key_cols])


def streaming_frequency(
    records: DataFrame,
    key_col: str,
    value_col: str,
    w: int | None = None,
) -> DataFrame:
    """Streaming per-value frequency estimates — the portable count-min
    sketch (:mod:`kinesis_vcr_spark.operators.sketch`) as
    ``applyInPandasWithState`` state.

    State per key is the d×w counter matrix (d·w longs — constant, no
    matter the throughput; sketch merge = cell-wise sum, so adding a
    batch IS the merge). Each trigger folds the batch into the
    counters and emits the RUNNING estimate for every value seen in
    that batch: ``(key, value, est_n)``, CMS-guaranteed ≥ the true
    running count. The hash arithmetic is bit-identical to the batch
    sketch (same ``CMS_ROWS``/modulus/width, int64 wrap + non-negative
    mod match Java long semantics), so after a stream drains, the last
    estimate per value equals ``cms_estimate`` over the same data —
    test-pinned, and a streaming sketch can be summed into batch
    sketches later.
    """
    from kinesis_vcr_spark.operators.sketch import CMS_P, CMS_ROWS, CMS_W

    w = CMS_W if w is None else w
    if w <= 0 or w & (w - 1):
        raise ValueError("w must be a positive power of two")
    d = len(CMS_ROWS)

    out_schema = StructType(
        [
            StructField(key_col, records.schema[key_col].dataType, True),
            StructField(value_col, LongType(), True),
            StructField("est_n", LongType(), False),
        ]
    )
    state_schema = StructType(
        [StructField("counters", ArrayType(LongType()), True)]
    )

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        counters = (
            np.array(state.get[0], dtype=np.int64).reshape(d, w)
            if state.exists
            else np.zeros((d, w), dtype=np.int64)
        )
        seen: set[int] = set()
        for pdf in batches:
            v = pdf["__v"].to_numpy(dtype=np.int64)
            seen.update(int(x) for x in np.unique(v))
            for i, (a, b) in enumerate(CMS_ROWS):
                cols = np.mod(v * a + b, CMS_P) & (w - 1)
                np.add.at(counters[i], cols, 1)
        state.update((counters.reshape(-1).tolist(),))

        vals = np.array(sorted(seen), dtype=np.int64)
        est = np.full(len(vals), np.iinfo(np.int64).max, dtype=np.int64)
        for i, (a, b) in enumerate(CMS_ROWS):
            cols = np.mod(vals * a + b, CMS_P) & (w - 1)
            est = np.minimum(est, counters[i][cols])
        yield pd.DataFrame(
            {key_col: key[0], value_col: vals, "est_n": est}
        )

    prepared = records.select(
        key_col, F.col(value_col).cast("long").alias("__v")
    )
    return prepared.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_sample_k(
    records: DataFrame,
    key_col: str,
    id_col: str,
    k: int,
    seed: str = "",
) -> DataFrame:
    """Streaming deterministic fixed-K per-group sample — the streaming
    twin of the E59 md5-ticket rank sample (``sample_k_per_source``).

    The ticket is computed JVM-side BEFORE the stateful operator (the
    same :func:`~kinesis_vcr_spark.operators.sampling.sample_ticket`
    expression as the batch path — parity by construction, no Python
    re-implementation to drift). State per key is the k smallest
    ``(ticket, id)`` pairs — BOUNDED regardless of throughput, and the
    min-k merge is order- and batching-insensitive, so after a stream
    drains the latest emission per key equals the batch
    ``topk_per_group`` sample over the same data (test-pinned). The
    ticket-rank sample also NESTS across k, and identical redelivered
    rows collapse in the (ticket, id) set — at-least-once inputs can
    only converge to the same sample.

    Emits the RUNNING sample after each trigger as ``(key, id,
    ticket, version)`` rows, ``version`` increasing per key —
    consumers keep each key's max-version emission (the analogue of
    streaming_frequency's latest-estimate convention).
    """
    from kinesis_vcr_spark.operators.sampling import sample_ticket

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    out_schema = StructType(
        [
            StructField(key_col, records.schema[key_col].dataType, True),
            StructField(id_col, LongType(), True),
            StructField("ticket", StringType(), False),
            StructField("version", LongType(), False),
        ]
    )
    state_schema = StructType(
        [
            StructField("version", LongType(), True),
            StructField("tickets", ArrayType(StringType()), True),
            StructField("ids", ArrayType(LongType()), True),
        ]
    )

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            version, tickets, ids = state.get
            cur = set(zip(tickets, ids))
        else:
            version, cur = 0, set()
        for pdf in batches:
            cur.update(
                zip(pdf["__t"].tolist(), (int(x) for x in pdf["__id"]))
            )
        # fixed-width lowercase hex: lexicographic == numeric; id
        # tie-break matches the batch ordering [ticket, id]
        top = sorted(cur)[:k]
        version += 1
        state.update(
            (version, [t for t, _ in top], [i for _, i in top])
        )
        yield pd.DataFrame(
            {
                key_col: key[0],
                id_col: [i for _, i in top],
                "ticket": [t for t, _ in top],
                "version": version,
            }
        )

    prepared = records.select(
        key_col,
        F.col(id_col).cast("long").alias("__id"),
        sample_ticket(id_col, seed=seed).alias("__t"),
    )
    return prepared.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
