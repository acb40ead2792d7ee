"""Full-loop chaos end-to-end (VERDICT r04 item 5): events table →
record envelope → streaming archive with a mid-stream kill + restart →
replay through the retrying Kinesis sink with injected put failures →
byte-exact reconciliation.

Reference semantics being pinned across the WHOLE loop at once
(`KinesisRecorderTest.java:119-190`):

- record side: every source payload lands in the archive EXACTLY once
  across the kill/restart (idempotent same-name rewrites + manifest
  dedup), lines are base64 in ascending per-shard sequence order
  within each file;
- replay side: ReplayResult accounting reconciles exactly with what
  the (chaotic) sink accepted — transiently-failed entries are
  resubmitted until accepted, permanently-failing entries are given
  up after the budget and counted, nothing is delivered twice;
- end to end: delivered payload multiset == source payload multiset
  minus the permanent-failure set, byte-for-byte.

Scale knob: pytest runs the driver's sf0.001 events (1k records). Set
``SPARK_GRAFT_E2E_SF_DIR=/root/repo/.localdata/sf1.0`` to drive the
identical loop over 1M records (scaling run recorded in BASELINE.md).
"""

from __future__ import annotations

import base64
import glob
import hashlib
import os
import time
import uuid as uuid_mod
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from kinesis_vcr_spark.config import VcrConfig
from kinesis_vcr_spark.model import RECORD_SCHEMA
from kinesis_vcr_spark.play import replay
from kinesis_vcr_spark.sinks.kinesis import kinesis_partition_writer
from kinesis_vcr_spark.streaming.record import (
    read_manifest,
    record_stream_with_manifest,
)
from kinesis_vcr_spark.tables import load_table

N_SHARDS = 4


def _envelope(spark, sf_dir):
    """events table → record envelope. Payload serializes the row (the
    canonical `events`→`records` mapping, FIXTURES.md §3), sequence =
    zero-padded event_id (lexicographic == numeric), shard by user hash."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.encode(
            F.concat_ws(
                "|",
                F.col("event_id"),
                F.col("user_id"),
                F.col("event_type"),
                F.col("value"),
                F.col("props"),
            ),
            "utf-8",
        ).alias("data"),
        F.lpad(F.col("event_id").cast("string"), 20, "0").alias(
            "sequence_number"
        ),
        F.col("user_id").cast("string").alias("partition_key"),
        F.concat(
            F.lit("shardId-"),
            F.lpad((F.col("user_id") % N_SHARDS).cast("string"), 12, "0"),
        ).alias("shard_id"),
        F.col("ts").alias("arrival_ts"),
        F.col("event_id").alias("_eid"),
    )


def test_e2e_record_kill_restart_then_chaos_replay(spark, tmp_path):
    # chaos rules live INSIDE the test so cloudpickle ships them by
    # value (executors can't import tests.*); content-based → outcome
    # independent of partition layout and batch boundaries
    def _is_permanent(payload: bytes) -> bool:
        return int(hashlib.md5(payload).hexdigest(), 16) % 20 == 0  # ~5%

    def _is_transient(payload: bytes) -> bool:
        return int(hashlib.md5(payload).hexdigest(), 16) % 100 >= 60  # ~40%

    sf_dir = os.environ.get(
        "SPARK_GRAFT_E2E_SF_DIR", "/root/testdata/sf0.001"
    )
    env = _envelope(spark, sf_dir)
    n_total = env.count()
    cut = env.approxQuantile("_eid", [0.5], 0.0)[0]

    # two source waves as separate file groups so maxFilesPerTrigger can
    # commit wave 1 before the kill
    src_dir = str(tmp_path / "src")
    for pred in (F.col("_eid") <= cut, F.col("_eid") > cut):
        (
            env.where(pred)
            .drop("_eid")
            .coalesce(1)
            .write.mode("append")
            .parquet(src_dir)
        )
    n_wave1 = env.where(F.col("_eid") <= cut).count()

    cfg = VcrConfig(
        archive_root=str(tmp_path / "bucket"),
        source_stream="events",
        checkpoint_location=str(tmp_path / "ckpt"),
    )
    manifest = str(tmp_path / "manifest")

    def manifest_records() -> int:
        try:
            return (
                read_manifest(spark, manifest)
                .agg(F.sum("record_count"))
                .collect()[0][0]
                or 0
            )
        except Exception:
            return 0

    def start():
        stream = (
            spark.readStream.schema(RECORD_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        return record_stream_with_manifest(
            stream, cfg, manifest, trigger_seconds=1
        )

    # ---- record phase with a kill after the first committed batch ----
    q = start()
    deadline = time.monotonic() + 300
    while manifest_records() < n_wave1:
        assert time.monotonic() < deadline, "wave-1 batch never committed"
        time.sleep(0.5)
    q.stop()  # kill mid-stream: wave 2 is unstarted or in-flight
    q.awaitTermination(120)

    q = start()  # restart from the SAME checkpoint
    deadline = time.monotonic() + 300
    while manifest_records() < n_total:
        assert time.monotonic() < deadline, "restart never drained source"
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(120)

    # ---- archive invariants: exactly-once + per-shard line order ----
    expected = sorted(
        bytes(r["data"]) for r in env.select("data").collect()
    )
    archived: list[bytes] = []
    files = [
        f
        for f in glob.glob(f"{cfg.archive_path}/dt=*/shard=*/*")
        if not os.path.basename(f).startswith((".", "_"))
    ]
    assert files, "archive is empty"
    for f in files:
        with open(f, "rb") as fh:
            decoded = [
                base64.b64decode(ln)
                for ln in fh.read().split(b"\n")
                if ln
            ]
        archived.extend(decoded)
        seqs = [int(p.split(b"|", 1)[0]) for p in decoded]
        assert seqs == sorted(seqs), f"out-of-order lines in {f}"
    assert sorted(archived) == expected  # exactly once, byte-identical

    # ---- replay phase through the retrying sink with chaos ----
    deliver_dir = tmp_path / "delivered"
    deliver_dir.mkdir()

    def chaotic_put_factory(deliver_dir=str(deliver_dir)):
        seen: set[bytes] = set()  # per-client first-attempt memory

        def put(StreamName, Records):
            assert StreamName == "target"
            results, delivered, failed_n = [], [], 0
            for entry in Records:
                payload = bytes(entry["Data"])
                if _is_permanent(payload) or (
                    _is_transient(payload) and payload not in seen
                ):
                    results.append({"ErrorCode": "InternalFailure"})
                    failed_n += 1
                else:
                    results.append({"SequenceNumber": "1"})
                    delivered.append(payload)
                seen.add(payload)
            if delivered:
                with open(
                    os.path.join(deliver_dir, uuid_mod.uuid4().hex), "wb"
                ) as fh:
                    fh.write(
                        b"".join(
                            base64.b64encode(p) + b"\n" for p in delivered
                        )
                    )
            return {"FailedRecordCount": failed_n, "Records": results}

        return put

    writer = kinesis_partition_writer(
        "target", chaotic_put_factory, budget_seconds=1.0
    )
    now = datetime.utcnow()
    result = replay(
        spark,
        cfg.archive_path,
        now - timedelta(days=1),
        now + timedelta(days=1),
        writer,
        parallelism=8,
        mtime_filter=False,
    )

    permanents = [p for p in expected if _is_permanent(p)]
    assert 0 < len(permanents) < n_total  # chaos actually engaged
    assert result.records_attempted == n_total
    assert result.records_failed == len(permanents)
    assert result.records_delivered == n_total - len(permanents)

    # ---- end-to-end byte reconciliation ----
    delivered: list[bytes] = []
    for fname in os.listdir(deliver_dir):
        with open(deliver_dir / fname, "rb") as fh:
            delivered.extend(
                base64.b64decode(ln) for ln in fh if ln.strip()
            )
    want = sorted(p for p in expected if not _is_permanent(p))
    assert sorted(delivered) == want  # exactly once, nothing extra
    assert sum(map(len, delivered)) == sum(map(len, want))
