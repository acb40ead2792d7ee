"""Tests for archive compaction (operators/compaction.py) and the
watermarked stream-stream interval join (streaming/windows.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kinesis_vcr_spark.model import RECORD_SCHEMA
from kinesis_vcr_spark.operators.compaction import compact_archive, plan_compaction
from kinesis_vcr_spark.streaming.record import write_archive_with_manifest
from kinesis_vcr_spark.streaming.windows import interval_join_streams

BASE = dt.datetime(2024, 3, 5, 10, 0, 0)


# ---------------------------------------------------------------------------
# compaction
# ---------------------------------------------------------------------------


def _write_small_files(spark, tmp_path, n=20, shards=("s0", "s1")):
    rows = [
        (f"payload-{sh}-{i:04d}".encode(), str(1000 + i), f"pk{i}", sh,
         BASE + dt.timedelta(seconds=i))
        for sh in shards
        for i in range(n)
    ]
    records = spark.createDataFrame(rows, RECORD_SCHEMA)
    archive = str(tmp_path / "archive")
    manifest = str(tmp_path / "manifest")
    # tiny byte bound → one file per record or two
    write_archive_with_manifest(records, archive, manifest, max_file_bytes=40)
    return archive, manifest


def test_plan_compaction_groups_are_contiguous_and_bounded(spark, tmp_path):
    _, manifest = _write_small_files(spark, tmp_path)
    m = spark.read.parquet(manifest)
    plan = plan_compaction(m, target_bytes=200).toPandas()
    for (_, _), grp in plan.groupby(["shard_id", "dt"]):
        grp = grp.sort_values("first_seq", key=lambda s: [(len(x), x) for x in s])
        # group ids are non-decreasing along the sequence order
        assert list(grp["group_id"]) == sorted(grp["group_id"])
        # no group exceeds target + one file's worth (never splits a file)
        per = grp.groupby("group_id")["byte_size"].sum()
        assert (per <= 200 + grp["byte_size"].max()).all()


def test_compact_archive_preserves_bytes_and_reduces_files(spark, tmp_path):
    archive, manifest = _write_small_files(spark, tmp_path)
    m = spark.read.parquet(manifest)
    n_before = m.count()

    new_root = str(tmp_path / "compacted")
    new_manifest = compact_archive(spark, m, new_root, target_bytes=300)
    nm = new_manifest.toPandas()

    assert len(nm) < n_before
    # record counts conserved per shard
    old = m.toPandas().groupby("shard_id")["record_count"].sum().to_dict()
    new = nm.groupby("shard_id")["record_count"].sum().to_dict()
    assert old == new

    # byte-identity: concatenated payload per shard identical
    def shard_bytes(paths):
        out = {}
        for _, r in paths.iterrows():
            out.setdefault(r["shard_id"], []).append(
                (len(r["first_seq"]), r["first_seq"], r["file_path"])
            )
        return {
            sh: b"".join(open(p, "rb").read() for _, _, p in sorted(v))
            for sh, v in out.items()
        }

    assert shard_bytes(m.toPandas()) == shard_bytes(nm)

    # seq-range naming invariant holds on merged files
    merged = nm[nm["file_path"].str.startswith(new_root)]
    assert len(merged) > 0
    for _, r in merged.iterrows():
        assert r["file_path"].endswith(f"{r['first_seq']}-{r['last_seq']}")


def test_compact_archive_noop_when_already_big(spark, tmp_path):
    archive, manifest = _write_small_files(spark, tmp_path, n=4)
    m = spark.read.parquet(manifest)
    # target smaller than any file → every group has one file → no-op
    out = compact_archive(spark, m, str(tmp_path / "c2"), target_bytes=1)
    assert sorted(r["file_path"] for r in out.select("file_path").collect()) == \
        sorted(r["file_path"] for r in m.select("file_path").collect())


# ---------------------------------------------------------------------------
# stream-stream interval join
# ---------------------------------------------------------------------------


def _emits_acks(spark):
    emits = spark.createDataFrame(
        [
            ("u1", "e1", BASE),
            ("u1", "e2", BASE + dt.timedelta(minutes=90)),
            ("u2", "e3", BASE),
        ],
        "user string, emit_id string, emit_ts timestamp",
    )
    acks = spark.createDataFrame(
        [
            ("u1", "a1", BASE + dt.timedelta(minutes=10)),   # ↔ e1 only
            ("u1", "a2", BASE + dt.timedelta(minutes=100)),  # ↔ e2 only
            ("u2", "a3", BASE - dt.timedelta(minutes=5)),    # before e3 → no match
        ],
        "user string, ack_id string, ack_ts timestamp",
    )
    return emits, acks


def test_interval_join_batch_semantics(spark):
    emits, acks = _emits_acks(spark)
    got = sorted(
        (r["emit_id"], r["ack_id"])
        for r in interval_join_streams(
            acks, emits, ["user"],
            left_ts="ack_ts", right_ts="emit_ts", within="1 hour",
        ).collect()
    )
    # ack pairs with emits at most 1h BEFORE it
    assert got == [("e1", "a1"), ("e2", "a2")]


def test_interval_join_requires_distinct_ts_names(spark):
    emits, acks = _emits_acks(spark)
    with pytest.raises(ValueError, match="must differ"):
        interval_join_streams(
            emits, emits, ["user"], left_ts="emit_ts", right_ts="emit_ts"
        )


def test_interval_join_streaming_matches_batch(spark, tmp_path):
    emits, acks = _emits_acks(spark)
    e_src, a_src = str(tmp_path / "emits"), str(tmp_path / "acks")
    emits.write.parquet(e_src)
    acks.write.parquet(a_src)
    e_stream = spark.readStream.schema(emits.schema).parquet(e_src)
    a_stream = spark.readStream.schema(acks.schema).parquet(a_src)
    q = (
        interval_join_streams(
            a_stream, e_stream, ["user"],
            left_ts="ack_ts", right_ts="emit_ts", within="1 hour",
        )
        .writeStream.format("memory")
        .queryName("ssjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["emit_id"], r["ack_id"])
        for r in spark.sql("SELECT * FROM ssjoin").collect()
    )
    assert got == [("e1", "a1"), ("e2", "a2")]
