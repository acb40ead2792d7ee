"""Sharded corpus export (operators/export.py)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.export import (
    assign_shard,
    export_corpus_shards,
    shard_manifest,
)


def _corpus(spark, n=1000):
    return spark.createDataFrame(
        [Row(doc_id=i, text=f"doc number {i}") for i in range(n)]
    )


def test_roundtrip_and_audit(spark, tmp_path):
    df = _corpus(spark)
    out = str(tmp_path / "shards")
    audit = export_corpus_shards(df, out, ["doc_id"], n_shards=8)
    audit_rows = {r.shard: r.n_rows for r in audit.collect()}
    assert sum(audit_rows.values()) == 1000

    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert {r.doc_id for r in back.select("doc_id").collect()} == set(range(1000))

    # landed manifest agrees with the data-side audit
    manifest = {r.shard: (r.n_rows, r.n_bytes)
                for r in shard_manifest(spark, out).collect()}
    assert {s: n for s, (n, _) in manifest.items()} == audit_rows
    assert all(b > 0 for _, b in manifest.values())


def test_assignment_deterministic_and_layout_independent(spark):
    df = _corpus(spark, 500)
    a = {r.doc_id: r.shard for r in assign_shard(df, ["doc_id"], 16).collect()}
    b = {
        r.doc_id: r.shard
        for r in assign_shard(df.repartition(7), ["doc_id"], 16).collect()
    }
    assert a == b  # membership survives any physical layout


def test_shards_reasonably_balanced(spark, tmp_path):
    df = _corpus(spark, 2000)
    audit = export_corpus_shards(
        df, str(tmp_path / "bal"), ["doc_id"], n_shards=8
    )
    counts = [r.n_rows for r in audit.collect()]
    assert len(counts) == 8
    # hash balance: every shard within ±40% of the mean at n=2000
    assert min(counts) > 150 and max(counts) < 350


def test_each_shard_dir_single_task_write(spark, tmp_path):
    """repartition-on-shard before partitionBy: every shard directory
    is written by the one task owning it → exactly one data file."""
    import glob

    out = str(tmp_path / "onefile")
    export_corpus_shards(_corpus(spark, 400), out, ["doc_id"], n_shards=4)
    for s in range(4):
        files = [
            f for f in glob.glob(f"{out}/shard={s}/*.parquet")
        ]
        assert len(files) == 1, (s, files)
