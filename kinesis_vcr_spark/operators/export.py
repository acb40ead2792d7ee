"""Sharded corpus export — the training-data output step.

A prepared corpus leaves the pipeline as N balanced shards that a
data-loader can stream independently (WebDataset/Megatron-style
sharding). What matters at 100 TB:

- **deterministic membership**: shard = pmod(xxhash64(key), n) — a
  pure function of the row key, so re-runs, retries, and incremental
  appends place a document in the same shard (stable contrastive
  negatives, reproducible epochs); never round-robin or
  ``monotonically_increasing_id``, both of which are partition-layout
  dependent.
- **one shuffle**: rows move once, on the shard id (`repartition(n,
  col)`), then each task writes its own shard directory —
  ``partitionBy("shard")`` on an already-shard-partitioned frame
  means every task writes exactly one directory, no write
  amplification.
- **an audit you can trust**: the manifest counts come from the data
  (one map-side-combined groupBy), not from listing files after the
  fact; a resumed/overwritten write is caught by comparing the two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SHARD_COL = "shard"


def assign_shard(df: DataFrame, key_cols: list[str], n_shards: int) -> DataFrame:
    """Deterministic shard id in [0, n_shards): stable under
    repartitioning, retries, and appends."""
    return df.withColumn(
        SHARD_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_shards)).cast(
            "int"
        ),
    )


def export_corpus_shards(
    df: DataFrame,
    path: str,
    key_cols: list[str],
    n_shards: int = 64,
    mode: str = "error",
) -> DataFrame:
    """Write ``df`` as ``path/shard=K/`` parquet shards; returns the
    per-shard audit ``(shard, n_rows)`` computed FROM THE DATA (compare
    against :func:`shard_manifest` of the landed files to detect a
    short write)."""
    # persist: the write and the audit would otherwise each scan (and
    # re-hash) the full input; one materialization feeds both. The
    # audit is only n_shards rows, so it is collected eagerly HERE and
    # the cache released before returning — no session-lifetime leak
    # (ADVICE r03).
    sharded = assign_shard(df, key_cols, n_shards).persist()
    try:
        (
            sharded.repartition(n_shards, F.col(SHARD_COL))
            .write.mode(mode)
            .partitionBy(SHARD_COL)
            .parquet(path)
        )
        audit_rows = (
            sharded.groupBy(SHARD_COL)
            .agg(F.count("*").alias("n_rows"))
            .collect()
        )
    finally:
        sharded.unpersist()
    return df.sparkSession.createDataFrame(
        audit_rows, schema=f"{SHARD_COL} int, n_rows bigint"
    )


def shard_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Audit of the LANDED shards: ``(shard, n_rows, n_bytes)`` from
    the written files — one metadata-only pass (row counts from parquet
    footers via count pushdown, byte sizes from the file index)."""
    rows = (
        spark.read.parquet(path)
        .groupBy(SHARD_COL)
        .agg(F.count("*").alias("n_rows"))
    )
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(path + "/shard=*")
        .select(
            F.regexp_extract(F.input_file_name(), r"shard=(\d+)", 1)
            .cast("int")
            .alias(SHARD_COL),
            F.col("length").alias("n_bytes"),
        )
        .groupBy(SHARD_COL)
        .agg(F.sum("n_bytes").alias("n_bytes"))
    )
    return rows.join(files, SHARD_COL)
