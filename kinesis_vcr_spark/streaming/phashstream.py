"""Streaming perceptual image dedup against the persisted pHash index
— crawl-image near-dup detection as a continuously-ingesting stream.

Completes the E95 family triple (batch operator
``near_dup_pairs_phash`` + persisted index in operators/phash.py +
this loop), the same shape as near-dup/ANN/span/search streaming. Each
micro-batch of images is APPENDED to the block index (its Arrow-batched
decode+hash pass — O(batch) work) and then PROBED with its own scope
EXCLUDED: new×stored candidates come from the accumulated older
scopes, new×new pairs from the batch's self-join inside the probe, so
append-first needs no first-batch special case and a crash replay
(probe re-run after its own append landed) sees exactly the same
stored population. Emitted pairs land in an append-only parquet sink,
one overwrite scope per micro-batch.

Exactness contract (pinned in tests/test_phash_index.py): after the
stream drains, the UNION of emitted pairs over all micro-batches
equals ``near_dup_pairs_hash64`` over the full corpus's hashes — every
pair emitted exactly once, by the batch that completes it. (No
hot-block cap exists in the pigeonhole path, so there is no
arrival-order caveat — unlike the MinHash stream's capped mode.)

State plumbing is FS-agnostic (statefs.py), so state_dir may be any
Spark-writable URI (file:, hdfs:, s3a:).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kinesis_vcr_spark import statefs
from kinesis_vcr_spark.operators.phash import (
    PixelFn,
    append_phash_index,
    phash_probe_index,
    real_pixels,
)


def _progress_path(state_dir: str) -> str:
    return f"{state_dir}/progress.json"


_DEFAULT_PROGRESS = {"last_batch_id": -1, "pairs_emitted": 0, "media_indexed": 0}


def read_phash_progress(
    state_dir: str, spark: SparkSession | None = None
) -> dict:
    """Cumulative counters: last applied batch id, pair rows emitted,
    media indexed."""
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("read_phash_progress needs an active SparkSession")
    return statefs.read_json_state(
        spark, _progress_path(state_dir), _DEFAULT_PROGRESS
    )


def compact_phash_state(spark, state_dir: str, pairs_path: str) -> None:
    """Compact the block-index scopes AND the pairs sink of a DRAINED
    or paused stream (one scope per micro-batch each); probe results
    and pair rows are preserved exactly."""
    from kinesis_vcr_spark.operators.compaction import compact_scoped_state
    from kinesis_vcr_spark.operators.phash import compact_phash_index

    compact_phash_index(spark, f"{state_dir}/index")
    compact_scoped_state(spark, pairs_path)


def apply_phash_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    pairs_path: str,
    *,
    pixel_fn: PixelFn = real_pixels,
    hash_col: str = "phash",
    blocks: int = 4,
    max_hamming: int = 3,
) -> None:
    """Apply one micro-batch: append its block rows (overwrite scope),
    probe the accumulated index with the batch's own scope excluded,
    write the pairs into the batch's own overwrite scope, bump the
    watermark. Public so tests can drive crash-replays directly."""
    spark = batch_df.sparkSession
    index_path = f"{state_dir}/index"
    progress_path = _progress_path(state_dir)
    progress = statefs.read_json_state(spark, progress_path, _DEFAULT_PROGRESS)
    if batch_id <= progress["last_batch_id"]:
        return  # replayed after restart — pairs + append already done
    label = f"b{batch_id}"
    append_phash_index(
        batch_df, index_path,
        pixel_fn=pixel_fn, hash_col=hash_col, blocks=blocks,
        ingest_label=label,
    )
    pairs = phash_probe_index(
        batch_df, index_path,
        pixel_fn=pixel_fn, max_hamming=max_hamming, exclude_ingest=label,
    )
    pairs.write.mode("overwrite").parquet(f"{pairs_path}/ingest={label}")
    n_media = batch_df.count()
    n_pairs = spark.read.parquet(f"{pairs_path}/ingest={label}").count()
    statefs.write_json_state(
        spark,
        progress_path,
        {
            "last_batch_id": batch_id,
            "pairs_emitted": progress["pairs_emitted"] + int(n_pairs),
            "media_indexed": progress["media_indexed"] + int(n_media),
        },
    )


def streaming_phash_dedup(
    media: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    pairs_path: str,
    *,
    pixel_fn: PixelFn = real_pixels,
    hash_col: str = "phash",
    blocks: int = 4,
    max_hamming: int = 3,
    available_now: bool = True,
):
    """Start the append-then-probe loop over a streaming MEDIA_SCHEMA
    frame. The block index lives under ``{state_dir}/index``; per-batch
    pairs ``(id_a, id_b, hamming)`` append to ``pairs_path``. media_id
    must be unique across the whole stream (the family's ingest key)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        apply_phash_batch(
            batch_df, batch_id, state_dir, pairs_path,
            pixel_fn=pixel_fn, hash_col=hash_col,
            blocks=blocks, max_hamming=max_hamming,
        )

    writer = (
        media.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
