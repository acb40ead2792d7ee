"""Streaming n-gram novelty scoring against the persisted shingle
index — the E111 curation signal as a continuously-ingesting stream.

Per micro-batch (the streaming/neardup.py loop shape): PROBE the batch
against the accumulated shingle index (novelty of each new doc vs
everything ingested before it — O(batch) shingling, one join against
the stored vocabulary), emit per-doc scores to an ingest-scoped
parquet sink, then APPEND the batch's index-new shingles so the next
batch sees them.

Ordering contract — STRONGER than the near-dup stream's: novelty is
defined by ingest order (first_seen = min doc_id), so batches must
arrive in MONOTONE doc-id order (each batch's ids all greater than
everything indexed). The near-dup stream's pair set is order-
insensitive; a novelty score is not. Violations raise loudly in the
batch loop (the job fails rather than emitting silently-wrong scores
— the same contract as update_novelty_index).

Exactness contract (tests/test_noveltystream.py): after the stream
drains, the union of emitted scores equals ``doc_ngram_novelty`` over
the full corpus — each doc scored exactly once, by its own batch,
with corpus-global first-seen semantics.

Restart safety: foreachBatch is at-least-once; the progress file
records the last applied batch id, every write is scoped to
``ingest=b{id}`` and OVERWRITES its own scope, and the probe EXCLUDES
the batch's own scope — so a crash between the index append and the
progress bump replays to identical output (the ADVICE r06 discipline).

State plumbing is FS-agnostic (statefs.py): any Spark-writable URI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_vcr_spark import statefs
from kinesis_vcr_spark.operators.novelty import ngram_first_seen, shingle_edges

_DEFAULT_PROGRESS = {
    "last_batch_id": -1,
    "docs_scored": 0,
    "shingles_indexed": 0,
}


def _progress_path(state_dir: str) -> str:
    return f"{state_dir}/progress.json"


def read_novelty_progress(
    state_dir: str, spark: SparkSession | None = None
) -> dict:
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("read_novelty_progress needs an active SparkSession")
    return statefs.read_json_state(
        spark, _progress_path(state_dir), _DEFAULT_PROGRESS
    )


def _load_index(
    spark: SparkSession, shingles_path: str, exclude_ingest: str
) -> DataFrame | None:
    """Scoped index read minus the given ingest label (crash-replay
    exclusion). None before the first append."""
    if not statefs.path_exists(spark, shingles_path):
        return None
    return (
        spark.read.parquet(shingles_path)
        .where(F.col("ingest") != exclude_ingest)
        .drop("ingest")
    )


def compact_novelty_state(
    spark: SparkSession, state_dir: str, scores_path: str
) -> None:
    """Compact the per-batch ingest scopes a long-lived stream
    accumulates — index and scores sink both (one scope per
    micro-batch each). Drained/paused streams only (the
    compact_scoped_state swap contract)."""
    from kinesis_vcr_spark.operators.compaction import (  # noqa: PLC0415
        compact_scoped_state,
    )

    compact_scoped_state(spark, f"{state_dir}/index/shingles")
    compact_scoped_state(spark, scores_path)


def streaming_novelty(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    state_dir: str,
    checkpoint_dir: str,
    scores_path: str,
    *,
    n: int = 3,
    available_now: bool = True,
):
    """Start the probe-then-append novelty loop over a streaming
    document frame. The shingle index lives under
    ``{state_dir}/index/shingles`` (ingest-scoped parquet); per-doc
    scores ``(id, total_ngrams, novel_ngrams, novelty)`` land under
    ``{scores_path}/ingest=b{N}``."""
    shingles_path = f"{state_dir}/index/shingles"
    progress_path = _progress_path(state_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        progress = statefs.read_json_state(
            spark, progress_path, _DEFAULT_PROGRESS
        )
        if batch_id <= progress["last_batch_id"]:
            return  # fully applied before a restart
        label = f"b{batch_id}"

        edges = shingle_edges(batch_df, id_col, text_col, n).persist()
        batch_first = ngram_first_seen(edges, id_col).withColumnRenamed(
            "first_seen", "batch_first"
        )
        stored = _load_index(spark, shingles_path, exclude_ingest=label)

        if stored is not None:
            # monotone-ingest guard: novelty semantics break silently
            # if ids interleave with what is already indexed
            max_indexed = stored.agg(F.max("first_seen")).first()[0]
            if max_indexed is not None:
                min_batch = batch_df.agg(F.min(id_col)).first()[0]
                if min_batch is not None and min_batch <= max_indexed:
                    raise ValueError(
                        f"streaming_novelty batch {batch_id}: id "
                        f"{min_batch} ≤ indexed max {max_indexed} — "
                        "novelty requires monotone ingest ids"
                    )
            flagged = edges.join(batch_first, "shingle").join(
                stored.select("shingle", F.lit(True).alias("_indexed")),
                "shingle",
                "left",
            )
            novel = F.col("_indexed").isNull() & (
                F.col("batch_first") == F.col(id_col)
            )
        else:
            flagged = edges.join(batch_first, "shingle")
            novel = F.col("batch_first") == F.col(id_col)

        scores = (
            flagged.withColumn("_novel", novel.cast("int"))
            .groupBy(id_col)
            .agg(
                F.count("*").alias("total_ngrams"),
                F.sum("_novel").cast("long").alias("novel_ngrams"),
            )
            .select(
                id_col,
                "total_ngrams",
                "novel_ngrams",
                F.round(
                    F.col("novel_ngrams").cast("double")
                    / F.col("total_ngrams").cast("double"),
                    6,
                ).alias("novelty"),
            )
        )
        scores.write.mode("overwrite").parquet(
            f"{scores_path}/ingest={label}"
        )

        new_first = ngram_first_seen(edges, id_col)
        if stored is not None:
            new_first = new_first.join(
                stored.select("shingle", F.lit(True).alias("_indexed")),
                "shingle",
                "left",
            ).where(F.col("_indexed").isNull()).select("shingle", "first_seen")
        new_first.write.mode("overwrite").parquet(
            f"{shingles_path}/ingest={label}"
        )

        n_docs = batch_df.count()
        n_new = spark.read.parquet(f"{shingles_path}/ingest={label}").count()
        edges.unpersist()
        statefs.write_json_state(
            spark,
            progress_path,
            {
                "last_batch_id": batch_id,
                "docs_scored": progress["docs_scored"] + int(n_docs),
                "shingles_indexed": progress["shingles_indexed"] + int(n_new),
            },
        )

    writer = (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


__all__ = [
    "compact_novelty_state",
    "read_novelty_progress",
    "streaming_novelty",
]
