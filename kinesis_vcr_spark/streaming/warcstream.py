"""Streaming WARC ingest: archives → records → extract/score →
clean/quarantine scopes (r10 verdict item 4).

Composes the WARC record explosion (operators/webarchive.py, E100)
with the htmlstream clean/quarantine discipline (streaming/
htmlstream.py): each micro-batch of ``binaryFile`` archive rows
``(path, content)`` is exploded into WARC records, HTTP 200 text/html
responses are extracted + scored with the SAME single projection the
batch path evaluates (:func:`warc_clean_verdicts` is called by both
sides, so the stream cannot drift from batch semantics), and every
record is routed:

- kept documents — ``(source_file, record_idx, target_uri, text,
  pred_lang, q)`` — land under ``{out_dir}/clean/ingest=b{id}``;
- everything else — non-response records, non-HTML or non-200
  responses, and extraction/language/quality rejects — lands under
  ``{out_dir}/quarantine/ingest=b{id}`` with its reason.

Replay safety is the shared ingest contract: a batch-id watermark
(statefs progress JSON) skips re-delivered batches whole, and the two
scope writes are per-batch ``ingest=b{id}`` overwrites, so a crash
between the writes and the watermark bump replays into identical
bytes (pinned in tests/test_warcstream.py, same as every other loop).

100 TB posture: the record explosion is one Arrow mapInPandas stage
whose parallelism is the archive-file count (~64k files per Common
Crawl snapshot — far above any executor count) and the verdict
projection is a narrow whole-stage-codegen select — no shuffle
anywhere on the ingest path; per-batch output partitioning follows
the source partitioning.

Reference anchor: the reference's record path applies per-record
transform/filter hooks as the stream lands
(.../kinesis/KinesisRecorder.java:23-49, ITransformer/IFilter); this
loop is the web-archive instance of that shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_vcr_spark import statefs
from kinesis_vcr_spark.operators.webarchive import warc_records
from kinesis_vcr_spark.streaming.htmlstream import (
    VERDICT_KEPT,
    html_quality_verdicts,
)

#: quarantine vocabulary beyond htmlstream's (which this module reuses
#: for the extract/lang/quality stages)
VERDICT_NON_DOCUMENT = "quarantined_non_document"

_DEFAULT_PROGRESS = {
    "last_batch_id": -1,
    "records_seen": 0,
    "docs_kept": 0,
    "records_quarantined": 0,
}


def _progress_path(state_dir: str) -> str:
    return f"{state_dir}/progress.json"


def read_warc_progress(
    state_dir: str, spark: SparkSession | None = None
) -> dict:
    """Cumulative counters: last applied batch id, WARC records seen,
    documents kept, records quarantined. FS-agnostic (statefs)."""
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("read_warc_progress needs an active SparkSession")
    return statefs.read_json_state(
        spark, _progress_path(state_dir), _DEFAULT_PROGRESS
    )


def warc_clean_verdicts(
    files: DataFrame,
    *,
    keep_lang: str = "en",
    quality_threshold: float = 0.6,
) -> DataFrame:
    """Archives → records → verdicts, the single projection the batch
    path and the streaming loop both evaluate (prefix parity by
    construction — scoring is per-record, no cross-batch state).

    A record is a DOCUMENT candidate iff it is an HTTP 200 response
    whose Content-Type says text/html; everything else quarantines as
    ``quarantined_non_document`` (crawl archives are mostly request/
    metadata/robots records — the audit trail must say so, not drop
    them silently). Candidates run the htmlstream extract/langid/
    quality projection over the decoded body.

    Output: ``(source_file, record_idx, target_uri, text, pred_lang,
    q, verdict)``.
    """
    recs = warc_records(files)
    is_doc = F.coalesce(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("http_content_type").startswith("text/html"),
        F.lit(False),
    )
    base = recs.select(
        "source_file",
        "record_idx",
        "target_uri",
        is_doc.alias("__is_doc"),
        F.when(is_doc, F.decode("payload", "UTF-8")).alias("html"),
    )
    scored = html_quality_verdicts(
        base,
        id_col="source_file",
        html_col="html",
        keep_lang=keep_lang,
        quality_threshold=quality_threshold,
        carry_cols=("record_idx", "target_uri", "__is_doc"),
    )
    verdict = F.when(
        ~F.col("__is_doc"), F.lit(VERDICT_NON_DOCUMENT)
    ).otherwise(F.col("verdict"))
    return scored.select(
        "source_file",
        "record_idx",
        "target_uri",
        F.when(F.col("__is_doc"), F.col("text")).alias("text"),
        "pred_lang",
        "q",
        verdict.alias("verdict"),
    )


def apply_warc_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    out_dir: str,
    *,
    keep_lang: str = "en",
    quality_threshold: float = 0.6,
) -> None:
    """Apply one micro-batch of archive files: explode + score every
    record, write kept docs to the clean scope and everything else
    (with reason) to the quarantine scope — both ``ingest=b{id}``
    overwrites — then bump the watermark. Public so tests can drive
    crash-replays directly."""
    spark = batch_df.sparkSession
    progress_path = _progress_path(state_dir)
    progress = statefs.read_json_state(
        spark, progress_path, _DEFAULT_PROGRESS
    )
    if batch_id <= progress["last_batch_id"]:
        return  # re-delivered after restart: both writes already landed
    label = f"b{batch_id}"
    verdicts = warc_clean_verdicts(
        batch_df, keep_lang=keep_lang, quality_threshold=quality_threshold,
    )
    kept = F.col("verdict") == VERDICT_KEPT
    verdicts.where(kept).select(
        "source_file", "record_idx", "target_uri", "text", "pred_lang", "q"
    ).write.mode("overwrite").parquet(f"{out_dir}/clean/ingest={label}")
    verdicts.where(~kept).select(
        "source_file", "record_idx", "target_uri",
        F.col("verdict").alias("reason"), "pred_lang", "q",
    ).write.mode("overwrite").parquet(f"{out_dir}/quarantine/ingest={label}")
    # counters from the landed files (what actually persisted), not
    # the in-flight frame — same discipline as the other loops
    n_kept = spark.read.parquet(f"{out_dir}/clean/ingest={label}").count()
    n_quar = spark.read.parquet(
        f"{out_dir}/quarantine/ingest={label}"
    ).count()
    statefs.write_json_state(spark, progress_path, {
        "last_batch_id": batch_id,
        "records_seen": progress["records_seen"] + int(n_kept + n_quar),
        "docs_kept": progress["docs_kept"] + int(n_kept),
        "records_quarantined": (
            progress["records_quarantined"] + int(n_quar)
        ),
    })


def compact_warc_state(spark, out_dir: str) -> None:
    """Collapse the per-batch clean/quarantine scopes of a drained
    stream (row-preserving — readers union scopes, so collapsing them
    is invariant)."""
    from kinesis_vcr_spark.operators.compaction import (  # noqa: PLC0415
        compact_scoped_state,
    )

    compact_scoped_state(spark, f"{out_dir}/clean")
    compact_scoped_state(spark, f"{out_dir}/quarantine")


def streaming_warc_ingest(
    files: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    *,
    keep_lang: str = "en",
    quality_threshold: float = 0.6,
    available_now: bool = True,
):
    """Start the archives→records→extract→quarantine loop over a
    streaming ``binaryFile`` frame watching a landing directory for
    new archive files — note streaming file sources require the
    schema spelled out::

        spark.readStream.format("binaryFile").schema(
            "path string, modificationTime timestamp, "
            "length long, content binary").load(landing_dir)

    Clean docs land under ``{out_dir}/clean``, every other record
    under ``{out_dir}/quarantine``; a re-delivered batch is skipped
    whole via the batch-id watermark."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        apply_warc_batch(
            batch_df, batch_id, state_dir, out_dir,
            keep_lang=keep_lang, quality_threshold=quality_threshold,
        )

    writer = (
        files.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
