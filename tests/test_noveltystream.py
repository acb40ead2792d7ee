"""streaming/noveltystream.py — streamed novelty == full-corpus batch
novelty; restart idempotence; ordering guard; compaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.novelty import doc_ngram_novelty
from kinesis_vcr_spark.streaming.noveltystream import (
    compact_novelty_state,
    read_novelty_progress,
    streaming_novelty,
)
from kinesis_vcr_spark.tables import load_table


def _score_rows(df):
    return sorted(
        (r["doc_id"], r["total_ngrams"], r["novel_ngrams"], r["novelty"])
        for r in df.collect()
    )


def _write_ordered_batches(docs, src, n_batches=3):
    """One file per id-range batch; file source + maxFilesPerTrigger=1
    discovers them in write order, so batches arrive id-ordered (the
    stream's contract)."""
    cuts = docs.approxQuantile(
        "doc_id", [i / n_batches for i in range(1, n_batches)], 0.0
    )
    lo = None
    for i in range(n_batches):
        hi = cuts[i] if i < len(cuts) else None
        part = docs
        if lo is not None:
            part = part.where(F.col("doc_id") > lo)
        if hi is not None:
            part = part.where(F.col("doc_id") <= hi)
        part.coalesce(1).write.parquet(f"{src}/f{i}.parquet")
        lo = hi


def _run(spark, src, state, ckpt, scores):
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = streaming_novelty(stream, "doc_id", "text", state, ckpt, scores)
    q.awaitTermination(600)


@pytest.fixture()
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def test_streamed_scores_equal_full_recompute(spark, docs, tmp_path):
    src = str(tmp_path / "src")
    _write_ordered_batches(docs, src)
    state, ckpt, scores = (
        str(tmp_path / d) for d in ("state", "ckpt", "scores")
    )
    _run(spark, src, state, ckpt, scores)

    got = _score_rows(spark.read.parquet(scores).drop("ingest"))
    want = _score_rows(doc_ngram_novelty(docs))
    assert got == want
    prog = read_novelty_progress(state, spark)
    assert prog["docs_scored"] == docs.count()
    assert prog["last_batch_id"] >= 2


def test_restart_does_not_rescore(spark, docs, tmp_path):
    src = str(tmp_path / "src")
    _write_ordered_batches(docs, src)
    state, ckpt, scores = (
        str(tmp_path / d) for d in ("state", "ckpt", "scores")
    )
    _run(spark, src, state, ckpt, scores)
    before = _score_rows(spark.read.parquet(scores).drop("ingest"))
    prog_before = read_novelty_progress(state, spark)

    # restart over the same checkpoint: no new files → no new scopes,
    # watermark untouched
    _run(spark, src, state, ckpt, scores)
    assert _score_rows(spark.read.parquet(scores).drop("ingest")) == before
    assert read_novelty_progress(state, spark) == prog_before


def test_out_of_order_batch_fails_loudly(spark, docs, tmp_path):
    src = str(tmp_path / "src")
    # f0 = HIGH ids first, f1 = low ids → second batch violates order
    mid = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    docs.where(F.col("doc_id") > mid).coalesce(1).write.parquet(
        f"{src}/f0.parquet"
    )
    docs.where(F.col("doc_id") <= mid).coalesce(1).write.parquet(
        f"{src}/f1.parquet"
    )
    state, ckpt, scores = (
        str(tmp_path / d) for d in ("state", "ckpt", "scores")
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = streaming_novelty(stream, "doc_id", "text", state, ckpt, scores)
    with pytest.raises(Exception, match="monotone ingest ids"):
        q.awaitTermination(600)
        raise RuntimeError("stream should have failed")  # pragma: no cover


def test_compaction_preserves_scores_and_index(spark, docs, tmp_path):
    src = str(tmp_path / "src")
    _write_ordered_batches(docs, src)
    state, ckpt, scores = (
        str(tmp_path / d) for d in ("state", "ckpt", "scores")
    )
    _run(spark, src, state, ckpt, scores)
    scores_before = _score_rows(spark.read.parquet(scores).drop("ingest"))
    idx_before = {
        (r["shingle"], r["first_seen"])
        for r in spark.read.parquet(f"{state}/index/shingles")
        .drop("ingest")
        .collect()
    }
    compact_novelty_state(spark, state, scores)
    assert (
        _score_rows(spark.read.parquet(scores).drop("ingest"))
        == scores_before
    )
    idx_after = {
        (r["shingle"], r["first_seen"])
        for r in spark.read.parquet(f"{state}/index/shingles")
        .drop("ingest")
        .collect()
    }
    assert idx_after == idx_before
