"""Pipeline metrics listener: pure-core counter folding, JSONL trail,
and live capture from a real micro-batch query."""

from __future__ import annotations

import json
import time

from kinesis_vcr_spark.streaming.metrics import PipelineMetricsListener


def _progress(batch_id=0, rows=100, dur=42, state_rows=7):
    return {
        "id": "q-1",
        "batchId": batch_id,
        "numInputRows": rows,
        "inputRowsPerSecond": 10.0,
        "processedRowsPerSecond": 20.0,
        "durationMs": {"triggerExecution": dur, "addBatch": dur - 5},
        "stateOperators": [{"numRowsTotal": state_rows}],
        "sink": {"description": "MemorySink"},
    }


def test_ingest_folds_counters():
    lst = PipelineMetricsListener(max_history=2)
    lst.ingest(_progress(0, rows=100, dur=42))
    lst.ingest(_progress(1, rows=50, dur=99, state_rows=9))
    lst.ingest(_progress(2, rows=25, dur=10, state_rows=3))
    t = lst.totals()
    assert t["total_input_rows"] == 175
    assert t["num_batches"] == 3
    assert t["max_trigger_execution_ms"] == 99
    assert t["last_state_rows"] == 3
    # bounded history keeps only the most recent
    assert [h["batch_id"] for h in lst.history] == [1, 2]


def test_ingest_tolerates_missing_fields():
    lst = PipelineMetricsListener()
    s = lst.ingest({"id": "q", "batchId": 5})
    assert s["num_input_rows"] == 0
    assert s["state_rows_total"] == 0
    assert lst.totals()["num_batches"] == 1


def test_jsonl_trail(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    lst = PipelineMetricsListener(jsonl_path=path)
    lst.ingest(_progress(0))
    lst.ingest(_progress(1))
    lines = [json.loads(line) for line in open(path)]
    assert [ln["batch_id"] for ln in lines] == [0, 1]
    assert all(ln["num_input_rows"] == 100 for ln in lines)


def test_live_capture_from_micro_batch_query(spark, tmp_path):
    """End-to-end: a real availableNow file-source query reports its
    batches through the registered listener."""
    src = str(tmp_path / "src")
    spark.range(0, 1000).write.mode("overwrite").parquet(src)
    lst = PipelineMetricsListener()
    spark.streams.addListener(lst)
    try:
        q = (
            spark.readStream.schema("id long")
            .parquet(src)
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener delivery is asynchronous — poll briefly
        deadline = time.time() + 30
        while time.time() < deadline and lst.totals()["num_batches"] == 0:
            time.sleep(0.25)
    finally:
        spark.streams.removeListener(lst)
    t = lst.totals()
    assert t["num_batches"] >= 1
    assert t["total_input_rows"] == 1000
