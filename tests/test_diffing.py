"""Corpus snapshot diffing (operators/diffing.py)."""

from __future__ import annotations

from pyspark.sql import Row

from kinesis_vcr_spark.operators.diffing import corpus_diff, diff_summary


def _snap(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, meta=m) for i, t, m in rows],
        "doc_id long, text string, meta string",
    )


def test_all_four_statuses(spark):
    old = _snap(spark, [
        (1, "same", "x"), (2, "will change", "x"),
        (3, "will vanish", "x"), (5, "null meta", None),
    ])
    new = _snap(spark, [
        (1, "same", "x"), (2, "changed!", "x"),
        (4, "brand new", "x"), (5, "null meta", None),
    ])
    d = {r.doc_id: r.status for r in corpus_diff(
        old, new, ["doc_id"], ["text", "meta"]).collect()}
    assert d == {1: "unchanged", 2: "changed", 3: "removed",
                 4: "added", 5: "unchanged"}
    s = {r.status: r.n_docs for r in diff_summary(corpus_diff(
        old, new, ["doc_id"], ["text", "meta"])).collect()}
    assert s == {"unchanged": 2, "changed": 1, "removed": 1, "added": 1}


def test_null_vs_empty_content_distinct(spark):
    """A column going NULL -> '' is a CHANGE, not 'unchanged' — the
    null-safe digest must distinguish them."""
    old = _snap(spark, [(1, "t", None)])
    new = _snap(spark, [(1, "t", "")])
    d = corpus_diff(old, new, ["doc_id"], ["text", "meta"]).collect()
    assert d[0].status == "changed"


def test_identical_snapshots_all_unchanged(spark):
    snap = _snap(spark, [(i, f"doc {i}", "m") for i in range(50)])
    s = {r.status: r.n_docs for r in diff_summary(
        corpus_diff(snap, snap, ["doc_id"], ["text", "meta"])).collect()}
    assert s == {"unchanged": 50}


def test_digest_injective_under_separator_bytes(spark):
    """Length-prefixed encoding: no byte inside the data can shift
    content between fields — ('a<US>', 'b') != ('a', '<US>b')."""
    old = _snap(spark, [(1, "a\x1f", "b")])
    new = _snap(spark, [(1, "a", "\x1fb")])
    d = corpus_diff(old, new, ["doc_id"], ["text", "meta"]).collect()
    assert d[0].status == "changed"
