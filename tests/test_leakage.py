"""Cross-split near-dup leakage audit (operators/leakage.py, E92):
classification normalization, report counting semantics against a
hand-built corpus with known twins, and determinism of the split."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.leakage import (
    classify_pairs_by_split,
    split_leakage_report,
)


def _corpus(spark):
    """Three twin groups with forced splits: docs 1/2 near-identical
    (train+val -> leak), 3/4 near-identical (train+train -> in-split
    dup), 5/6 near-identical (val+test -> cross-eval), 7 unique."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        Row(doc_id=1, text=base + " one", split="train"),
        Row(doc_id=2, text=base + " two", split="val"),
        Row(doc_id=3, text=base + " three", split="train"),
        Row(doc_id=4, text=base + " four", split="train"),
        Row(doc_id=5, text=base + " five", split="val"),
        Row(doc_id=6, text=base + " six", split="test"),
        Row(doc_id=7, text="totally different words entirely here now",
            split="train"),
    ]
    return spark.createDataFrame(rows)


def test_classify_normalizes_split_order(spark):
    pairs = spark.createDataFrame([Row(id_a=1, id_b=2), Row(id_a=3, id_b=4)])
    tagged = spark.createDataFrame(
        [Row(doc_id=1, split="val"), Row(doc_id=2, split="train"),
         Row(doc_id=3, split="train"), Row(doc_id=4, split="train")]
    )
    got = {
        (r["split_a"], r["split_b"])
        for r in classify_pairs_by_split(
            pairs, tagged, "doc_id", "split"
        ).collect()
    }
    # (val, train) normalizes to (train, val) regardless of side
    assert got == {("train", "val"), ("train", "train")}


def test_report_counts_hand_corpus(spark):
    """All ten-word-base docs are pairwise near-dups of each other
    (J of 3-shingle sets is high when only the last token differs), so
    the report must classify every cross/same-split pair of docs 1-6
    and never involve doc 7."""
    docs = _corpus(spark)
    rows = {
        (r["split_a"], r["split_b"]): (r["n_pairs"], r["n_docs"])
        for r in split_leakage_report(
            docs, "doc_id", "text", threshold=0.6
        ).collect()
    }
    # docs 1-6 all share the 8 interior shingles of the common base →
    # 15 pairs across {train:1,3,4}{val:2,5}{test:6}
    assert rows[("train", "train")] == (3, 3)  # (1,3)(1,4)(3,4)
    assert rows[("train", "val")] == (6, 5)  # {1,3,4}x{2,5}
    assert rows[("test", "train")] == (3, 4)  # {1,3,4}x{6}
    assert rows[("val", "val")] == (1, 2)  # (2,5)
    assert rows[("test", "val")] == (2, 3)  # {2,5}x{6}
    assert sum(p for p, _ in rows.values()) == 15
    # doc 7 (unique text) never appears: total distinct docs ≤ 6 per row
    assert all(d <= 6 for _, d in rows.values())


def test_driver_query_runs_and_is_deterministic(spark, sf_dir):
    from kinesis_vcr_spark.queries.llmprep import split_leakage_audit

    a = split_leakage_audit(spark, sf_dir).collect()
    b = split_leakage_audit(spark, sf_dir).collect()
    assert a == b
    assert all(r["split_a"] <= r["split_b"] for r in a)
    assert all(r["n_pairs"] >= 1 and r["n_docs"] >= 2 for r in a)
