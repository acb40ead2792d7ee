"""Cross-split leakage audit (E92).

The step between splitting and training: a train/eval split is only as
clean as its NEAR-duplicate structure — an eval document whose
near-twin sits in train leaks the answer even though exact dedup and
n-gram decontamination both pass (the twin differs by a few tokens).
This operator composes the deterministic hash split
(operators/sampling.py ``train_val_test_split``) with the banded
near-dup join (operators/dedup.py ``near_dup_pairs_minhash``) and
classifies every qualifying pair by the split pair it straddles.

Output contract: one row per unordered split combination
``(split_a <= split_b lexicographically)`` with the qualifying pair
count and the distinct documents involved; cross-split rows
(``split_a != split_b``) are the leakage. Same-split rows are kept —
they are the in-split dup mass the dedup pass should have removed, and
their presence makes the audit a one-stop dedup/leakage report.

100 TB posture: the near-dup join dominates and keeps its pinned
banded-LSH shape (no all-pairs anywhere; candidate volume governed by
the adaptive band sizing / hot-band cap contracts of the dedup
family); the split tag is a zero-shuffle narrow CASE; the two
classification joins are id-keyed equi-joins against a (id, split)
projection; the final aggregation is over ≤ |splits|² rows.

Reference anchor: no counterpart in the reference (853-LoC
record/replay tool) — this is part of the LLM-training-pipeline
surface (SURVEY.md §2.5b) alongside decontamination E28/E66.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.dedup import near_dup_pairs_minhash


def classify_pairs_by_split(
    pairs: DataFrame, tagged: DataFrame, id_col: str, split_col: str
) -> DataFrame:
    """(id_a, id_b, ...) pairs + per-doc split tags → pairs with
    ``split_a``/``split_b`` normalized so split_a <= split_b."""
    s_a = tagged.select(
        F.col(id_col).alias("id_a"), F.col(split_col).alias("_s_a")
    )
    s_b = tagged.select(
        F.col(id_col).alias("id_b"), F.col(split_col).alias("_s_b")
    )
    return (
        pairs.join(s_a, "id_a")
        .join(s_b, "id_b")
        .withColumn("split_a", F.least("_s_a", "_s_b"))
        .withColumn("split_b", F.greatest("_s_a", "_s_b"))
        .drop("_s_a", "_s_b")
    )


def split_leakage_report(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    split_col: str = "split",
    threshold: float = 0.6,
    **minhash_kw,
) -> DataFrame:
    """Near-dup leakage audit over a split-tagged corpus: one row per
    split combination — ``n_pairs`` qualifying near-dup pairs and
    ``n_docs`` distinct documents involved. ``docs`` must already
    carry ``split_col`` (use ``train_val_test_split``); extra kwargs
    reach ``near_dup_pairs_minhash``."""
    pairs = near_dup_pairs_minhash(
        docs, id_col, text_col, threshold=threshold, **minhash_kw
    )
    classified = classify_pairs_by_split(
        pairs, docs.select(id_col, split_col), id_col, split_col
    )
    per_pair = classified.groupBy("split_a", "split_b").agg(
        F.count("*").alias("n_pairs")
    )
    members = classified.select(
        "split_a", "split_b", F.col("id_a").alias("doc")
    ).unionByName(
        classified.select("split_a", "split_b", F.col("id_b").alias("doc"))
    )
    per_doc = members.groupBy("split_a", "split_b").agg(
        F.countDistinct("doc").alias("n_docs")
    )
    # both sides are ≤ |splits|² rows — the join is trivially broadcast
    return per_pair.join(per_doc, ["split_a", "split_b"])
