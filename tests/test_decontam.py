"""Fuzzy benchmark decontamination (E107, r12): the bipartite
MinHash-LSH candidate machine + exact-Jaccard verification, and the
planted-leak recovery of the decontam_fuzzy driver row."""

from __future__ import annotations

from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# fuzzy decontamination (E107, r12)
# ---------------------------------------------------------------------------


def test_bipartite_minhash_finds_cross_pairs_only(spark):
    """The bipartite candidate machine joins ACROSS the two tables —
    near-dups within one side never pair."""
    from pyspark.sql import Row

    from kinesis_vcr_spark.operators.dedup import (
        near_dup_pairs_minhash_bipartite,
    )

    base = ("the quick brown fox jumps over the lazy dog near the "
            "river bank every single morning before sunrise " * 3)
    left = spark.createDataFrame([
        Row(doc_id=1, text=base),
        Row(doc_id=2, text=base + " with a tiny edit"),  # near-dup of 1
        Row(doc_id=3, text="completely unrelated words about spark "
                           "plans and shuffles and joins " * 5),
    ])
    right = spark.createDataFrame([
        Row(bench_id=10, text=base + " plus another light edit"),
    ])
    got = {
        (r["doc_id"], r["bench_id"])
        for r in near_dup_pairs_minhash_bipartite(
            left, right, "doc_id", "bench_id", threshold=0.6
        ).collect()
    }
    assert got == {(1, 10), (2, 10)}  # 1-2 intra-left pair NOT emitted


def test_bipartite_same_id_name_rejected(spark):
    from kinesis_vcr_spark.operators.dedup import (
        near_dup_pairs_minhash_bipartite,
    )
    import pytest

    df = spark.range(1).selectExpr("id AS doc_id", "'x' AS text")
    with pytest.raises(ValueError, match="must differ"):
        near_dup_pairs_minhash_bipartite(df, df, "doc_id", "doc_id")


def test_decontam_fuzzy_recovers_every_planted_leak(spark, sf_dir):
    """Every planted lightly-edited benchmark copy must be flagged
    with max_jaccard >= the threshold (the leak fuzzy decontam exists
    for); exact n-gram decontam semantics are untouched."""
    from kinesis_vcr_spark.queries.dedup import (
        DECONTAM_FUZZY_MOD,
        J_THRESHOLD,
        decontam_fuzzy,
    )
    from kinesis_vcr_spark.tables import load_table

    got = {r["doc_id"]: r for r in decontam_fuzzy(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    # the planted-leak offset is derived (max(doc_id) + 1), never a
    # fixed constant that a large-sf id space could overrun
    offset = docs.agg(F.max("doc_id")).first()[0] + 1
    bench_ids = [
        r["doc_id"]
        for r in docs.where(F.col("doc_id") % DECONTAM_FUZZY_MOD == 0)
        .select("doc_id").collect()
    ]
    assert bench_ids
    for b in bench_ids:
        leaked = b + offset
        assert leaked in got, f"planted leak {leaked} missed"
        assert got[leaked]["max_jaccard"] >= J_THRESHOLD


def test_decontaminate_fuzzy_keep_verb(spark):
    """The production keep-verb: flagged near-dups of the benchmark
    are dropped with the full input schema preserved; clean docs and
    intra-corpus near-dups (not benchmark-related) survive."""
    from pyspark.sql import Row

    from kinesis_vcr_spark.operators.decontam import decontaminate_fuzzy

    bench_text = ("what is the capital of france the capital of "
                  "france is paris a city on the seine " * 3)
    corpus = spark.createDataFrame([
        Row(doc_id=1, text=bench_text + " plus a light paste edit",
            source="crawl"),
        Row(doc_id=2, text="completely unrelated document about spark "
                           "shuffle planning and exchanges " * 4,
            source="crawl"),
        Row(doc_id=3, text="completely unrelated document about spark "
                           "shuffle planning and exchanges with an edit " * 4,
            source="books"),
    ])
    bench = spark.createDataFrame([Row(doc_id=100, text=bench_text)])
    kept = decontaminate_fuzzy(corpus, bench, "doc_id", "text",
                               threshold=0.6)
    assert kept.columns == ["doc_id", "text", "source"]
    assert {r["doc_id"] for r in kept.collect()} == {2, 3}
