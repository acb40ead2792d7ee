"""operators/novelty_index.py — incremental novelty vs full recompute parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.novelty import doc_ngram_novelty
from kinesis_vcr_spark.operators.novelty_index import (
    build_novelty_index,
    compact_novelty_index,
    load_novelty_index,
    novelty_against_index,
    update_novelty_index,
)
from kinesis_vcr_spark.tables import load_table


@pytest.fixture()
def split_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mid = docs.agg(F.expr("percentile(doc_id, 0.8)")).first()[0]
    old = docs.where(F.col("doc_id") <= mid)
    new = docs.where(F.col("doc_id") > mid)
    return old, new


def _rows(df):
    return sorted(
        (r["doc_id"], r["total_ngrams"], r["novel_ngrams"], r["novelty"])
        for r in df.collect()
    )


def test_probe_parity_with_full_recompute(spark, sf_dir, tmp_path, split_docs):
    old, new = split_docs
    idx = str(tmp_path / "nidx")
    build_novelty_index(old, idx)

    got = _rows(novelty_against_index(spark, idx, new))
    full = doc_ngram_novelty(old.unionByName(new))
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    want = sorted(
        (r["doc_id"], r["total_ngrams"], r["novel_ngrams"], r["novelty"])
        for r in full.collect()
        if r["doc_id"] in new_ids
    )
    assert got == want
    assert len(got) == len(new_ids)


def test_update_then_probe_next_batch(spark, sf_dir, tmp_path, split_docs):
    old, new = split_docs
    # split "new" into two consecutive days
    mid = new.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
    day1 = new.where(F.col("doc_id") <= mid)
    day2 = new.where(F.col("doc_id") > mid)
    idx = str(tmp_path / "nidx")
    build_novelty_index(old, idx)
    update_novelty_index(spark, idx, day1)

    got = _rows(novelty_against_index(spark, idx, day2))
    full = doc_ngram_novelty(old.unionByName(day1).unionByName(day2))
    day2_ids = {r["doc_id"] for r in day2.select("doc_id").collect()}
    want = sorted(
        (r["doc_id"], r["total_ngrams"], r["novel_ngrams"], r["novelty"])
        for r in full.collect()
        if r["doc_id"] in day2_ids
    )
    assert got == want


def test_update_rejects_non_monotone_ids(spark, tmp_path, split_docs):
    old, new = split_docs
    idx = str(tmp_path / "nidx")
    build_novelty_index(old, idx)
    with pytest.raises(ValueError, match="monotone ingest ids"):
        update_novelty_index(spark, idx, old.limit(5))


def test_update_appends_only_new_shingles(spark, tmp_path, split_docs):
    old, new = split_docs
    idx = str(tmp_path / "nidx")
    build_novelty_index(old, idx)
    before = load_novelty_index(spark, idx)
    n_before = before.count()
    assert before.select("shingle").distinct().count() == n_before

    update_novelty_index(spark, idx, new)
    after = load_novelty_index(spark, idx)
    # still distinct, monotone growth, old rows untouched
    assert after.select("shingle").distinct().count() == after.count()
    assert after.count() >= n_before
    old_rows = {r["shingle"]: r["first_seen"] for r in before.collect()}
    for r in after.collect():
        if r["shingle"] in old_rows:
            assert r["first_seen"] == old_rows[r["shingle"]]


def test_compact_preserves_content(spark, tmp_path, split_docs):
    old, new = split_docs
    idx = str(tmp_path / "nidx")
    build_novelty_index(old, idx)
    update_novelty_index(spark, idx, new)
    before = {
        (r["shingle"], r["first_seen"])
        for r in load_novelty_index(spark, idx).collect()
    }
    compact_novelty_index(spark, idx)
    after = {
        (r["shingle"], r["first_seen"])
        for r in load_novelty_index(spark, idx).collect()
    }
    assert before == after
    # probing still works against the compacted generation
    assert novelty_against_index(spark, idx, new.limit(0)).count() == 0


def test_bloom_probe_is_one_sided_and_tight(spark, sf_dir, tmp_path, split_docs):
    """Bloom novelty: never OVER-counts (no false negatives in the
    filter => an indexed shingle can't look novel), and at the classic
    10 bits/key sizing the shortfall vs exact stays within a few
    percent of each doc's novel count."""
    from kinesis_vcr_spark.operators.novelty_index import (
        build_novelty_bloom,
        novelty_against_bloom,
    )

    old, new = split_docs
    idx = str(tmp_path / "nidx")
    build_novelty_index(old, idx)
    exact = {
        r["doc_id"]: r
        for r in novelty_against_index(spark, idx, new).collect()
    }
    bloom = build_novelty_bloom(load_novelty_index(spark, idx)).persist()
    approx = {
        r["doc_id"]: r
        for r in novelty_against_bloom(bloom, new).collect()
    }
    assert set(approx) == set(exact)
    total_exact = total_approx = 0
    for doc_id, e in exact.items():
        a = approx[doc_id]
        assert a["total_ngrams"] == e["total_ngrams"]
        assert a["novel_ngrams"] <= e["novel_ngrams"]  # one-sided
        total_exact += e["novel_ngrams"]
        total_approx += a["novel_ngrams"]
    # aggregate shortfall bounded by a generous multiple of the ~<1%
    # design FP rate (fixture vocab is far under capacity)
    assert total_approx >= 0.95 * total_exact
    bloom.unpersist()
