"""Product quantization: deterministic training, exact-code invariants,
Lloyd improvement, and measured ADC recall vs the brute-force baseline."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.ivf import _normalize_rows
from kinesis_vcr_spark.operators.pq import (
    _encode_batch,
    pq_adc_topk,
    pq_decode,
    pq_encode_table,
    train_pq,
)
from kinesis_vcr_spark.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_train_is_deterministic(spark, emb):
    a = train_pq(emb, m=8, ksub=16, refine_iterations=1)
    b = train_pq(emb, m=8, ksub=16, refine_iterations=1)
    assert a.shape == (8, 16, 8)
    np.testing.assert_array_equal(a, b)


def test_dim_not_divisible_raises(spark, emb):
    with pytest.raises(ValueError, match="not divisible"):
        train_pq(emb, m=7, ksub=4, refine_iterations=0)


def test_identical_vectors_identical_codes(spark, emb):
    """Planted twins must collide exactly in code space — the invariant
    that makes PQ codes usable as a dedup/blocking key too."""
    cb = train_pq(emb, m=8, ksub=16, refine_iterations=0)
    twins = emb.limit(20).withColumn(
        "vec_id", F.col("vec_id") + F.lit(10_000_000)
    )
    codes = {
        r.vec_id: tuple(r.codes)
        for r in pq_encode_table(emb.limit(20).union(twins), cb).collect()
    }
    for vid in list(codes):
        if vid >= 10_000_000:
            assert codes[vid] == codes[vid - 10_000_000]


def test_decode_roundtrip_of_subcentroid_vectors(spark, emb):
    """A vector assembled FROM the codebook reconstructs bit-exactly
    (its sub-distances are zero in every subspace)."""
    cb = train_pq(emb, m=8, ksub=16, refine_iterations=1)
    # build 5 synthetic vectors = concatenation of chosen sub-centroids
    chosen = np.array(
        [[(i + s) % 16 for s in range(8)] for i in range(5)], dtype=np.int64
    )
    mat = pq_decode(chosen, cb)
    codes = _encode_batch(mat, cb)
    np.testing.assert_array_equal(codes, chosen)
    np.testing.assert_allclose(pq_decode(codes, cb), mat)


def test_lloyd_refinement_reduces_quantization_error(spark, emb):
    """One Lloyd step must not increase the mean squared reconstruction
    error over the training set (the textbook monotonicity guarantee)."""
    rows = emb.select("embedding").collect()
    mat = _normalize_rows(
        np.array([list(r.embedding) for r in rows], dtype=np.float64)
    )

    def mse(cb):
        rec = pq_decode(_encode_batch(mat, cb), cb)
        return float(((mat - rec) ** 2).sum(axis=1).mean())

    cb0 = train_pq(emb, m=8, ksub=16, refine_iterations=0)
    cb1 = train_pq(emb, m=8, ksub=16, refine_iterations=1)
    assert mse(cb1) <= mse(cb0) + 1e-12


def test_adc_self_retrieval_and_recall(spark, emb):
    """Every probe retrieves itself at rank 1 (its own codes maximize
    its own ADC table by construction of the encoder on in-corpus
    vectors), and recall@5 vs the exact cosine top-5 clears 0.45 at the
    query config with margin for fixture regeneration (32x32;
    measured 0.725 on the near-random fixture — PQ's adversarial case,
    real embeddings cluster far better)."""
    from collections import defaultdict

    from kinesis_vcr_spark.operators.similarity import cosine_topk
    from kinesis_vcr_spark.queries.similarity import _probe_set

    cb = train_pq(emb, m=32, ksub=32, refine_iterations=1)
    codes = pq_encode_table(emb, cb)
    got = pq_adc_topk(codes, _probe_set(emb), cb, k=6).collect()

    by_query = defaultdict(list)
    for r in got:
        by_query[r.query_id].append(r)
    exact = defaultdict(set)
    for r in cosine_topk(emb, _probe_set(emb), k=5).collect():
        exact[r.query_id].add(r.vec_id)

    recalls, self_rank1 = [], 0
    for qid, rows in by_query.items():
        ranked = sorted(rows, key=lambda r: r.rank)
        # L2-encode vs IP-ADC differ by a ||c||^2/2 term, so exact
        # rank-1 self-retrieval is expected but not guaranteed — demand
        # top-3 always and rank-1 for most probes
        self_pos = [r.vec_id for r in ranked].index(qid)
        assert self_pos < 3, f"query {qid} self-retrieved at {self_pos}"
        self_rank1 += self_pos == 0
        neighbors = [r.vec_id for r in ranked if r.vec_id != qid][:5]
        recalls.append(len(set(neighbors) & exact[qid]) / 5)
    assert len(recalls) == 8
    assert self_rank1 >= 5
    assert sum(recalls) / len(recalls) >= 0.45
