"""IVF ANN: deterministic index build, recall vs brute force,
exactness at nprobe = k_centroids."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.ivf import ivf_topk, train_centroids
from kinesis_vcr_spark.operators.similarity import cosine_topk
from kinesis_vcr_spark.tables import load_table


def _probes(emb, n=5):
    return emb.where(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_centroids_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    c1 = train_centroids(emb, k=8)
    c2 = train_centroids(emb, k=8)
    assert np.array_equal(c1, c2)
    assert c1.shape == (8, 64)
    # unit rows
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_ivf_full_probe_is_exact(spark, sf_dir):
    """nprobe = k_centroids probes every list ⇒ identical to brute force."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = cosine_topk(emb, _probes(emb), k=5).collect()
    full = ivf_topk(
        emb, _probes(emb), k=5, k_centroids=4, nprobe=4
    ).collect()
    assert {(r["query_id"], r["vec_id"], r["cosine"], r["rank"]) for r in exact} == {
        (r["query_id"], r["vec_id"], r["cosine"], r["rank"]) for r in full
    }


def test_ivf_partial_probe_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {(r["query_id"], r["vec_id"])
             for r in cosine_topk(emb, _probes(emb), k=5).collect()}
    approx = ivf_topk(
        emb, _probes(emb), k=5, k_centroids=8, nprobe=4
    ).collect()
    approx_set = {(r["query_id"], r["vec_id"]) for r in approx}
    assert len(exact & approx_set) / len(exact) >= 0.4
    # candidates are exactly ranked: cosines match brute force where found
    exact_cos = {(r["query_id"], r["vec_id"]): r["cosine"]
                 for r in cosine_topk(emb, _probes(emb), k=500,
                                      exclude_self=True).collect()}
    for r in approx:
        assert r["cosine"] == exact_cos[(r["query_id"], r["vec_id"])]
