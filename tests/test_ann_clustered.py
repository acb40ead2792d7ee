"""ANN recall on a CLUSTERED embedding fixture (VERDICT r04 item 3).

The sf* `embeddings` fixture is near-random — PQ/IVF/LSH's adversarial
case, where the loose recall bounds in test_pq/test_ivf/test_similarity
live. Real embedding spaces cluster, and on a planted-cluster table the
same operators must clear recall ≥ 0.9; a real ANN regression cannot
hide under the adversarial-fixture slack. Fixture shape follows
tests/test_semdedup.py's planted blobs, scaled up: 40 well-separated
unit centers, 6 members each, tight Gaussian noise, L2-normalized —
cluster size 6 makes each probe's exact top-5 EXACTLY its cluster
mates, so recall@5 measures cluster retrieval (what ANN is for), not
the within-blob fine ranking that quantization deliberately erases
(measured: strict recall tops out ~0.7 at 30-member blobs because PQ
codes inside a tight blob collapse; at 6-member blobs all three
operators measure 1.0).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

N_CLUSTERS = 40
PER_CLUSTER = 6
DIM = 64
NOISE = 0.04  # tight blobs: within-cluster cosine >> cross-cluster


def _unit(v):
    return v / np.linalg.norm(v)


@pytest.fixture(scope="module")
def clustered(spark):
    """(df, cluster_of) — 240 vectors in 40 planted clusters. Centers
    are random unit vectors (seeded), far apart w.h.p. in 64-d; points
    are center + N(0, NOISE) noise, normalized like the production
    embedding pipeline normalizes."""
    rng = np.random.default_rng(42)
    centers = [_unit(rng.normal(0, 1, DIM)) for _ in range(N_CLUSTERS)]
    rows, cluster_of = [], {}
    vid = 0
    for c, center in enumerate(centers):
        for _ in range(PER_CLUSTER):
            vec = _unit(center + rng.normal(0, NOISE, DIM))
            rows.append(Row(vec_id=vid, embedding=[float(x) for x in vec]))
            cluster_of[vid] = c
            vid += 1
    df = spark.createDataFrame(rows).coalesce(4).cache()
    df.count()
    yield df, cluster_of
    df.unpersist()


def _probes(df, n=8):
    # one probe inside each of the first n clusters
    return df.where(F.col("vec_id") % PER_CLUSTER == 3).where(
        F.col("vec_id") < n * PER_CLUSTER
    ).select(F.col("vec_id").alias("query_id"), "embedding")


def _exact_top5(df):
    from kinesis_vcr_spark.operators.similarity import cosine_topk

    return {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(df, _probes(df), k=5).collect()
    }


def _recall(exact, approx_pairs):
    return len(exact & approx_pairs) / len(exact)


def test_fixture_clusters_are_separated(clustered):
    """Sanity: nearest neighbors live in the probe's own cluster — the
    fixture really is the easy case the recall pins assume."""
    df, cluster_of = clustered
    for qid, vid in _exact_top5(df):
        assert cluster_of[qid] == cluster_of[vid]


def test_lsh_recall_on_clustered(clustered):
    from kinesis_vcr_spark.operators.similarity import ann_topk

    df, _ = clustered
    approx = {
        (r["query_id"], r["vec_id"])
        for r in ann_topk(df, _probes(df), k=5, planes=32, bands=8).collect()
    }
    assert _recall(_exact_top5(df), approx) >= 0.9


def test_ivf_recall_on_clustered(clustered):
    from kinesis_vcr_spark.operators.ivf import ivf_topk

    df, _ = clustered
    approx = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(
            df, _probes(df), k=5, k_centroids=8, nprobe=4
        ).collect()
    }
    assert _recall(_exact_top5(df), approx) >= 0.9


def test_pq_recall_on_clustered(clustered):
    """ADC recall@5 ≥ 0.9 (measured 1.0) — the tight bound the
    adversarial fixture can't support (tests/test_pq.py keeps the
    loose one)."""
    from collections import defaultdict

    from kinesis_vcr_spark.operators.pq import pq_adc_topk, pq_encode_table, train_pq

    df, _ = clustered
    cb = train_pq(df, m=32, ksub=32, refine_iterations=1)
    codes = pq_encode_table(df, cb)
    got = pq_adc_topk(codes, _probes(df), cb, k=6).collect()

    by_query = defaultdict(list)
    for r in got:
        by_query[r.query_id].append(r)
    exact = defaultdict(set)
    for q, v in _exact_top5(df):
        exact[q].add(v)

    recalls = []
    for qid, rows in by_query.items():
        ranked = sorted(rows, key=lambda r: r.rank)
        # cluster mates quantize to near-identical codes, so ADC ties
        # are broken by vec_id — self must surface in the top-6 but
        # exact rank-1 is not meaningful under full ties
        assert any(r.vec_id == qid for r in ranked), f"probe {qid} lost itself"
        neighbors = [r.vec_id for r in ranked if r.vec_id != qid][:5]
        recalls.append(len(set(neighbors) & exact[qid]) / 5)
    assert len(recalls) == 8
    assert sum(recalls) / len(recalls) >= 0.9
