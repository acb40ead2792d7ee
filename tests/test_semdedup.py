"""SemDeDup semantic dedup (operators/semdedup.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Row

from kinesis_vcr_spark.operators.semdedup import semantic_dedup


def _emb(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in vecs]
    )


def _two_blobs(rng, n_per, dim=16, spread=0.05):
    """Two well-separated clusters around orthogonal-ish centers."""
    c1 = np.zeros(dim); c1[0] = 1.0
    c2 = np.zeros(dim); c2[1] = 1.0
    out = []
    for i in range(n_per):
        out.append((i, c1 + rng.normal(0, spread, dim)))
        out.append((100 + i, c2 + rng.normal(0, spread, dim)))
    return out


def test_identical_twins_dropped_originals_kept(spark):
    rng = np.random.default_rng(5)
    base = _two_blobs(rng, 10)
    twins = [(1000 + i, v) for i, v in base if i % 3 == 0]
    # 0.999: same-blob non-identical pairs sit near cos ≈ 0.98 (noise
    # 0.05 × 16 dims), identical twins at exactly 1.0
    verdict = semantic_dedup(
        _emb(spark, base + twins), threshold=0.999, k_clusters=2
    ).collect()
    by_id = {r.vec_id: r for r in verdict}
    for tid, _ in twins:
        assert not by_id[tid].keep
        assert by_id[tid].group == tid - 1000  # kept rep = original id
    for oid, _ in base:
        assert by_id[oid].keep
    assert len(verdict) == len(base) + len(twins)  # every item verdicted


def test_no_near_dups_all_kept(spark):
    rng = np.random.default_rng(9)
    # random unit-ish vectors: pairwise cosine ≪ 0.99
    vecs = [(i, rng.normal(0, 1, 16)) for i in range(30)]
    verdict = semantic_dedup(
        _emb(spark, vecs), threshold=0.99, k_clusters=4
    ).collect()
    assert all(r.keep for r in verdict)


def test_single_cluster_matches_brute_force(spark):
    """k=1 disables the clustering approximation: the ε-ball grouping
    must equal brute-force transitive closure."""
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.001, 0.0]),   # dup of 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 1.0, 0.001]),   # dup of 2
        (4, [0.0, 0.0, 1.0]),     # unique
    ]
    verdict = {r.vec_id: r for r in semantic_dedup(
        _emb(spark, vecs), threshold=0.999, k_clusters=1).collect()}
    assert verdict[0].keep and verdict[1].group == 0 and not verdict[1].keep
    assert verdict[2].keep and verdict[3].group == 2 and not verdict[3].keep
    assert verdict[4].keep and verdict[4].group == 4


def test_cluster_member_cap(spark):
    """A cluster above the member cap contributes no pairs — nothing
    in it is dropped (quadratic-blowup guard, recall sacrificed
    knowingly, mirroring the LSH hot-band cap)."""
    vecs = [(i, [1.0, 0.0001 * i]) for i in range(20)]  # one dense blob
    verdict = semantic_dedup(
        _emb(spark, vecs), threshold=0.9, k_clusters=1,
        max_cluster_members=5,
    ).collect()
    assert all(r.keep for r in verdict)
