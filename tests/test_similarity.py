"""Similarity search: exact top-k ordering, ANN recall vs brute force."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.similarity import ann_topk, cosine_topk
from kinesis_vcr_spark.tables import load_table


def test_cosine_topk_known_ranking(spark):
    base = [1.0] * 8 + [0.0] * 8
    rows = [
        Row(vec_id=0, embedding=base),
        Row(vec_id=1, embedding=[1.0] * 8 + [0.5] * 8),  # cos ≈ 0.894
        Row(vec_id=2, embedding=[1.0] * 8 + [1.0] * 8),  # cos ≈ 0.707
        Row(vec_id=3, embedding=[0.0] * 8 + [1.0] * 8),  # cos = 0
    ]
    df = spark.createDataFrame(rows)
    q = df.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = cosine_topk(df, q, k=3).orderBy("rank").collect()
    assert [r["vec_id"] for r in got] == [1, 2, 3]
    assert got[0]["cosine"] == 0.894427
    assert got[2]["cosine"] == 0.0


def test_ann_recall_against_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, probes, k=5).collect()
    approx = ann_topk(emb, probes, k=5, planes=32, bands=8).collect()
    exact_set = {(r["query_id"], r["vec_id"]) for r in exact}
    approx_set = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5  # 8 bands x 2-bit rows is a generous filter
    # within candidates the ranking/cosine must be exact
    exact_cos = {(r["query_id"], r["vec_id"]): r["cosine"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["vec_id"])
        if key in exact_cos:
            assert r["cosine"] == exact_cos[key]


def test_adaptive_hyperplane_lsh_sizing():
    """Driver-fixture sizes reproduce the historical 8-bit x 6-band
    shape exactly (oracle rows unchanged); larger corpora widen bands
    so random buckets stay ~16 members (candidates Θ(n·bands))."""
    import math

    import pytest

    from kinesis_vcr_spark.operators.similarity import adaptive_hyperplane_lsh

    for n in (2, 220, 2_200, 4_096):  # sf0.001 .. sf0.1 fixture sizes
        assert adaptive_hyperplane_lsh(n) == (48, 6)

    planes, bands = adaptive_hyperplane_lsh(22_000)
    rows = planes // bands
    assert rows == 11 and bands >= 6  # 2^11 buckets -> ~10.7/bucket

    # recall bound holds at the configured threshold for every width
    for n in (220, 22_000, 10**7, 10**9):
        planes, bands = adaptive_hyperplane_lsh(n, threshold=0.95)
        rows = planes // bands
        p = 1.0 - math.acos(0.95) / math.pi
        assert (1.0 - p**rows) ** bands <= 0.04 + 1e-12
        assert rows <= 24  # width cap: 2^24 buckets/band

    with pytest.raises(ValueError):
        adaptive_hyperplane_lsh(100, threshold=0.0)
    with pytest.raises(ValueError):
        adaptive_hyperplane_lsh(100, target_recall=1.0)
