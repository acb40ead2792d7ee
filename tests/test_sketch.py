"""Portable-HLL sketch properties: determinism, mergeability (the
100 TB property — partial sketches from any split merge to the same
estimate), and accuracy on a known cardinality."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.sketch import (
    HLL_M,
    hll_estimate,
    hll_sketch,
)


def _estimate_of(df):
    out = hll_estimate(
        hll_sketch(df.withColumn("k", F.lit("all")), ["k"], "id"), ["k"]
    ).collect()
    return out[0]["approx_distinct"]


def test_hll_accuracy_10k(spark):
    n = 10_000
    est = _estimate_of(spark.range(n))
    # theoretical std error 1.04/sqrt(256) ≈ 6.5%; allow 3 sigma
    assert abs(est - n) / n < 0.20, est


def test_hll_merge_equals_single_pass(spark):
    df = spark.range(50_000)
    whole = hll_sketch(df.withColumn("k", F.lit("a")), ["k"], "id")
    left = hll_sketch(
        df.where("id % 2 = 0").withColumn("k", F.lit("a")), ["k"], "id"
    )
    right = hll_sketch(
        df.where("id % 2 = 1").withColumn("k", F.lit("a")), ["k"], "id"
    )
    merged = (
        left.unionByName(right)
        .groupBy("k", "bucket")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    a = hll_estimate(whole, ["k"]).collect()[0]["approx_distinct"]
    b = hll_estimate(merged, ["k"]).collect()[0]["approx_distinct"]
    assert a == b  # bit-identical, not just close


def test_hll_duplicates_do_not_move_estimate(spark):
    base = spark.range(5_000)
    dup = base.unionByName(base).unionByName(base)
    assert _estimate_of(base) == _estimate_of(dup)


def test_hll_sketch_bounded_size(spark):
    sk = hll_sketch(
        spark.range(100_000).withColumn("k", F.lit("a")), ["k"], "id"
    )
    assert sk.count() <= HLL_M
