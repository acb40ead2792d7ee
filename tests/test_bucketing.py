"""Bucketed co-located joins: result parity with a plain join, the
shuffle-free plan shape, and bucket pruning on equality filters."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.bucketing import (
    co_located_join,
    read_bucketed,
    write_bucketed,
)

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    left = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("lv")
    )
    right = spark.range(0, 5000, 2).select(
        F.col("id").alias("k"), (F.col("id") % 31).alias("rv")
    )
    write_bucketed(left, "bkt_left", ["k"], N_BUCKETS)
    write_bucketed(right, "bkt_right", ["k"], N_BUCKETS)
    yield "bkt_left", "bkt_right"
    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_join_matches_plain_join(spark, bucketed_pair):
    lt, rt = bucketed_pair
    got = co_located_join(spark, lt, rt, ["k"]).agg(
        F.count("*").alias("n"), F.sum("lv").alias("s1"), F.sum("rv").alias("s2")
    ).collect()[0]
    assert got["n"] == 2500
    left = spark.table(lt)
    right = spark.table(rt)
    want = left.join(right, "k").agg(
        F.count("*").alias("n"), F.sum("lv").alias("s1"), F.sum("rv").alias("s2")
    ).collect()[0]
    assert got == want


def test_join_plan_has_no_exchange(spark, bucketed_pair):
    lt, rt = bucketed_pair
    # force the sort-merge path (a broadcast would trivially skip the
    # exchange question)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(co_located_join(spark, lt, rt, ["k"]))
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_groupby_on_bucket_key_has_no_exchange(spark, bucketed_pair):
    lt, _ = bucketed_pair
    plan = _plan(read_bucketed(spark, lt).groupBy("k").agg(F.sum("lv")))
    assert "Exchange" not in plan, plan


def test_bucket_pruning_on_equality_filter(spark, bucketed_pair):
    lt, _ = bucketed_pair
    # the planner's autoBucketedScan turns OFF bucketed reading for
    # plans with no distribution requirement — which also skips bucket
    # pruning; disable it to observe the pruned scan
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        pruned = read_bucketed(spark, lt).where(F.col("k") == 42)
        plan = _plan(pruned)
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
        assert pruned.count() == 1
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
        )


def test_mismatched_bucket_counts_fall_back_to_exchange(spark, bucketed_pair):
    """Negative control: the co-location guarantee really comes from
    matching bucket counts, not from bucketing per se."""
    lt, _ = bucketed_pair
    other = spark.range(0, 1000).select(
        F.col("id").alias("k"), F.lit(1).alias("x")
    )
    write_bucketed(other, "bkt_mismatch", ["k"], N_BUCKETS * 2)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(co_located_join(spark, lt, "bkt_mismatch", ["k"]))
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bkt_mismatch")
