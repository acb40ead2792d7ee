"""Two-phase skew-safe top-k (operators/topk.py): exact equivalence to
the naive single-window plan on skewed data, boundary ties under a
total order, and parameter edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.topk import topk_per_group


def _naive(df, keys, order_by, k):
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k)
        .drop("__r")
    )


@pytest.fixture(scope="module")
def skewed(spark):
    # key "hot" owns 90% of rows; scores collide heavily so boundary
    # ties exercise the tiebreak; uid is unique (total order).
    rows = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold_"), (F.col("id") % 7).cast("string")))
        .alias("k"),
        (F.col("id") * 2654435761 % 97).alias("score"),
        F.col("id").alias("uid"),
    )
    return rows.localCheckpoint()


def _order():
    return [F.col("score").desc(), F.col("uid")]


@pytest.mark.parametrize("k,salt", [(1, 4), (5, 1), (5, 8), (40, 3)])
def test_matches_naive_window(skewed, k, salt):
    got = sorted(
        topk_per_group(skewed, ["k"], _order(), k, salt_factor=salt).collect()
    )
    want = sorted(_naive(skewed, ["k"], _order(), k).collect())
    assert got == want


def test_rank_column_and_group_sizes(skewed):
    out = topk_per_group(
        skewed, ["k"], _order(), 5, salt_factor=8, rank_col="r"
    )
    pdf = out.toPandas()
    sizes = pdf.groupby("k").size()
    # every group capped at 5; small groups keep all their rows
    assert (sizes <= 5).all()
    assert set(pdf.columns) == {"k", "score", "uid", "r"}
    for _, g in pdf.groupby("k"):
        assert sorted(g["r"]) == list(range(1, len(g) + 1))


def test_k_exceeds_group_size(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], ["k", "v"]
    )
    out = topk_per_group(df, ["k"], [F.col("v").desc()], 10, salt_factor=4)
    assert out.count() == 3


def test_invalid_params(spark):
    df = spark.range(1).select(F.lit("a").alias("k"), F.col("id").alias("v"))
    with pytest.raises(ValueError):
        topk_per_group(df, ["k"], [F.col("v")], 0)
    with pytest.raises(ValueError):
        topk_per_group(df, ["k"], [F.col("v")], 1, salt_factor=0)


def test_two_phase_plan_shape(skewed):
    """Phase-1 window must partition on (key, salt) — the skew spread —
    and phase 2 on the key alone."""
    plan = topk_per_group(
        skewed, ["k"], _order(), 3, salt_factor=8
    )._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan  # salted local stage present
    assert plan.count("Window") >= 2  # local + refine stages
