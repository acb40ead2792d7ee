"""Approximate quantile bucketing — the 100 TB replacement for a
global NTILE.

``order_value_deciles`` (queries/windowed.py) ranks with an
unpartitioned window: a deliberate single-partition total sort, correct
for reporting output but not a cluster plan. At scale the right shape
is the one implemented here:

1. one pass computes the ``num_buckets - 1`` boundary values with
   ``percentile_approx`` (a mergeable KLL-style sketch: map-side
   partial sketches, one small merge — no sort, no shuffle of data
   rows);
2. the O(num_buckets) boundary scalars come back to the driver and are
   folded into the assignment expression (a broadcast of constants —
   the ONLY driver-side data, and it is tiny by construction);
3. every row gets its bucket with pure column arithmetic — a narrow
   projection, parallel by input split.

Accuracy: ``percentile_approx(accuracy=a)`` bounds the rank error at
``1/a`` of the row count, so bucket populations deviate from N/k by at
most N/a per boundary (a=10^4 → ±0.01 %). Ties land in the lower
bucket on the boundary value, matching ``value <= boundary`` semantics
in both this operator and an exact cume_dist cut.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantile_boundaries(
    df: DataFrame,
    value_col: str,
    num_buckets: int = 10,
    accuracy: int = 10_000,
) -> list[float]:
    """The ``num_buckets - 1`` interior boundary values of
    ``value_col``, from one sketch pass (no sort)."""
    if num_buckets < 2:
        raise ValueError("num_buckets must be >= 2")
    probs = [i / num_buckets for i in range(1, num_buckets)]
    row = df.select(
        F.percentile_approx(
            F.col(value_col).cast("double"),
            F.array(*[F.lit(p) for p in probs]),
            F.lit(accuracy),
        ).alias("bounds")
    ).first()
    return list(row["bounds"] or [])


def assign_quantile_buckets(
    df: DataFrame,
    value_col: str,
    num_buckets: int = 10,
    accuracy: int = 10_000,
    bucket_col: str = "bucket",
) -> DataFrame:
    """``df`` + a 1-based ``bucket_col`` ≈ NTILE(num_buckets) over
    ``value_col`` ascending — without a global sort.

    bucket = 1 + #(boundaries strictly below the value): a value equal
    to a boundary stays in the lower bucket. Plan: one sketch aggregate
    + one narrow projection; nothing ever shuffles on the value.
    """
    bounds = quantile_boundaries(df, value_col, num_buckets, accuracy)
    v = F.col(value_col).cast("double")
    expr: Column = F.lit(1)
    for b in bounds:
        expr = expr + (v > F.lit(float(b))).cast("int")
    return df.withColumn(bucket_col, expr)
