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


def exact_global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """EXACT ``row_number() OVER (ORDER BY order_cols)`` without a
    single-partition total sort. Returns ``(df + rank_col, total_rows)``.

    Shape: one sketch pass picks ``num_partitions - 1`` range
    boundaries on the leading order key; those come back to the driver
    as CONSTANTS, so the range-block assignment is a pure deterministic
    column expression — every subsequent job agrees on it. (The tempting
    ``repartitionByRange + spark_partition_id`` version is WRONG here:
    each action re-samples range boundaries with a new RDD id, so the
    counts job and the rank job can see different partitionings —
    observed as duplicate ranks.) Then: per-block counts (one map-side-
    combined groupBy, O(partitions) rows to the driver), prefix-summed
    into offsets, and ``rank = offset[block] + row_number within
    block`` — parallel local sorts, no single-partition exchange,
    no persist. The block function is monotone in the leading key and
    ties share a block, so offset + local rank IS the exact global
    row_number over ``order_cols``. Skewed leading keys degrade block
    balance, never correctness (a block holds at least each distinct
    boundary value's ties — inherent to ranking ties contiguously)."""
    from pyspark.sql import Window  # noqa: PLC0415

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    bounds = (
        quantile_boundaries(df, order_cols[0], n) if n >= 2 else []
    )
    v = F.col(order_cols[0]).cast("double")
    block: Column = F.lit(1)
    for b in bounds:
        block = block + (v > F.lit(float(b))).cast("int")
    blocked = df.withColumn("__blk", block)
    counts = blocked.groupBy("__blk").count().collect()
    offsets = [0] * (len(bounds) + 1)
    acc = 0
    for row in sorted(counts, key=lambda r: r["__blk"]):
        offsets[row["__blk"] - 1] = acc
        acc += row["count"]
    local = F.row_number().over(Window.partitionBy("__blk").orderBy(*cols))
    off = F.element_at(
        F.array(*[F.lit(o) for o in offsets]), F.col("__blk")
    )
    return (
        blocked.withColumn(rank_col, (off + local).cast("long")).drop("__blk"),
        acc,
    )


def exact_ntile(
    df: DataFrame,
    order_cols: list[str],
    num_buckets: int,
    ntile_col: str = "ntile",
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT ``NTILE(num_buckets) OVER (ORDER BY order_cols)`` — same
    values as the SQL window function, built on
    :func:`exact_global_rank` instead of a single-partition sort.

    NTILE semantics: with ``N = q·k + rem`` rows over ``k`` buckets,
    the first ``rem`` buckets take ``q+1`` rows, the rest ``q`` — a
    closed form of the global rank, applied as pure column arithmetic."""
    ranked, total = exact_global_rank(
        df, order_cols, "__rank", num_partitions
    )
    q, rem = divmod(total, num_buckets)
    cut = rem * (q + 1)
    r = F.col("__rank")
    first = F.floor((r - 1) / F.lit(q + 1)) + 1
    rest = (
        F.floor((r - cut - 1) / F.lit(max(q, 1))) + rem + 1
        if q > 0
        else F.lit(None)  # unreachable: q == 0 → every rank ≤ cut
    )
    return ranked.withColumn(
        ntile_col, F.when(r <= cut, first).otherwise(rest).cast("int")
    ).drop("__rank")
