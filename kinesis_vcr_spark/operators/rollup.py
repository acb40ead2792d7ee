"""Incremental mergeable rollup — hypertable-style continuous
aggregates over event time.

At 100 TB you summarize each arriving partition (a day, an hour, one
micro-batch) ONCE and never rescan history: every stored aggregate must
therefore merge associatively and commutatively. This operator keeps a
per-(day, keys) rollup made of exactly such pieces:

- ``n`` — row count (merge = sum);
- exact DECIMAL(18,4) sums per measure (merge = sum; decimal addition
  is exact, so any merge tree yields the identical total — a double
  sum would drift with partitioning);
- the portable HLL registers of ``operators/sketch.py`` for
  approx-distinct (merge = per-bucket ``max``; registers are SPARSE
  rows ``(day, keys…, bucket, max_rank)`` — ≤ m per group).

``merge_rollups(a, b, …)`` then ``rollup_report`` give bit-identical
results to a single direct pass over the union of the inputs — the
property that makes backfill, late data, and multi-cluster ingest safe:
recompute any slice, re-merge, and the report cannot change shape.

The scalar and register parts travel as two DataFrames (different
natural grain); both merge with one map-side-combined groupBy each.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.sketch import HLL_M, hll_estimate, hll_sketch

_DEC = "decimal(18,4)"


@dataclass(frozen=True)
class Rollup:
    """One mergeable rollup: per-(day, keys) scalars + HLL registers."""

    scalars: DataFrame  # day, keys…, n, sum_<measure>…
    registers: DataFrame  # day, keys…, bucket, max_rank
    key_cols: tuple[str, ...]
    sum_cols: tuple[str, ...]


def _with_day(df: DataFrame, ts_ns_col: str) -> DataFrame:
    # exact integer floor-div to seconds — a double division would
    # round across second (hence possibly day) boundaries near 2^53
    return df.withColumn(
        "day",
        F.date_format(
            F.expr(f"CAST(`{ts_ns_col}` div 1000000000 AS TIMESTAMP)"),
            "yyyy-MM-dd",
        ),
    )


def build_rollup(
    df: DataFrame,
    ts_ns_col: str,
    key_cols: list[str],
    sum_cols: list[str],
    distinct_col: str,
    m: int = HLL_M,
) -> Rollup:
    """Summarize ``df`` into a mergeable rollup: one grouped aggregate
    for the scalars, one HLL sketch pass for the distinct column. Both
    are map-side combined; state per (day, keys) is O(m + sums)."""
    with_day = _with_day(df, ts_ns_col)
    grain = ["day", *key_cols]
    scalars = with_day.groupBy(*grain).agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.col(c).cast(_DEC)).alias(f"sum_{c}")
            for c in sum_cols
        ],
    )
    registers = hll_sketch(with_day, grain, distinct_col, m)
    return Rollup(scalars, registers, tuple(key_cols), tuple(sum_cols))


def merge_rollups(*parts: Rollup) -> Rollup:
    """Associative merge of any number of rollups over the same grain:
    scalar sums add (exact decimals), registers take per-bucket max."""
    if not parts:
        raise ValueError("merge_rollups needs at least one rollup")
    head = parts[0]
    for p in parts[1:]:
        if p.key_cols != head.key_cols or p.sum_cols != head.sum_cols:
            raise ValueError("rollups have different grains/measures")
    grain = ["day", *head.key_cols]
    scalars = parts[0].scalars
    registers = parts[0].registers
    for p in parts[1:]:
        scalars = scalars.unionByName(p.scalars)
        registers = registers.unionByName(p.registers)
    merged_scalars = scalars.groupBy(*grain).agg(
        F.sum("n").alias("n"),
        *[
            F.sum(f"sum_{c}").alias(f"sum_{c}")
            for c in head.sum_cols
        ],
    )
    merged_registers = registers.groupBy(*grain, "bucket").agg(
        F.max("max_rank").alias("max_rank")
    )
    return Rollup(
        merged_scalars, merged_registers, head.key_cols, head.sum_cols
    )


def rollup_report(rollup: Rollup, m: int = HLL_M) -> DataFrame:
    """Collapse a rollup to its report: ``(day, keys…, n, sum_<c>…,
    approx_distinct)`` with hash-parity-safe output types (sums rounded
    to double, never raw decimal)."""
    grain = ["day", *rollup.key_cols]
    est = hll_estimate(rollup.registers, grain, m)
    out = rollup.scalars.join(est, on=grain, how="inner")
    return out.select(
        *grain,
        F.col("n"),
        *[
            F.round(F.col(f"sum_{c}"), 4)
            .cast("double")
            .alias(f"sum_{c}")
            for c in rollup.sum_cols
        ],
        "approx_distinct",
    )
