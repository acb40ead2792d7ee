"""Engine-portable HyperLogLog — approximate COUNT(DISTINCT) as a
mergeable sketch, built entirely from deterministic integer arithmetic
so a DuckDB oracle reproduces the estimate bit-for-bit.

Why not ``approx_count_distinct``: Spark's HLL++ (and DuckDB's own HLL)
are engine-private sketches — correct, but unverifiable across engines
and not portable between systems. This implementation fixes every
degree of freedom:

- hash: universal family ``(a*x + b) mod p`` with pinned constants,
  p = 2^31 − 1 (exact in int64, no overflow for 32-bit inputs);
- bucket = ``h mod m``; rank = leading-zero count of the remaining
  W = 23 bits + 1, computed as ``W − bitlen(h div m) + 1`` where
  ``bitlen`` is ``length(bin(v))`` — identical in Spark and DuckDB;
- the harmonic sum adds exact powers of two (mantissa span < 53 bits →
  the double sum is EXACT in any summation order, so distributed
  partial aggregation cannot perturb it);
- the final estimate is rounded once (4 dp) to absorb the only
  libm-dependent step (``ln`` in the small-range correction).

Scale posture: the sketch is two grouped aggregations —
``groupBy(keys, bucket).max(rank)`` then ``groupBy(keys)`` — both with
full map-side combine; state is ≤ m rows per key regardless of input
size, and sketches merge by ``max(rank)`` per bucket (associative +
commutative), which is what makes this a 100 TB operator: partial
sketches from any partitioning/merge tree give the identical estimate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_P = 2_147_483_647  # 2^31 − 1 (prime)
HLL_A = 1_103_515_245  # pinned multiplier, 1 ≤ a < p
HLL_B = 12_345  # pinned offset, 0 ≤ b < p
HLL_M = 256  # buckets (m = 2^8)
HLL_W = 23  # value bits after the bucket split: h < 2^31, h/m < 2^23


def hll_bucket_rank(value: Column, m: int = HLL_M, w: int = HLL_W) -> Column:
    """(bucket, rank) struct for one integer value."""
    if m & (m - 1):
        raise ValueError("m must be a power of two")
    shift = m.bit_length() - 1
    h = F.pmod(value.cast("long") * HLL_A + HLL_B, F.lit(HLL_P))
    v = F.shiftright(h, shift)  # h div m, exact integer shift
    bitlen = F.length(F.bin(v))
    rank = F.when(v > 0, F.lit(w) - bitlen + 1).otherwise(F.lit(w) + 1)
    return F.struct(
        h.bitwiseAND(F.lit(m - 1)).alias("bucket"), rank.alias("rank")
    )


def hll_sketch(
    df: DataFrame, key_cols: list[str], value_col: str, m: int = HLL_M
) -> DataFrame:
    """Per-key sketch: ``(keys…, bucket, max_rank)`` — ≤ m rows per key,
    mergeable with further ``max`` under any regrouping."""
    br = hll_bucket_rank(F.col(value_col), m)
    return (
        df.select(*key_cols, br.alias("br"))
        .groupBy(*key_cols, F.col("br.bucket").alias("bucket"))
        .agg(F.max("br.rank").alias("max_rank"))
    )


def hll_estimate(
    sketch: DataFrame, key_cols: list[str], m: int = HLL_M
) -> DataFrame:
    """Collapse a sketch to ``(keys…, approx_distinct)``.

    Standard HLL bias-corrected harmonic mean (alpha_m for m ≥ 128)
    with the linear-counting small-range correction; empty buckets
    contribute 2^0 = 1 to the harmonic sum."""
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = sketch.groupBy(*key_cols).agg(
        F.count("*").alias("n_obs"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rank"))).alias("sum_obs"),
    )
    zeros = F.lit(m) - F.col("n_obs")
    raw = F.lit(alpha * m * m) / (F.col("sum_obs") + zeros)
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(
        *key_cols, F.round(est, 4).alias("approx_distinct")
    )
