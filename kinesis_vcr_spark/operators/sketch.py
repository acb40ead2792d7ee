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


# ---------------------------------------------------------------------------
# count-min sketch — approximate frequencies / heavy hitters
# ---------------------------------------------------------------------------

#: pinned pairwise-independent hash rows ``(a_i, b_i)`` over the same
#: prime field as the HLL; d = 4 rows.
CMS_P = HLL_P
CMS_ROWS: tuple[tuple[int, int], ...] = (
    (1_103_515_245, 12_345),
    (22_695_477, 1),
    (1_664_525, 1_013_904_223),
    (69_069, 362_437),
)
CMS_W = 512  # counters per row


def cms_coords(value: Column, w: int = CMS_W) -> Column:
    """Array of d (row, col) coordinate structs for one int value."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(value.cast("long") * a + b, F.lit(CMS_P))
                .bitwiseAND(F.lit(w - 1))
                .alias("col"),
            )
            for i, (a, b) in enumerate(CMS_ROWS)
        ]
    )


def cms_sketch(
    df: DataFrame, key_cols: list[str], value_col: str, w: int = CMS_W
) -> DataFrame:
    """Per-key count-min sketch: ``(keys…, row, col, n)`` — at most
    d·w rows per key regardless of input size, built in ONE grouped
    aggregation with full map-side combine. Sketches merge by summing
    ``n`` per (row, col) — associative/commutative, so any partial
    aggregation tree (or day-by-day incremental build) yields the
    identical sketch.

    Guarantees (standard CMS): estimate ≥ true count always;
    overshoot ≤ e/w · N with prob ≥ 1 − e^−d.
    """
    coords = cms_coords(F.col(value_col), w)
    return (
        df.select(*key_cols, F.explode(coords).alias("c"))
        .groupBy(*key_cols, F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count("*").alias("n"))
    )


def cms_estimate(
    items: DataFrame,
    sketch: DataFrame,
    key_cols: list[str],
    value_col: str,
    w: int = CMS_W,
) -> DataFrame:
    """Point-query the sketch for each item row: join the item's d
    coordinates against the sketch and take the min counter —
    ``(items…, est_n)``. The sketch is ≤ d·w rows per key: broadcast
    it; the item side never shuffles (beyond its own groupBy if any).
    """
    item_cols = [c for c in items.columns]
    probes = (
        items.withColumn("__c", F.explode(cms_coords(F.col(value_col), w)))
        .withColumn("row", F.col("__c.row"))
        .withColumn("col", F.col("__c.col"))
        .drop("__c")
    )
    joined = probes.join(F.broadcast(sketch), on=[*key_cols, "row", "col"], how="inner")
    return joined.groupBy(*item_cols).agg(F.min("n").alias("est_n"))


def heavy_hitters(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    min_fraction: float,
    w: int = CMS_W,
) -> DataFrame:
    """Values whose estimated frequency is ≥ ``min_fraction`` of their
    key group — ``(keys…, value, est_n, total_n)``. CMS guarantees no
    false negatives (estimates never undercount).

    The candidate set is the distinct (key, value) pairs — one extra
    map-side-combined shuffle in batch mode (a streaming deployment
    would keep a per-partition top-k heap instead); the sketch itself
    is broadcast, never shuffled with the data.
    """
    sketch = cms_sketch(df, key_cols, value_col, w)
    d = len(CMS_ROWS)
    totals = sketch.groupBy(*key_cols).agg(
        (F.sum("n") / d).cast("long").alias("total_n")
    )
    candidates = df.select(*key_cols, value_col).distinct()
    est = cms_estimate(candidates, sketch, key_cols, value_col, w)
    return (
        est.join(F.broadcast(totals), on=list(key_cols), how="inner")
        .where(F.col("est_n") >= F.col("total_n") * min_fraction)
    )


# ---------------------------------------------------------------------------
# KMV (bottom-k / K-Minimum-Values) sketch — distinct counts AND set
# overlap between corpora
# ---------------------------------------------------------------------------

#: bottom-k size. 1024 → relative error ≈ 1/sqrt(k-2) ≈ 3% on distinct
#: estimates; Jaccard resolution 1/k.
KMV_K = 1024

#: hex digits of the md5 prefix used as the KMV hash (60 bits —
#: comfortably inside signed-64 range in BOTH engines' hex parsing).
KMV_DIGITS = 15
KMV_SPACE = float(16**KMV_DIGITS)


def kmv_hash(value: Column) -> Column:
    """Deterministic uniform 64-bit hash as fixed-width lowercase hex —
    lexicographic order == numeric order, identical in DuckDB."""
    return F.substring(F.md5(value.cast("string").cast("binary")), 1, KMV_DIGITS)


#: survivor-budget multiple for the kmv_sketch pre-filter. Keeping
#: hashes below cut = OVERSAMPLE·k/n of the hash space leaves
#: Binomial(n, OVERSAMPLE·k/n) survivors — expectation OVERSAMPLE·k,
#: and P(fewer than k survive) < exp(-k·(OVERSAMPLE-1)²/(2·OVERSAMPLE))
#: (Chernoff) ≈ e^-3000 at k=1024, so the pruned build is the exact
#: bottom-k with overwhelming margin even with HLL's ~2% count error.
KMV_OVERSAMPLE = 8.0


def kmv_sketch(
    df: DataFrame, key_cols: list[str], value_col: str, k: int = KMV_K
) -> DataFrame:
    """Per-key bottom-k sketch: the k smallest DISTINCT hash values —
    ``(keys…, hs: array<string> sorted asc)``. Fully deterministic
    (no seeds, no randomness), so two engines — or two corpora hashed
    independently — produce comparable sketches; merge = union +
    re-take bottom-k (associative, order-free).

    Scale posture (ADVICE r03): the naive build collects EVERY distinct
    hash per key before slicing — unbounded executor memory on
    high-cardinality keys. Instead: one HLL pass estimates per-key
    distincts, then only hashes below ``OVERSAMPLE·k/n`` of the hash
    space survive into the distinct + ``collect_set`` — per-task state
    is ~8k entries per key regardless of cardinality, and the distinct
    shuffle itself shrinks by the same factor. The cut is a
    deterministic function of the data (HLL is seedless), so the
    result is still the exact bottom-k (see :data:`KMV_OVERSAMPLE`)."""
    hashed = df.select(*key_cols, kmv_hash(F.col(value_col)).alias("h"))
    cuts = hashed.groupBy(*key_cols).agg(
        F.least(
            F.lit(1.0),
            F.lit(KMV_OVERSAMPLE * k) / F.approx_count_distinct("h"),
        ).alias("__cut_frac")
    )
    # plain equi-join on the grouping keys: one row per key, so AQE
    # turns it into a broadcast join for any sane key cardinality
    survivors = (
        hashed.join(cuts, list(key_cols))
        .where(
            # keep-everything case first: at cut_frac == 1.0 a strict
            # `<` could drop the top hash to double rounding of conv()
            (F.col("__cut_frac") >= 1.0)
            | (
                F.conv(F.col("h"), 16, 10).cast("double")
                < F.col("__cut_frac") * F.lit(KMV_SPACE)
            )
        )
        .drop("__cut_frac")
        .distinct()
    )
    return survivors.groupBy(*key_cols).agg(
        F.slice(F.sort_array(F.collect_set("h")), 1, k).alias("hs")
    )


def kmv_distinct(hs: Column, k: int = KMV_K) -> Column:
    """Distinct-count estimate from a bottom-k array: ``(k−1)/h_k``
    normalized to the hash space; exact |set| when the set had < k
    members (the sketch IS the set then)."""
    n = F.size(hs)
    kth_frac = (
        F.conv(F.element_at(hs, n), 16, 10).cast("double") / F.lit(KMV_SPACE)
    )
    return F.when(n < k, n.cast("double")).otherwise(
        F.round((F.lit(float(k - 1))) / kth_frac, 4)
    )


def kmv_jaccard(a_hs: Column, b_hs: Column, k: int = KMV_K) -> Column:
    """Column-level KMV Jaccard: bottom-k of the union, fraction
    present in both sketches. 4-dp rounded double."""
    au = F.array_distinct(a_hs)
    bu = F.array_distinct(b_hs)
    k_lim = F.least(F.lit(k), F.size(F.array_union(au, bu)))
    union_bottom = F.slice(F.sort_array(F.array_union(au, bu)), 1, k_lim)
    inter = F.size(
        F.filter(
            union_bottom,
            lambda h: F.array_contains(au, h) & F.array_contains(bu, h),
        )
    )
    return F.round(inter.cast("double") / k_lim.cast("double"), 4)
