"""Seasonal-baseline anomaly detection for event streams.

Ops/analytics question the trend (E79) and global outlier fence (E65)
families can't answer: "is TODAY's volume unusual *for a Tuesday*?" —
per-key daily totals are compared against that key's OWN seasonal
baseline (median of same-day-of-week totals) and scaled by the robust
spread (MAD), the median/MAD discipline of E65 applied per seasonal
stratum instead of globally. Robust statistics on purpose: a seasonal
MEAN baseline is dragged by the very anomalies the detector hunts.

Determinism/parity: day-of-week is integer days-since-epoch mod 7
(epoch 1970-01-01 = a Thursday; engine dayofweek() conventions differ —
Spark counts Sunday=1, DuckDB Sunday=0 — the cohort-retention lesson),
daily totals accumulate in exact DECIMAL(18,4), and both engines'
percentile functions implement PERCENTILE_CONT (the quantileq parity
note), so scores hash-match bit-for-bit.

Scale shape: one events scan → daily hash-agg keyed (key, date) —
the only data-sized shuffle — then everything operates on the daily
table (≥ 3 orders of magnitude smaller): two percentile aggs over
(key, dow) strata and two joins back that AQE broadcasts (|keys|·7
rows). At 100 TB the daily agg is map-side combined and the seasonal
stage is driver-trivial.

No reference counterpart; additive engine layer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EPOCH = "1970-01-01"


def _dec(col: str):
    return F.col(col).cast("decimal(18,4)")


def daily_totals(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(keys…, d, dow, total): exact-decimal daily sums, engine-neutral
    day-of-week (days-since-epoch mod 7; 0 = Thursday)."""
    d = F.to_date(F.col(ts_col))
    return (
        events.groupBy(*key_cols, d.alias("d"))
        .agg(F.round(F.sum(_dec(value_col)), 4).cast("double").alias("total"))
        .withColumn("dow", F.datediff(F.col("d"), F.lit(EPOCH)) % 7)
    )


def seasonal_scores(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per (keys…, date): total, seasonal median, MAD, and the robust
    deviation score ``dev = (total − med) / mad`` (NULL when the
    stratum's MAD is 0 — a constant stratum has no scale to score
    against, and silently substituting an epsilon would rank its ties
    arbitrarily)."""
    return scores_from_daily(daily_totals(events, key_cols, ts_col, value_col), key_cols)


def scores_from_daily(daily: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """The seasonal med/MAD/dev stage over an already-built daily table
    ``(keys…, d, dow, total)`` — split out so the streaming twin
    (streaming/seasonalstream.py), which maintains daily totals as
    mergeable state, scores with bit-identical arithmetic."""
    keys = list(key_cols)
    med = (
        daily.groupBy(*keys, "dow")
        .agg(F.round(F.expr("percentile(total, 0.5)"), 6).alias("med"))
    )
    with_med = daily.join(med, [*keys, "dow"])
    mad = (
        with_med.withColumn("absdev", F.abs(F.col("total") - F.col("med")))
        .groupBy(*keys, "dow")
        .agg(F.round(F.expr("percentile(absdev, 0.5)"), 6).alias("mad"))
    )
    return with_med.join(mad, [*keys, "dow"]).select(
        *keys,
        "d",
        "dow",
        "total",
        "med",
        "mad",
        F.when(
            F.col("mad") > 0,
            F.round((F.col("total") - F.col("med")) / F.col("mad"), 6),
        ).alias("dev"),
    )


def top_anomalies(
    events: DataFrame,
    key_cols: Sequence[str],
    k: int = 10,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """The k most anomalous (key, day) cells by |dev| — the review
    queue. Deterministic total order: |dev| desc, keys, date; constant
    strata (NULL dev) are unrankable and excluded."""
    scores = seasonal_scores(events, key_cols, ts_col, value_col)
    return (
        scores.where(F.col("dev").isNotNull())
        .orderBy(F.abs(F.col("dev")).desc(), *key_cols, "d")
        .limit(k)
    )


__all__ = [
    "daily_totals",
    "scores_from_daily",
    "seasonal_scores",
    "top_anomalies",
]
