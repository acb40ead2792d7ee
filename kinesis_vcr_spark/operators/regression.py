"""Grouped OLS regression — closed-form fit from sufficient statistics.

Per-key linear trend fitting (metric drift per event type, volume trend
per source, quality-over-time per corpus slice) is a one-pass
aggregation, not an ML-library problem: simple linear regression has a
closed form over five sufficient statistics

    n, Σx, Σx², Σy, Σxy   (+ Σy² for R²)

all of which are plain commutative sums — ONE map-side-combining
``groupBy().agg()`` per key, zero iterations, zero Python.

Determinism/parity contract (the repo's standard recipe): x must be an
integer column (day index, epoch second, version number) so Σx/Σx² are
exact int64; y accumulates as DECIMAL(18,4) so Σy/Σxy/Σy² are exact,
order-independent decimals. Only then does the closed form cast the
exact sums to double — identical decimals convert to identical
nearest-doubles on every engine, and the subsequent IEEE-754 double
arithmetic is bit-deterministic. A float64 ``sum()`` would instead vary
with partitioning.

Scale posture: the whole fit is one partial-aggregate shuffle keyed by
the group columns (same cost as a ``count(*)`` per key); no second
pass, no driver math, no skew risk beyond what the groupBy already
has. 100 TB of events with 10^6 group keys is a trivial agg.

Reference anchor: no counterpart in the reference (a record/replay
tool — kinesis-vcr/src/main/java/.../KinesisVcr.java); part of the
training-data-pipeline analytics surface (SURVEY.md §2.5a E-series).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(18,4)"


def grouped_ols(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Per-group simple linear regression ``y ~ a + b*x``.

    Returns one row per group: ``n``, ``slope``, ``intercept``,
    ``r2`` (doubles rounded to ``round_dp``; NULL slope/intercept when
    x is constant in the group, NULL r2 when x or y is constant).

    ``x_col`` must be integer-valued (cast upstream — a day index, an
    epoch second); ``y_col`` is any numeric and accumulates exactly as
    DECIMAL(18,4).

    Magnitude contract (ADVICE r05): ``sum(y*y)`` accumulates as
    DECIMAL(38,8) — capacity 10^30 — so the caller must keep
    ``n · max(y)² < 10^30`` per group (e.g. |y| ≤ 10^9 allows
    n ≤ 10^12). Beyond that, non-ANSI Spark turns the overflow into
    silent NULLs while DuckDB's hugeint-backed decimals keep going — a
    quiet oracle divergence. Run with ``spark.sql.ansi.enabled=true``
    to make the overflow fail loudly instead, or pre-scale y.
    """
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast(_DEC)
    sufficient = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("__sx"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(y * y).alias("__syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sxx = F.col("__sxx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    syy = F.col("__syy").cast("double")
    cov_n = n * sxy - sx * sy  # n² · covariance
    var_x_n = n * sxx - sx * sx  # n² · variance(x)
    var_y_n = n * syy - sy * sy  # n² · variance(y)
    slope = cov_n / F.nullif(var_x_n, F.lit(0.0))
    intercept = (sy - slope * sx) / n
    r2 = (cov_n * cov_n) / F.nullif(var_x_n * var_y_n, F.lit(0.0))
    return sufficient.select(
        *group_cols,
        F.col("n"),
        F.round(slope, round_dp).alias("slope"),
        F.round(intercept, round_dp).alias("intercept"),
        F.round(r2, round_dp).alias("r2"),
    )


def ols_oracle_sql(
    table: str,
    group_cols: Sequence[str],
    x_expr: str,
    y_expr: str,
    round_dp: int = 6,
) -> str:
    """The DuckDB twin of :func:`grouped_ols` — same sufficient
    statistics, same exact-decimal accumulation, same double formula,
    so the values hash identically. ``x_expr`` must already be an
    integer expression."""
    g = ", ".join(group_cols)
    return f"""
WITH suff AS (
  SELECT {g},
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(__x) AS BIGINT) AS sx,
         CAST(sum(__x * __x) AS BIGINT) AS sxx,
         sum(__y) AS sy,
         sum(__x * __y) AS sxy,
         sum(__y * __y) AS syy
  FROM (
    SELECT {g}, CAST({x_expr} AS BIGINT) AS __x,
           CAST({y_expr} AS DECIMAL(18,4)) AS __y
    FROM {table}
  ) GROUP BY {g}
)
SELECT {g}, n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0),
             {round_dp}) AS slope,
       round((CAST(sy AS DOUBLE)
              - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0))
                * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE),
             {round_dp}) AS intercept,
       round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
             / nullif((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0.0),
             {round_dp}) AS r2
FROM suff
"""
