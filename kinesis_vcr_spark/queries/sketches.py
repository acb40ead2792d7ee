"""Sketch-based approximate analytics — portable HyperLogLog distinct
counting, oracle-verified to the exact same estimate in DuckDB (see
:mod:`kinesis_vcr_spark.operators.sketch` for why the arithmetic is
engine-exact).

The query reports approx vs exact side by side: at 100 TB the exact
branch is the expensive one (full distinct shuffle) and exists here as
the built-in accuracy check; the sketch branch's state is ≤ 256 rows
per key no matter the input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.sketch import (
    HLL_A,
    HLL_B,
    HLL_M,
    HLL_P,
    HLL_W,
    hll_estimate,
    hll_sketch,
)
from kinesis_vcr_spark.queries import QuerySpec, register
from kinesis_vcr_spark.tables import load_table


def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: HLL-approximate vs exact distinct users, with
    the relative error (rounded 6 dp, computed from the rounded
    estimate so both engines derive it from identical values)."""
    ev = load_table(spark, sf_dir, "events")
    approx = hll_estimate(
        hll_sketch(ev, ["event_type"], "user_id"), ["event_type"]
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return (
        approx.join(exact, "event_type")
        .select(
            "event_type",
            "approx_distinct",
            "exact_distinct",
            F.round(
                F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                6,
            ).alias("rel_error"),
        )
        .orderBy("event_type")
    )


HLL_SQL = f"""
WITH hashed AS (
  SELECT event_type,
         (user_id * {HLL_A} + {HLL_B}) % {HLL_P} AS h
  FROM events
),
br AS (
  SELECT event_type, h % {HLL_M} AS bucket, h // {HLL_M} AS v
  FROM hashed
),
ranks AS (
  SELECT event_type, bucket,
         max(CASE WHEN v > 0 THEN {HLL_W} - length(bin(v)) + 1
                  ELSE {HLL_W} + 1 END) AS max_rank
  FROM br GROUP BY 1, 2
),
agg AS (
  SELECT event_type, count(*) AS n_obs,
         sum(pow(2.0, -max_rank)) AS sum_obs
  FROM ranks GROUP BY 1
),
est AS (
  SELECT event_type,
         round(CASE WHEN (0.7213 / (1 + 1.079 / {HLL_M}))
                         * {HLL_M} * {HLL_M}
                         / (sum_obs + ({HLL_M} - n_obs))
                        <= 2.5 * {HLL_M}
                     AND {HLL_M} - n_obs > 0
               THEN {HLL_M}.0 * ln({HLL_M}.0 / ({HLL_M} - n_obs))
               ELSE (0.7213 / (1 + 1.079 / {HLL_M}))
                    * {HLL_M} * {HLL_M}
                    / (sum_obs + ({HLL_M} - n_obs))
               END, 4) AS approx_distinct
  FROM agg
),
exact AS (
  SELECT event_type, count(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY 1
)
SELECT event_type, approx_distinct, exact_distinct,
       round(abs(approx_distinct - exact_distinct)
             * 1.0 / exact_distinct, 6) AS rel_error
FROM est JOIN exact USING (event_type)
ORDER BY event_type
"""


register(QuerySpec("hll_distinct_users", hll_distinct_users, HLL_SQL,
                   "portable HLL approx-distinct vs exact, per event type"))


# ---------------------------------------------------------------------------
# count-min sketch heavy hitters
# ---------------------------------------------------------------------------

HH_FRACTION = 0.01


def cms_heavy_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: users with estimated frequency >= 1% of the
    type's events, via the portable count-min sketch, joined to exact
    counts so the driver row also audits the error (est_n >= n_exact
    always — CMS never undercounts)."""
    from kinesis_vcr_spark.operators.sketch import heavy_hitters

    ev = load_table(spark, sf_dir, "events")
    hh = heavy_hitters(ev, ["event_type"], "user_id", HH_FRACTION)
    exact = ev.groupBy("event_type", "user_id").agg(
        F.count("*").alias("n_exact")
    )
    return (
        hh.join(exact, on=["event_type", "user_id"], how="inner")
        .select("event_type", "user_id", "n_exact", "est_n", "total_n")
        .orderBy("event_type", "user_id")
    )


def _cms_rows_sql() -> str:
    from kinesis_vcr_spark.operators.sketch import CMS_ROWS

    vals = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(CMS_ROWS))
    return f"(VALUES {vals}) AS hashes(i, a, b)"


def _cms_sql() -> str:
    from kinesis_vcr_spark.operators.sketch import CMS_P, CMS_W

    return f"""
WITH coords AS (
  SELECT e.event_type, e.user_id, hashes.i AS row_i,
         ((e.user_id * hashes.a + hashes.b) % {CMS_P}) & {CMS_W - 1} AS col_i
  FROM events e CROSS JOIN {_cms_rows_sql()}
), sketch AS (
  SELECT event_type, row_i, col_i, count(*) AS n
  FROM coords GROUP BY 1, 2, 3
), cand AS (
  SELECT DISTINCT event_type, user_id FROM events
), probe AS (
  SELECT c.event_type, c.user_id, hashes.i AS row_i,
         ((c.user_id * hashes.a + hashes.b) % {CMS_P}) & {CMS_W - 1} AS col_i
  FROM cand c CROSS JOIN {_cms_rows_sql()}
), est AS (
  SELECT p.event_type, p.user_id, min(s.n) AS est_n
  FROM probe p
  JOIN sketch s ON p.event_type = s.event_type
               AND p.row_i = s.row_i AND p.col_i = s.col_i
  GROUP BY 1, 2
), totals AS (
  SELECT event_type, count(*) AS total_n FROM events GROUP BY 1
), exact AS (
  SELECT event_type, user_id, count(*) AS n_exact FROM events GROUP BY 1, 2
)
SELECT est.event_type, est.user_id, n_exact, est_n, total_n
FROM est
JOIN totals USING (event_type)
JOIN exact USING (event_type, user_id)
WHERE est_n >= total_n * {HH_FRACTION}
ORDER BY est.event_type, est.user_id
"""


register(QuerySpec("cms_heavy_users", cms_heavy_users, _cms_sql(),
                   "count-min sketch heavy hitters vs exact counts"))


# ---------------------------------------------------------------------------
# incremental mergeable rollup (operators/rollup.py)
# ---------------------------------------------------------------------------


def rollup_incremental_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily (day, event_type) rollup built INCREMENTALLY: the events
    table is split into two arbitrary halves (even/odd event_id), each
    half summarized independently, the partial rollups merged, then
    reported. The oracle computes the same report in one direct pass —
    equality proves the merge is lossless (exact decimal sums add;
    HLL registers max-merge), i.e. backfill/late-data re-merges cannot
    change the report."""
    from kinesis_vcr_spark.operators.rollup import (
        build_rollup,
        merge_rollups,
        rollup_report,
    )

    ev = load_table(spark, sf_dir, "events")
    halves = [
        build_rollup(
            ev.where(F.pmod("event_id", F.lit(2)) == i),
            "ts_ns",
            ["event_type"],
            ["value"],
            "user_id",
        )
        for i in (0, 1)
    ]
    report = rollup_report(merge_rollups(*halves))
    return report.orderBy("day", "event_type")


ROLLUP_SQL = f"""
WITH base AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         event_type, user_id, value
  FROM events
),
scalars AS (
  SELECT day, event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(round(sum(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE)
           AS sum_value
  FROM base GROUP BY 1, 2
),
hashed AS (
  SELECT day, event_type,
         (user_id * {HLL_A} + {HLL_B}) % {HLL_P} AS h
  FROM base
),
ranks AS (
  SELECT day, event_type, h % {HLL_M} AS bucket,
         max(CASE WHEN h // {HLL_M} > 0
                  THEN {HLL_W} - length(bin(h // {HLL_M})) + 1
                  ELSE {HLL_W} + 1 END) AS max_rank
  FROM hashed GROUP BY 1, 2, 3
),
agg AS (
  SELECT day, event_type, count(*) AS n_obs,
         sum(pow(2.0, -max_rank)) AS sum_obs
  FROM ranks GROUP BY 1, 2
),
est AS (
  SELECT day, event_type,
         round(CASE WHEN (0.7213 / (1 + 1.079 / {HLL_M}))
                         * {HLL_M} * {HLL_M}
                         / (sum_obs + ({HLL_M} - n_obs))
                        <= 2.5 * {HLL_M}
                     AND {HLL_M} - n_obs > 0
               THEN {HLL_M}.0 * ln({HLL_M}.0 / ({HLL_M} - n_obs))
               ELSE (0.7213 / (1 + 1.079 / {HLL_M}))
                    * {HLL_M} * {HLL_M}
                    / (sum_obs + ({HLL_M} - n_obs))
               END, 4) AS approx_distinct
  FROM agg
)
SELECT day, event_type, n, sum_value, approx_distinct
FROM scalars JOIN est USING (day, event_type)
ORDER BY day, event_type
"""


register(QuerySpec("rollup_incremental_daily", rollup_incremental_daily,
                   ROLLUP_SQL,
                   "incremental daily rollup: split-merge == direct pass"))
