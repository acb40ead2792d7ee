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
