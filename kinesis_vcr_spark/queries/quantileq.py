"""Distribution-profile queries — exact per-group percentiles.

Overflow-positioned (after filterq): the driver's 50-slot window is
fully allocated; these are held green by the strict local harness and
are rotation candidates for a future round (queries._WINDOW_PROMOTE).

Parity notes: Spark's ``percentile`` and DuckDB's ``quantile_cont``
both implement PERCENTILE_CONT — linear interpolation at rank
``p·(n-1)`` over the sorted non-null values. Outputs are rounded to
6 dp on both sides (the interpolation arithmetic is the same formula
on the same doubles; rounding absorbs any last-bit divergence).

Scale posture: exact percentile aggregates a value→count map per
group — memory ∝ distinct values per group, fine for bounded-domain
columns but NOT the 100 TB plan for continuous doubles. At scale swap
``approx_percentile`` (mergeable sketch, map-side partials) or the
sketch-boundary machinery in operators/quantiles.py; this query is
the oracle-checkable exact variant of that family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_vcr_spark.queries import QuerySpec, register
from kinesis_vcr_spark.tables import load_table

PCTS = (0.25, 0.5, 0.75, 0.95, 0.99)


def event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distribution profile of ``value``: non-null
    count, min/max, and exact continuous percentiles (p25…p99)."""
    ev = load_table(spark, sf_dir, "events")
    agged = ev.groupBy("event_type").agg(
        F.count("value").alias("n_values"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
        F.percentile("value", F.array(*[F.lit(p) for p in PCTS])).alias(
            "__ps"
        ),
    )
    return agged.select(
        "event_type",
        "n_values",
        "min_value",
        "max_value",
        *[
            F.round(F.element_at("__ps", i + 1), 6).alias(
                f"p{int(p * 100)}"
            )
            for i, p in enumerate(PCTS)
        ],
    ).orderBy("event_type")


PCT_SQL = f"""
SELECT event_type,
       CAST(count(value) AS BIGINT) AS n_values,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value,
       {", ".join(
           f"round(quantile_cont(value, {p}), 6) AS p{int(p * 100)}"
           for p in PCTS
       )}
FROM events GROUP BY event_type ORDER BY event_type
"""


register(QuerySpec("event_value_percentiles", event_value_percentiles,
                   PCT_SQL,
                   "per-group exact PERCENTILE_CONT profile (p25-p99 + "
                   "min/max) over event values"))
