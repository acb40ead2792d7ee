"""Driver-visible skew-management queries — the salted operators of
:mod:`kinesis_vcr_spark.operators.skew` run against the events table,
whose 5 event types make every grouping key pathologically hot (each
key holds ~20% of all rows: exactly the shape that melts a reducer at
100 TB).

Salting must never change RESULTS, only load balance — so the oracles
are the plain unsalted SQL, and value parity across the extra
partial-aggregation phase is guaranteed by summing decimals (exact,
order-independent), never raw doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.skew import salted_aggregate, salted_join
from kinesis_vcr_spark.queries import QuerySpec, register
from kinesis_vcr_spark.tables import load_table

DEC = "decimal(18,4)"


def skew_salted_event_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregate over the 5 hot event-type keys:
    identical output to a plain groupBy (the oracle), with the hot-key
    partial state spread 8 ways before the final reduce."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast(DEC)
    )
    out = salted_aggregate(
        ev,
        ["event_type"],
        sum_cols={"value_dec": "sum_value"},
        count_alias="n_events",
    )
    return out.select(
        "event_type",
        "n_events",
        F.round(F.col("sum_value"), 4).cast("double").alias("sum_value"),
    ).orderBy("event_type")


SALTED_AGG_SQL = """
SELECT event_type, count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def skew_salted_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈dim join on the hot key: each hot key's fact rows
    spread over 8 salt partitions, the dim replicated per salt. The
    aggregate of the joined result must equal the unsalted join's (the
    oracle) exactly."""
    ev = load_table(spark, sf_dir, "events")
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn("type_weight", F.length("event_type").cast("long"))
    )
    joined = salted_join(ev, dim, on="event_type", salt_factor=8)
    return (
        joined.groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("type_weight").alias("sum_weight"),
        )
        .orderBy("event_type")
    )


SALTED_JOIN_SQL = """
WITH dim AS (
  SELECT DISTINCT event_type, length(event_type) AS type_weight
  FROM events
)
SELECT e.event_type, count(*) AS n_rows,
       CAST(sum(d.type_weight) AS BIGINT) AS sum_weight
FROM events e JOIN dim d USING (event_type)
GROUP BY e.event_type ORDER BY e.event_type
"""


register(QuerySpec("skew_salted_event_totals", skew_salted_event_totals,
                   SALTED_AGG_SQL,
                   "two-phase salted aggregate == plain groupBy"))
register(QuerySpec("skew_salted_dim_join", skew_salted_dim_join,
                   SALTED_JOIN_SQL,
                   "salted hot-key join == plain join"))
