"""Statistical / analytical aggregates over the events and lineitem
tables — exact percentiles, CUBE grouping sets, funnel analysis, and a
rolling time window. Rounds floats once at 6 dp (both engines) per the
repo-wide hash-parity rules.

Scale posture:

- exact ``percentile`` is a per-group sort in Spark's aggregate buffer:
  fine keyed by event_type (bounded group count, values spill-able).
  For ungrouped 100 TB percentiles you'd switch to
  ``approx_percentile`` — kept out of the oracle surface because its
  sketch is engine-specific.
- the funnel is one groupBy(user) with conditional mins (single
  shuffle, map-side combine) + a 1-row global agg;
- the rolling window orders by day ordinal within one 31-row frame —
  trivially small after the daily pre-aggregate, which is where the
  data reduction happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_vcr_spark.queries import QuerySpec, register
from kinesis_vcr_spark.tables import load_table

DEC = "decimal(18,4)"


def _dec(col: str):
    return F.col(col).cast(DEC)


# --- exact percentiles per group ---


def event_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: count, exact decimal sum, mean, median, p95.
    Spark ``percentile`` and DuckDB ``quantile_cont`` both interpolate
    linearly — verified bit-identical at 6 dp on this corpus."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(_dec("value")), 4).cast("double").alias("sum_value"),
            (F.sum(_dec("value")).cast("double") / F.count("*")).alias(
                "avg_value"
            ),
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("median_value"),
            F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95_value"),
        )
        .orderBy("event_type")
    )


EVENT_STATS_SQL = """
SELECT event_type, count(*) AS n,
       CAST(round(sum(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_value,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(*)
         AS avg_value,
       round(quantile_cont(value, 0.5), 6) AS median_value,
       round(quantile_cont(value, 0.95), 6) AS p95_value
FROM events GROUP BY event_type ORDER BY event_type
"""


# --- CUBE grouping sets (rollup_returns' sibling) ---


def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(returnflag, linestatus): all four grouping-set combinations
    in one pass — Spark expands the sets with partial aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    # project the decimal product BEFORE the cube: Expand replicates
    # every row once per grouping set, so computing rev upstream runs
    # the wide-decimal multiply N times instead of 4N
    return (
        li.select("l_returnflag", "l_linestatus", rev.alias("__rev"))
        .cube("l_returnflag", "l_linestatus")
        # grand-total magnitudes push the (38,8) sum past float64's 17
        # significant digits, where the engines' decimal->double paths
        # diverge by 1 ulp — downcast once to (18,4) on both sides
        .agg(F.count("*").alias("n_lines"),
             F.round(F.sum("__rev"), 4).cast("double").alias("revenue"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_lines",
            "revenue",
        )
        .orderBy("returnflag", "linestatus")
    )


CUBE_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n_lines,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                 * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS revenue
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


# --- conversion funnel (view -> click -> purchase, strictly ordered) ---


def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users progressing view -> click -> purchase with strictly
    increasing first-touch times. All comparisons on exact int64
    nanosecond timestamps — no float time math."""
    ev = load_table(spark, sf_dir, "events")
    first = lambda t: F.min(  # noqa: E731
        F.when(F.col("event_type") == t, F.col("ts_ns"))
    )
    per_user = ev.groupBy("user_id").agg(
        first("view").alias("t_view"),
        first("click").alias("t_click"),
        first("purchase").alias("t_buy"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    bought = clicked & (F.col("t_buy") > F.col("t_click"))
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.sum(viewed.cast("long")).alias("n_viewed"),
        F.sum(clicked.cast("long")).alias("n_clicked_after_view"),
        F.sum(bought.cast("long")).alias("n_purchased_after_click"),
    )


FUNNEL_SQL = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN epoch_ns(ts) END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END) AS t_buy
  FROM events GROUP BY user_id
)
SELECT count(*) AS n_users,
       CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
       CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked_after_view,
       CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                 AND t_buy > t_click
                THEN 1 ELSE 0 END) AS BIGINT) AS n_purchased_after_click
FROM per_user
"""


# --- rolling 7-day event volume ---

ROLLING_EPOCH = "2024-01-01"


def events_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event count + 7-day rolling sum. The rolling frame is a
    RANGE window over the day ordinal (gap-safe: missing days still
    bound the frame by value, not by row position)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(F.to_date("ts").alias("dt"))
        .groupBy("dt")
        .agg(F.count("*").alias("n_events"))
        .withColumn(
            "dt_ord",
            F.datediff(F.col("dt"), F.lit(ROLLING_EPOCH).cast("date")),
        )
    )
    w = Window.orderBy("dt_ord").rangeBetween(-6, 0)
    return (
        daily.select(
            F.date_format("dt", "yyyy-MM-dd").alias("dt"),
            "n_events",
            F.sum("n_events").over(w).alias("rolling_7d"),
        )
        .orderBy("dt")
    )


ROLLING_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS dt, count(*) AS n_events,
         date_diff('day', DATE '{ROLLING_EPOCH}', CAST(ts AS DATE)) AS dt_ord
  FROM events GROUP BY 1, 3
)
SELECT strftime(dt, '%Y-%m-%d') AS dt, n_events,
       CAST(sum(n_events) OVER (ORDER BY dt_ord
                           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS rolling_7d
FROM daily ORDER BY dt
"""


register(QuerySpec("event_value_stats", event_value_stats, EVENT_STATS_SQL,
                   "exact percentiles (median/p95) per event type"))
register(QuerySpec("cube_revenue", cube_revenue, CUBE_SQL,
                   "CUBE grouping sets over lineitem"))
register(QuerySpec("conversion_funnel", conversion_funnel, FUNNEL_SQL,
                   "ordered view->click->purchase funnel on exact ns times"))
register(QuerySpec("events_rolling_7d", events_rolling_7d, ROLLING_SQL,
                   "7-day rolling event volume via RANGE window"))



# ---------------------------------------------------------------------------
# seasonal-baseline anomaly detection (operators/seasonal.py)
# ---------------------------------------------------------------------------

SEASONAL_TOP_K = 10


def events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 10 most day-of-week-anomalous (event_type, day) cells:
    daily exact-decimal totals vs the stratum's median baseline,
    scaled by the stratum MAD (operators/seasonal.py). Day-of-week is
    days-since-epoch mod 7 so both engines agree without touching
    their dayofweek() conventions."""
    from kinesis_vcr_spark.operators.seasonal import top_anomalies  # noqa: PLC0415

    ev = load_table(spark, sf_dir, "events")
    out = top_anomalies(ev, ["event_type"], k=SEASONAL_TOP_K)
    return out.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("dow").cast("long").alias("dow"),
        "total",
        "med",
        "mad",
        "dev",
    )


SEASONAL_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(round(sum(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS total
  FROM events GROUP BY 1, 2
), dowd AS (
  SELECT *, date_diff('day', DATE '1970-01-01', d) % 7 AS dow FROM daily
), med AS (
  SELECT event_type, dow, round(quantile_cont(total, 0.5), 6) AS med
  FROM dowd GROUP BY 1, 2
), wm AS (
  SELECT dowd.*, med.med FROM dowd
  JOIN med ON dowd.event_type = med.event_type AND dowd.dow = med.dow
), mad AS (
  SELECT event_type, dow,
         round(quantile_cont(abs(total - med), 0.5), 6) AS mad
  FROM wm GROUP BY 1, 2
), scored AS (
  SELECT wm.event_type, strftime(wm.d, '%Y-%m-%d') AS day,
         CAST(wm.dow AS BIGINT) AS dow, wm.total, wm.med, mad.mad,
         CASE WHEN mad.mad > 0
              THEN round((wm.total - wm.med) / mad.mad, 6) END AS dev
  FROM wm JOIN mad ON wm.event_type = mad.event_type AND wm.dow = mad.dow
)
SELECT event_type, day, dow, total, med, mad, dev FROM scored
WHERE dev IS NOT NULL
ORDER BY abs(dev) DESC, event_type, day
LIMIT {SEASONAL_TOP_K}
"""


register(
    QuerySpec(
        "events_seasonal_anomaly",
        events_seasonal_anomaly,
        SEASONAL_SQL,
        "seasonal anomaly detection: per-stratum median/MAD deviation "
        "of exact-decimal daily totals, engine-neutral day-of-week",
    )
)
