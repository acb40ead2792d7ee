"""Second batch of relational analytics — filter-only aggregation,
EXISTS / NOT-EXISTS (semi/anti joins), conditional aggregation over a
join, having-filtered re-join, ROLLUP grouping sets.

Same hash-parity discipline as relational.py: DECIMAL(18,4) money math,
round-once-at-the-end, identical aliases both engines.

Scale posture: q6 is a pure scan+filter+agg (pushdown does the work);
the semi/anti joins shuffle on the join key only (no payload columns
move); q18's HAVING runs before the re-join so only qualifying orders
shuffle twice; the rollup is one pass with partial aggregation per
grouping set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_vcr_spark.queries import QuerySpec, register
from kinesis_vcr_spark.tables import load_table

DEC = "decimal(18,4)"


def _dec(col: str):
    return F.col(col).cast(DEC)


# --- Q6-style forecast revenue (scan + filter + single agg) ---


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(_dec("l_extendedprice") * _dec("l_discount")), 4)
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


Q6_SQL = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
           * CAST(l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --- Q4-style priority check (EXISTS → left-semi join) ---


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders (in a quarter) having ≥1 line shipped after the order
    date, counted per priority — EXISTS as a left-semi join that only
    shuffles the keys."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    window_orders = orders.where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    late = li.join(
        window_orders.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).where(F.col("l_shipdate") > F.col("o_orderdate")).select("l_orderkey")
    qualified = window_orders.join(
        late, window_orders.o_orderkey == late.l_orderkey, "left_semi"
    )
    return (
        qualified.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --- customers with no orders (NOT EXISTS → left-anti join) ---


DORMANT_CUTOFF = "2000-06-01 00:00:00"


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dormant customers: no orders since the cutoff — NOT EXISTS as a
    left-anti join; only order KEYS move through the shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    recent = orders.where(
        F.col("o_orderdate") >= F.lit(DORMANT_CUTOFF).cast("timestamp")
    ).select("o_custkey")
    idle = cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
    return (
        idle.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("idle_customers"),
            F.round(F.sum(_dec("c_acctbal")), 4).cast("double").alias("idle_balance"),
        )
        .orderBy("c_mktsegment")
    )


NO_ORDERS_SQL = f"""
SELECT c_mktsegment, count(*) AS idle_customers,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 4) AS DOUBLE) AS idle_balance
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '{DORMANT_CUTOFF}'
)
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# --- Q14-style promo revenue share (conditional agg over a join) ---


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    joined = li.where(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    ).join(part, li.l_partkey == part.p_partkey)  # part scales with SF:
    # no broadcast hint — AQE decides at runtime (see test_plans.py)
    return joined.agg(
        F.round(
            F.sum(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(
                    F.lit(0).cast(DEC)
                )
            ),
            4,
        )
        .cast("double")
        .alias("promo_revenue"),
        F.round(F.sum(rev), 4).cast("double").alias("total_revenue"),
        (
            F.sum(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(
                    F.lit(0).cast(DEC)
                )
            ).cast("double")
            * 100.0
            / F.sum(rev).cast("double")
        ).alias("promo_pct"),
    )


Q14_SQL = """
SELECT CAST(round(sum(CASE WHEN p_type = 'PROMO'
                THEN CAST(l_extendedprice AS DECIMAL(18,4))
                     * (1 - CAST(l_discount AS DECIMAL(18,4)))
                ELSE CAST(0 AS DECIMAL(18,4)) END), 4) AS DOUBLE) AS promo_revenue,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS total_revenue,
       CAST(sum(CASE WHEN p_type = 'PROMO'
                THEN CAST(l_extendedprice AS DECIMAL(18,4))
                     * (1 - CAST(l_discount AS DECIMAL(18,4)))
                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) * 100.0
         / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
               * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
         AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
"""


# --- Q18-style large-volume orders (HAVING + re-join, top-n) ---

Q18_MIN_QTY = 300


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("total_qty"))
        .where(F.col("total_qty") > Q18_MIN_QTY)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            _dec("o_totalprice").cast("double").alias("total_price"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("total_price"), "o_orderkey")
        .limit(20)
    )


Q18_SQL = f"""
WITH big AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,4))) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > {Q18_MIN_QTY}
)
SELECT c_name, o_orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
       CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS total_price,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_price DESC, o_orderkey
LIMIT 20
"""


# --- ROLLUP grouping sets ---


def rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(returnflag, linestatus): per-combination, per-flag, and
    grand-total rows in one pass (Spark expands grouping sets with
    partial aggregation per set)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum(_dec("l_quantity")), 4).cast("double").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_lines",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


ROLLUP_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n_lines,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


register(QuerySpec("q6_forecast_revenue", q6_forecast_revenue, Q6_SQL,
                   "scan + filter + single aggregate (TPC-H Q6 shape)"))
register(QuerySpec("q4_order_priority", q4_order_priority, Q4_SQL,
                   "EXISTS via left-semi join (TPC-H Q4 shape)"))
register(QuerySpec("customers_without_orders", customers_without_orders,
                   NO_ORDERS_SQL, "NOT EXISTS via left-anti join"))
register(QuerySpec("q14_promo_revenue", q14_promo_revenue, Q14_SQL,
                   "conditional aggregation over broadcast join (Q14 shape)"))
register(QuerySpec("q18_large_orders", q18_large_orders, Q18_SQL,
                   "HAVING + re-join + top-n (TPC-H Q18 shape)"))
register(QuerySpec("rollup_returns", rollup_returns, ROLLUP_SQL,
                   "ROLLUP grouping sets"))
