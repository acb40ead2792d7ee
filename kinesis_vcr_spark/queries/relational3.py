"""Third batch of relational analytics — the remaining TPC-H query
shapes adapted to the driver's synthetic star schema (which has no
partsupp table and no comment/shipmode/receiptdate columns; each query
notes its adaptation).

Same hash-parity discipline as relational.py / relational2.py:

- money in DECIMAL(18,4) on both engines, round once at the end;
- averages / shares = exact decimal sums cast to double, then divided;
- threshold comparisons against an average are cross-multiplied into
  exact integer/decimal arithmetic (q17: ``5*cnt*qty < sum`` instead of
  ``qty < 0.2*avg``) so both engines make identical keep/drop choices;
- years as INTEGER on both sides; LIMIT queries carry key tie-breaks.

Scale posture: every query is joins + partial-agg groupBy with only the
O(1) region→nation chain force-broadcast; per-part / per-order ratios
use keyed windows (one shuffle on the natural key, no global sort); the
q22 scalar average is a 1-row broadcast cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_vcr_spark.queries import QuerySpec, register
from kinesis_vcr_spark.tables import load_table

DEC = "decimal(18,4)"


def _dec(col: str):
    return F.col(col).cast(DEC)


def _rev():
    return _dec("l_extendedprice") * (1 - _dec("l_discount"))


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# --- Q7: volume shipping between two nations, by direction and year ---

Q7_NATIONS = ("NATION_1", "NATION_2")


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade volume NATION_1 <-> NATION_2 per (supp_nation, cust_nation,
    ship year). lineitem->supplier and orders->customer each resolve a
    nation via the broadcast dimension; the fact-fact join shuffles on
    the order key only."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("nation", "customer", "supplier", "orders", "lineitem")}
    nation = t["nation"].select("n_nationkey", "n_name")
    supp = (
        t["supplier"]
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        t["customer"]
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    a, b = Q7_NATIONS
    return (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1999-01-01"))
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .where(
            ((F.col("supp_nation") == a) & (F.col("cust_nation") == b))
            | ((F.col("supp_nation") == b) & (F.col("cust_nation") == a))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.round(F.sum(_rev()), 4).cast("double").alias("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS volume
FROM (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
    AND ((ns.n_name = '{Q7_NATIONS[0]}' AND nc.n_name = '{Q7_NATIONS[1]}')
      OR (ns.n_name = '{Q7_NATIONS[1]}' AND nc.n_name = '{Q7_NATIONS[0]}'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# --- Q8: market share of one supplier nation, per order year ---

Q8_REGION = "AMERICA"
Q8_NATION = "NATION_3"
Q8_TYPE = "ECONOMY"


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of {Q8_NATION}-supplied revenue among {Q8_TYPE} parts sold
    into region {Q8_REGION}, per order year. Adaptation: p_mfgr doesn't
    exist, so the part filter is p_type."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem")}
    nation = t["nation"].select("n_nationkey", "n_name", "n_regionkey")
    cust_in_region = (
        t["customer"]
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == Q8_REGION)
        .select("c_custkey")
    )
    supp_nation = (
        t["supplier"]
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    nation_rev = F.when(F.col("supp_nation") == Q8_NATION, _rev()).otherwise(
        F.lit(0).cast(DEC)
    )
    return (
        t["lineitem"]
        .join(
            t["part"].where(F.col("p_type") == Q8_TYPE),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_in_region, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(F.sum(nation_rev), 4).cast("double").alias("nation_revenue"),
            F.round(F.sum(_rev()), 4).cast("double").alias("total_revenue"),
            (
                F.sum(nation_rev).cast("double")
                / F.sum(_rev()).cast("double")
            ).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
WITH base AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l_discount AS DECIMAL(18,4))) AS rev,
         ns.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  WHERE p_type = '{Q8_TYPE}'
    AND o_custkey IN (
      SELECT c_custkey FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = '{Q8_REGION}')
)
SELECT o_year,
       CAST(round(sum(CASE WHEN supp_nation = '{Q8_NATION}' THEN rev
                ELSE CAST(0 AS DECIMAL(18,4)) END), 4) AS DOUBLE) AS nation_revenue,
       CAST(round(sum(rev), 4) AS DOUBLE) AS total_revenue,
       CAST(sum(CASE WHEN supp_nation = '{Q8_NATION}' THEN rev
                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         / CAST(sum(rev) AS DOUBLE) AS mkt_share
FROM base GROUP BY o_year ORDER BY o_year
"""


# --- Q9: product-type profit, by supplier nation and order year ---

Q9_NAME_FRAGMENT = "red"


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on parts whose name contains '{Q9_NAME_FRAGMENT}', per
    supplier nation x order year. Adaptation: no partsupp, so profit =
    discounted revenue (no supplycost term)."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("nation", "supplier", "part", "orders", "lineitem")}
    supp_nation = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    return (
        t["lineitem"]
        .join(
            t["part"].where(F.col("p_name").contains(Q9_NAME_FRAGMENT)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(t["orders"].select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(_rev()), 4).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%{Q9_NAME_FRAGMENT}%'
GROUP BY n_name, o_year
ORDER BY nation, o_year DESC
"""


# --- Q10: returned-item reporting (top 20 customers by lost revenue) ---


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {n: load_table(spark, sf_dir, n) for n in
         ("nation", "customer", "orders", "lineitem")}
    return (
        t["lineitem"]
        .where(F.col("l_returnflag") == "R")
        .join(
            t["orders"].where(
                (F.col("o_orderdate") >= _ts("2000-01-01"))
                & (F.col("o_orderdate") < _ts("2000-04-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_rev()), 4).cast("double").alias("revenue"))
        .select(
            "c_custkey", "c_name",
            _dec("c_acctbal").cast("double").alias("acctbal"),
            "n_name", "revenue",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name,
       CAST(CAST(c_acctbal AS DECIMAL(18,4)) AS DOUBLE) AS acctbal,
       n_name,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '2000-04-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- Q12-shape: late shipments by priority class, per ship year ---

Q12_LATE_DAYS = 90


def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lines shipped > {Q12_LATE_DAYS} days after the order date,
    counted per ship year split by order priority class. Adaptation: no
    l_shipmode / commit / receipt dates — 'late' is shipdate vs
    orderdate + interval, grouped by year instead of shipmode."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q12_LATE_DAYS} DAY")
        )
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


Q12_SQL = f"""
SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL {Q12_LATE_DAYS} DAY
GROUP BY ship_year ORDER BY ship_year
"""


# --- Q13: customer order-count distribution ---

Q13_EXCLUDED_PRIORITY = "4-NOT SPECIFIED"


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of customers by number of (non-'{Q13_EXCLUDED_PRIORITY}')
    orders, zero included via the outer join. Adaptation: o_comment
    doesn't exist; the excluded-order predicate is a priority class."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != Q13_EXCLUDED_PRIORITY)
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = f"""
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                   AND o_orderpriority <> '{Q13_EXCLUDED_PRIORITY}'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --- Q15: top supplier(s) by quarterly revenue ---


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum revenue in 1997-Q1. The max is an
    unpartitioned window over the per-supplier aggregate (at most
    |supplier| rows — already reduced), and DECIMAL equality makes the
    tie set identical in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    per_supp = (
        li.where(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1997-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev()).alias("total_revenue"))
    )
    best = per_supp.withColumn(
        "max_revenue", F.max("total_revenue").over(Window.partitionBy())
    ).where(F.col("total_revenue") == F.col("max_revenue"))
    return (
        best.join(supplier, best.l_suppkey == supplier.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            # the max-compare above stays exact decimal; only the OUTPUT
            # is a rounded double (hash parity with DuckDB's float64)
            F.round(F.col("total_revenue"), 4).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice AS DECIMAL(18,4))
             * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       CAST(round(total_revenue, 4) AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# --- Q16: supplier breadth per part attribute group ---

Q16_EXCL_BRAND = "Brand#1"
Q16_EXCL_TYPE = "PROMO"
Q16_SIZES = (1, 5, 9, 13, 17, 21, 25, 29)


def q16_supplier_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers that shipped each (brand, type, size) group,
    excluding one brand and one type. Adaptation: no partsupp — supplier
    *shipments* (lineitem) stand in for the supplier catalog."""
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != Q16_EXCL_BRAND)
        & (F.col("p_type") != Q16_EXCL_TYPE)
        & F.col("p_size").isin(*Q16_SIZES)
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = f"""
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{Q16_EXCL_BRAND}'
  AND p_type <> '{Q16_EXCL_TYPE}'
  AND p_size IN {Q16_SIZES}
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --- Q17: small-quantity order revenue ---

Q17_BRAND = "Brand#5"


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avg yearly revenue lost if sub-20%-of-average-quantity orders of
    one brand were dropped. The per-part average is a keyed window (one
    shuffle on partkey); the threshold compare is cross-multiplied to
    exact decimal: qty*5*cnt < sum_qty."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == Q17_BRAND)
    w = Window.partitionBy("l_partkey")
    branded = li.join(part, li.l_partkey == part.p_partkey)
    flagged = branded.select(
        _dec("l_extendedprice").alias("price"),
        _dec("l_quantity").alias("qty"),
        F.sum(_dec("l_quantity")).over(w).alias("part_sum_qty"),
        F.count("*").over(w).alias("part_cnt"),
    )
    return flagged.where(
        F.col("qty") * 5 * F.col("part_cnt") < F.col("part_sum_qty")
    ).agg(
        (F.sum("price").cast("double") / 7.0).alias("avg_yearly"),
        F.count("*").alias("n_lines"),
    )


Q17_SQL = f"""
WITH branded AS (
  SELECT CAST(l_extendedprice AS DECIMAL(18,4)) AS price,
         CAST(l_quantity AS DECIMAL(18,4)) AS qty,
         sum(CAST(l_quantity AS DECIMAL(18,4)))
           OVER (PARTITION BY l_partkey) AS part_sum_qty,
         count(*) OVER (PARTITION BY l_partkey) AS part_cnt
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{Q17_BRAND}'
)
SELECT CAST(sum(price) AS DOUBLE) / 7.0 AS avg_yearly,
       count(*) AS n_lines
FROM branded
WHERE qty * 5 * part_cnt < part_sum_qty
"""


# --- Q19: discounted revenue over OR'd predicate branches ---


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three OR'd (brand, size-range, quantity-range) branches — the
    disjunctive pushdown shape. Adaptation: no p_container / shipmode
    legs."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.where(branch).agg(
        F.round(F.sum(_rev()), 4).cast("double").alias("revenue"),
        F.count("*").alias("n_lines"),
    )


Q19_SQL = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
           * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


# --- Q20-shape: dominant suppliers per part ---


def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers shipping an outsized share (>1/8) of some part's total
    quantity, with how many parts they dominate. Adaptation: no
    partsupp availability data — shipped quantity is the stock proxy,
    and the synthetic data spreads parts near-uniformly over suppliers
    (max observed share ~25%), so the classic majority cut would be
    vacuous. The share test is cross-multiplied (8*supp_qty > total) —
    exact decimal, no float division."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    per_pair = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec("l_quantity")).alias("supp_qty")
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        per_pair.withColumn("total_qty", F.sum("supp_qty").over(w))
        .where(F.col("supp_qty") * 8 > F.col("total_qty"))
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("parts_dominated"))
    )
    return (
        dominant.join(supplier, dominant.l_suppkey == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "parts_dominated")
        .orderBy(F.desc("parts_dominated"), "s_suppkey")
    )


Q20_SQL = """
WITH per_pair AS (
  SELECT l_partkey, l_suppkey,
         sum(CAST(l_quantity AS DECIMAL(18,4))) AS supp_qty
  FROM lineitem GROUP BY l_partkey, l_suppkey
), dominant AS (
  SELECT l_suppkey, count(*) AS parts_dominated
  FROM (
    SELECT l_suppkey, supp_qty,
           sum(supp_qty) OVER (PARTITION BY l_partkey) AS total_qty
    FROM per_pair
  ) WHERE supp_qty * 8 > total_qty
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, parts_dominated
FROM supplier JOIN dominant ON s_suppkey = l_suppkey
ORDER BY parts_dominated DESC, s_suppkey
"""


# --- Q21-shape: the sole late supplier on multi-supplier orders ---

Q21_LATE_DAYS = 60


def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the ONLY late shipper (> {Q21_LATE_DAYS} days
    after order date) on orders involving >= 2 suppliers. Adaptation: no
    commit/receipt dates — lateness is shipdate vs orderdate; no
    order-status filter. Two keyed aggregations, no self-joins."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {Q21_LATE_DAYS} DAY"
    )
    per_supp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late.cast("int")).alias("was_late"))
    )
    wo = Window.partitionBy("l_orderkey")
    culprits = (
        per_supp.withColumn("n_supp", F.count("*").over(wo))
        .withColumn("n_late", F.sum("was_late").over(wo))
        .where(
            (F.col("n_supp") >= 2)
            & (F.col("n_late") == 1)
            & (F.col("was_late") == 1)
        )
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
    )
    return (
        culprits.join(supplier, culprits.l_suppkey == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(25)
    )


Q21_SQL = f"""
WITH per_supp AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
                  THEN 1 ELSE 0 END) AS was_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_orderkey, l_suppkey
), flagged AS (
  SELECT l_suppkey, was_late,
         count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
         sum(was_late) OVER (PARTITION BY l_orderkey) AS n_late
  FROM per_supp
), culprits AS (
  SELECT l_suppkey, count(*) AS numwait
  FROM flagged
  WHERE n_supp >= 2 AND n_late = 1 AND was_late = 1
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, numwait
FROM supplier JOIN culprits ON s_suppkey = l_suppkey
ORDER BY numwait DESC, s_suppkey
LIMIT 25
"""


# --- Q22-shape: rich dormant customers by nation ---

Q22_CUTOFF = "2001-01-01 00:00:00"


def q22_dormant_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-(positive-)average balance and no orders
    since the cutoff, grouped by nation key. Adaptation: no c_phone —
    the country grouping is c_nationkey. The scalar average is a 1-row
    broadcast; the NOT EXISTS is a left-anti join on keys only."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = (
        cust.where(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(_dec("c_acctbal")).cast("double") / F.count("*")
            ).alias("avg_bal")
        )
    )
    recent = orders.where(
        F.col("o_orderdate") >= F.lit(Q22_CUTOFF).cast("timestamp")
    ).select("o_custkey")
    return (
        cust.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal").cast("double") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(_dec("c_acctbal")), 4).cast("double").alias("totacctbal"),
        )
        .orderBy("cntry")
    )


Q22_SQL = f"""
SELECT c_nationkey AS cntry, count(*) AS numcust,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 4) AS DOUBLE) AS totacctbal
FROM customer c
WHERE CAST(c_acctbal AS DOUBLE) > (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
               / count(*)
        FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '{Q22_CUTOFF}')
GROUP BY cntry ORDER BY cntry
"""


register(QuerySpec("q7_volume_shipping", q7_volume_shipping, Q7_SQL,
                   "two-nation trade volume by direction and year (Q7 shape)"))
register(QuerySpec("q8_market_share", q8_market_share, Q8_SQL,
                   "national market share per year (Q8 shape)"))
register(QuerySpec("q9_product_profit", q9_product_profit, Q9_SQL,
                   "profit by supplier nation x year (Q9 shape)"))
register(QuerySpec("q10_returned_items", q10_returned_items, Q10_SQL,
                   "top customers by returned revenue (Q10 shape)"))
register(QuerySpec("q12_late_shipments", q12_late_shipments, Q12_SQL,
                   "late lines split by priority class (Q12 shape)"))
register(QuerySpec("q13_customer_distribution", q13_customer_distribution,
                   Q13_SQL, "order-count distribution incl. zeros (Q13)"))
register(QuerySpec("q15_top_supplier", q15_top_supplier, Q15_SQL,
                   "max-revenue supplier via scalar max (Q15 shape)"))
register(QuerySpec("q16_supplier_breadth", q16_supplier_breadth, Q16_SQL,
                   "distinct-supplier count per part group (Q16 shape)"))
register(QuerySpec("q17_small_quantity", q17_small_quantity, Q17_SQL,
                   "sub-average-quantity revenue via keyed window (Q17)"))
register(QuerySpec("q19_discounted_revenue", q19_discounted_revenue, Q19_SQL,
                   "OR'd multi-branch predicate revenue (Q19 shape)"))
register(QuerySpec("q20_dominant_suppliers", q20_dominant_suppliers, Q20_SQL,
                   "majority-share suppliers per part (Q20 shape)"))
register(QuerySpec("q21_sole_late_supplier", q21_sole_late_supplier, Q21_SQL,
                   "sole late supplier on multi-supplier orders (Q21)"))
register(QuerySpec("q22_dormant_rich", q22_dormant_rich, Q22_SQL,
                   "rich dormant customers by nation (Q22 shape)"))
