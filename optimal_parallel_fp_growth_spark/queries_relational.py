"""Relational query pack — operator classes the reference lacks
entirely (SURVEY §2.4/§2.3 '(absent)': outer/semi/anti joins, distinct
aggregation, set operators, windowed top-n, wide aggregation):

- pricing_summary          — TPC-H Q1 shape: pushed-down date filter +
                             wide multi-aggregate groupBy.
- customers_no_big_orders  — LEFT ANTI join against a filtered build side.
- top_suppliers_per_nation — join + agg + row_number window top-3.
- order_priority_stats     — COUNT(DISTINCT) + plain aggs per group.
- segment_part_overlap     — INTERSECT of two join pipelines.
- shipping_priority        — TPC-H Q3 shape: date predicates pushed to
                             BOTH fact scans, broadcast segment dim,
                             deterministic top-10 (TakeOrdered).

All pure DataFrame; every one has an exact DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from optimal_parallel_fp_growth_spark.functions.layout import fan_out_scan
from optimal_parallel_fp_growth_spark.functions.time import epoch_seconds
from optimal_parallel_fp_growth_spark.sources.catalog import load_table

SHIP_CUTOFF = "1998-09-02"
Q3_DATE = "1998-01-01"
Q3_SEGMENT = "BUILDING"
BIG_ORDER = 300000.0
TOP_N = 3
SEG_A, SEG_B = "BUILDING", "MACHINERY"


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= SHIP_CUTOFF)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_customers_no_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    big = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > BIG_ORDER
    )
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_anti"
    )


def q_top_suppliers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    rev = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name", "s_nationkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    w = Window.partitionBy("s_nationkey").orderBy(
        F.desc("revenue"), F.asc("s_suppkey")
    )
    return (
        rev.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_N)
        .select("s_nationkey", "rank", "s_suppkey", "s_name", "revenue")
    )


def q_order_priority_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
    )


def q_segment_part_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")

    def parts_of(segment: str) -> DataFrame:
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(
                F.broadcast(cust.where(F.col("c_mktsegment") == segment)),
                orders.o_custkey == F.col("c_custkey"),
            )
            .select("l_partkey")
            .distinct()
        )

    return parts_of(SEG_A).intersect(parts_of(SEG_B)).select(
        F.col("l_partkey").alias("partkey")
    )


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-revenue top-10 for one market segment.
    Both date filters reach the parquet scans (PushedFilters), the
    segment dim is broadcast, and the top-10 is a TakeOrderedAndProject
    over the rounded revenue with l_orderkey tiebreak (total order →
    deterministic)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == Q3_SEGMENT)
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < Q3_DATE)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > Q3_DATE)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    return (
        agg.orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            epoch_seconds(orders, "o_orderdate").alias("o_orderdate_epoch"),
            "o_orderpriority",
            "revenue",
        )
    )


ORACLE_PRICING = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{SHIP_CUTOFF}'
GROUP BY 1, 2
"""

ORACLE_NO_BIG = f"""
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > {BIG_ORDER})
"""

ORACLE_TOP_SUPP = f"""
WITH rev AS (
  SELECT s_suppkey, s_name, s_nationkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1, 2, 3
),
r AS (SELECT *, row_number() OVER (PARTITION BY s_nationkey
                                   ORDER BY revenue DESC, s_suppkey ASC) AS rank
      FROM rev)
SELECT s_nationkey, rank, s_suppkey, s_name, revenue
FROM r WHERE rank <= {TOP_N}
"""

ORACLE_PRIORITY = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers,
       round(avg(o_totalprice), 6) AS avg_price
FROM orders GROUP BY 1
"""

ORACLE_OVERLAP = f"""
SELECT DISTINCT l_partkey AS partkey
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{SEG_A}'
INTERSECT
SELECT DISTINCT l_partkey AS partkey
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{SEG_B}'
"""

ORACLE_SHIPPING_PRIORITY = f"""
WITH j AS (
  SELECT l_orderkey,
         (epoch_us(o_orderdate) // 1000000) AS o_orderdate_epoch,
         o_orderpriority,
         l_extendedprice * (1 - l_discount) AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = '{Q3_SEGMENT}'
    AND o_orderdate < TIMESTAMP '{Q3_DATE}'
    AND l_shipdate > TIMESTAMP '{Q3_DATE}'
)
SELECT l_orderkey, o_orderdate_epoch, o_orderpriority,
       round(sum(rev), 2) AS revenue
FROM j GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""

Q10_START, Q10_END = "1997-07-01", "1997-10-01"
Q10_TOP = 20
Q18_QTY = 150.0


def q_returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue last quarter.
    Both fact filters (l_returnflag = 'R', the o_orderdate quarter) push
    to their parquet scans; nation is broadcast; the final top-20 is a
    TakeOrderedAndProject on (revenue desc, c_custkey asc) — total
    order, deterministic."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= Q10_START) & (F.col("o_orderdate") < Q10_END)
        )
        .select("o_orderkey", "o_custkey")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(Q10_TOP)
    )


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity clears a threshold —
    aggregate-then-join (the HAVING side is reduced to ~2.9k keys BEFORE
    touching orders/customer, so the join input is the aggregate, never
    the raw fact), then enrich with the customer dim."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .where(F.col("total_qty") > Q18_QTY)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("o_orderkey").alias("orderkey"),
            epoch_seconds(orders, "o_orderdate").alias("o_orderdate_epoch"),
            "o_totalprice",
            "total_qty",
        )
    )


def q_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (ratio-to-report): each supplier nation's share of
    every order-year's revenue. The share is a window SUM over the
    25-row-per-year aggregate — the window runs on the REDUCED aggregate
    (≤ years × nations rows), never on fact rows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.year("o_orderdate").alias("o_year"), "n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "rev"
            )
        )
    )
    w = Window.partitionBy("o_year")
    return rev.select(
        "o_year",
        "n_name",
        F.round("rev", 2).alias("revenue"),
        F.round(F.col("rev") / F.sum("rev").over(w), 6).alias("share"),
    )


ORACLE_RETURNED_ITEMS = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{Q10_START}'
  AND o_orderdate <  TIMESTAMP '{Q10_END}'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey ASC
LIMIT {Q10_TOP}
"""

ORACLE_LARGE_ORDERS = f"""
WITH big AS (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY 1 HAVING round(sum(l_quantity), 2) > {Q18_QTY}
)
SELECT c_custkey, c_name, o_orderkey AS orderkey,
       (epoch_us(o_orderdate) // 1000000) AS o_orderdate_epoch,
       o_totalprice, total_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
"""

ORACLE_NATION_SHARE = """
WITH rev AS (
  SELECT year(o_orderdate) AS o_year, n_name,
         sum(l_extendedprice * (1 - l_discount)) AS rev
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  GROUP BY 1, 2
)
SELECT o_year, n_name,
       round(rev, 2) AS revenue,
       round(rev / sum(rev) OVER (PARTITION BY o_year), 6) AS share
FROM rev
"""


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: every predicate pushes to the parquet scan
    (PushedFilters on l_shipdate/l_discount/l_quantity), then a single
    partial+final global aggregate — zero shuffle of row data, only the
    one-row partial aggregates move."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= Q6_START)
            & (F.col("l_shipdate") < Q6_END)
            & (F.col("l_discount") >= Q6_DISC_LO)
            & (F.col("l_discount") <= Q6_DISC_HI)
            & (F.col("l_quantity") < Q6_QTY)
        ).agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue")
        )
    )


Q6_START, Q6_END = "1997-01-01", "1998-01-01"
Q6_DISC_LO, Q6_DISC_HI = 0.05, 0.07
Q6_QTY = 24.0

ORACLE_FORECAST_REVENUE = f"""
SELECT round(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_START}' AND l_shipdate < TIMESTAMP '{Q6_END}'
  AND l_discount >= {Q6_DISC_LO} AND l_discount <= {Q6_DISC_HI}
  AND l_quantity < {Q6_QTY}
"""

Q7_NATION_A, Q7_NATION_B = "NATION_1", "NATION_2"
Q7_START, Q7_END = "1996-01-01", "1998-01-01"
Q14_START, Q14_END = "1997-09-01", "1997-10-01"
Q9_PART_LIKE = "widget"
Q19_BRANDS = (  # (brand, max_size, qty_lo, qty_hi)
    ("Brand#1", 15, 1.0, 15.0),
    ("Brand#2", 25, 10.0, 25.0),
    ("Brand#3", 50, 20.0, 35.0),
)


def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year and
    direction. Fact-side date filter pushes to the lineitem scan; the
    two nation-filtered supplier/customer sides are broadcast (dim
    tables stay dim-sized at any corpus scale)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= Q7_START) & (F.col("l_shipdate") < Q7_END)
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name").isin(Q7_NATION_A, Q7_NATION_B))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name").isin(Q7_NATION_A, Q7_NATION_B))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


ORACLE_TRADE_VOLUME = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       date_part('year', l_shipdate)::INT AS l_year,
       round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,6)), 2)::DOUBLE AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '{Q7_START}' AND l_shipdate < TIMESTAMP '{Q7_END}'
  AND sn.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}')
  AND cn.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}')
  AND sn.n_name <> cn.n_name
GROUP BY 1, 2, 3
"""


def q_product_line_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no supplycost column in this schema, so revenue
    stands in for profit): revenue of one product line by supplier
    nation and order year. Part filter prunes before the broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").contains(Q9_PART_LIKE))
        .select("p_partkey")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


ORACLE_PRODUCT_LINE = f"""
SELECT n_name AS nation, date_part('year', o_orderdate)::INT AS o_year,
       round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,6)), 2)::DOUBLE AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%{Q9_PART_LIKE}%'
GROUP BY 1, 2
"""


def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of one month's revenue from PROMO parts.
    One broadcast join + a single global conditional aggregate."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= Q14_START) & (F.col("l_shipdate") < Q14_END)
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev)
                    .otherwise(0.0)
                    .cast("decimal(18,6)")
                ).cast("double")
                / F.sum(rev.cast("decimal(18,6)")).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


ORACLE_PROMO_REVENUE = f"""
SELECT round(100.0 * sum((CASE WHEN p_type = 'PROMO'
                               THEN l_extendedprice * (1 - l_discount)
                               ELSE 0.0 END)::DECIMAL(18,6))::DOUBLE
             / sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,6))::DOUBLE,
             6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '{Q14_START}'
  AND l_shipdate < TIMESTAMP '{Q14_END}'
"""


def q_brand_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of per-brand (size, quantity)
    windows — the canonical OR-of-ANDs predicate that must NOT explode
    into a cross product: one broadcast hash join on partkey with the
    residual disjunction as the join filter."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    arm = None
    for brand, max_size, qty_lo, qty_hi in Q19_BRANDS:
        cond = (
            (F.col("p_brand") == brand)
            & (F.col("p_size") <= max_size)
            & (F.col("l_quantity") >= qty_lo)
            & (F.col("l_quantity") <= qty_hi)
        )
        arm = cond if arm is None else arm | cond
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(arm)
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


_Q19_ARMS = " OR ".join(
    f"(p_brand = '{b}' AND p_size <= {s} AND l_quantity BETWEEN {lo} AND {hi})"
    for b, s, lo, hi in Q19_BRANDS
)

ORACLE_BRAND_DISCOUNT = f"""
SELECT round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,6)), 2)::DOUBLE AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {_Q19_ARMS}
"""


def _supplier_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized customer–supplier trade edge list (edge: customer
    bought from supplier, via orders ⨝ lineitem). Distinct by
    construction: cs is distinct and the 'c'/'s' prefixes make the
    reversed copy disjoint from it."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # the (orderkey, suppkey) projection is 16 bytes/row, but the
    # broadcast-join + concat + distinct map side runs ON the lineitem
    # scan's partitioning — serial on a single-split source (measured
    # r17: a 0.8 s 3-task edge-build job at sf0.1); a healthy scan
    # passes through untouched (functions/layout.py)
    li = fan_out_scan(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey"),
        "l_orderkey",
    )
    cs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    # symmetrize by EXPLODING each edge into its two directions instead
    # of union(cs, reversed(cs)) (r18): the union carried the whole
    # join→distinct subtree TWICE — AQE's stage reuse dedupes the
    # distinct's shuffle write, but the post-exchange final aggregate,
    # projection and exchange read still ran once per branch. The
    # explode yields the identical row multiset (cs is distinct and the
    # 'c'/'s' prefixes keep the reversed rows disjoint) in ONE pass.
    return cs.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")


def q_supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the symmetrized customer–supplier trade graph.
    Symmetrizing gives every node outdeg ≥ 1, so no dangling-mass
    leak — see operators/graph.py."""
    from optimal_parallel_fp_growth_spark.operators.graph import pagerank

    # sym is distinct by construction — skip the operator's defensive
    # full-edge-list dedup shuffle; symmetric by construction — skip
    # the per-round nodes-side left join (graph.py docstring)
    return pagerank(
        _supplier_trade_graph(spark, sf_dir),
        assume_distinct=True,
        assume_symmetric=True,
    )


def q_supplier_pagerank_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same ranks via the big-graph path: the loop-invariant edge list
    is written once as an src-bucketed table, so no round re-shuffles
    it and it never occupies the block manager (graph.py docstring).
    Shares `supplier_pagerank`'s oracle — the two must agree exactly."""
    from optimal_parallel_fp_growth_spark.operators.graph import pagerank

    return pagerank(
        _supplier_trade_graph(spark, sf_dir),
        assume_distinct=True,
        assume_symmetric=True,
        bucketed_edges=True,
    )


def _oracle_pagerank(damping: float, n_iter: int) -> str:
    """Unrolled power iteration mirroring operators/graph.py
    round-for-round (round(rank, 9) each round)."""
    head = f"""
WITH cs AS (SELECT DISTINCT 'c' || o_custkey::VARCHAR AS src,
                            's' || l_suppkey::VARCHAR AS dst
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
ed0 AS (SELECT src, dst FROM cs UNION SELECT dst, src FROM cs),
deg AS (SELECT src, count(*) AS outdeg FROM ed0 GROUP BY src),
ed AS (SELECT ed0.src, ed0.dst, deg.outdeg FROM ed0 JOIN deg USING (src)),
nodes AS (SELECT src AS node FROM ed0 UNION SELECT dst FROM ed0),
nn AS (SELECT count(*) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    steps = []
    for i in range(1, n_iter + 1):
        steps.append(f""",
s{i} AS (SELECT ed.dst AS node, sum(r.rank / ed.outdeg) AS s
         FROM ed JOIN r{i - 1} r ON ed.src = r.node GROUP BY ed.dst),
r{i} AS (SELECT nodes.node,
                round((1.0 - {damping}) / (SELECT n FROM nn)
                      + {damping} * coalesce(s{i}.s, 0.0), 9) AS rank
         FROM nodes LEFT JOIN s{i} ON nodes.node = s{i}.node)""")
    return head + "".join(steps) + f"""
SELECT node, rank FROM r{n_iter}
"""


from optimal_parallel_fp_growth_spark.operators.graph import (  # noqa: E402
    PR_DAMPING,
    PR_ITER,
)

ORACLE_SUPPLIER_PAGERANK = _oracle_pagerank(PR_DAMPING, PR_ITER)

# ---------------------------------------------------------------------------
# Batch 4 — correlated-subquery / decorrelation shapes (TPC-H Q17, Q13,
# Q15, Q22 adapted to the synthetic schema). The reference has no
# subquery support at all (SURVEY §2.4 absent); these exercise the
# rewrites Catalyst would do for correlated scalar subqueries, written
# out explicitly as the scale-correct DataFrame plans.
# ---------------------------------------------------------------------------

Q17_BRAND = "Brand#4"
Q17_QTY_FACTOR = 0.2


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue of small-quantity line items, where
    "small" is relative to the part's own average quantity (a
    correlated scalar subquery in SQL).

    Scale shape: restrict the fact table to the brand's parts FIRST via
    a broadcast join (the brand slice is ~1/brand_count of lineitem),
    then compute the per-part average as an unordered window aggregate
    over ``l_partkey`` — ONE shuffle of the brand slice, versus the
    naive groupBy-avg + re-join which scans and shuffles it twice. The
    final aggregate is a one-row global sum (partials only move)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_parts = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_brand") == Q17_BRAND)
        .select("p_partkey")
    )
    li_b = li.join(
        F.broadcast(brand_parts), li.l_partkey == F.col("p_partkey")
    ).drop("p_partkey")
    w = Window.partitionBy("l_partkey")
    return (
        li_b.withColumn(
            "qty_cap", F.lit(Q17_QTY_FACTOR) * F.avg("l_quantity").over(w)
        )
        .where(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
                .cast("double")
                / F.lit(7.0),
                2,
            ).alias("avg_yearly")
        )
    )


ORACLE_SMALL_QTY = f"""
SELECT round(sum(l_extendedprice::DECIMAL(18,6))::DOUBLE / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = '{Q17_BRAND}'
  AND l_quantity < (
    SELECT {Q17_QTY_FACTOR} * avg(l_quantity)
    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
"""

Q13_EXCLUDED_PRIORITY = "1-URGENT"


def q_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts
    including zero-order customers (outer join + double aggregation).

    Scale shape: aggregate orders down to (custkey, count) BEFORE the
    outer join — the join's build side shrinks from |orders| rows to
    |customers-with-orders| rows, and the second aggregate's input is
    |customers|, not |orders|. Both aggregations get map-side partial
    combine for free."""
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != Q13_EXCLUDED_PRIORITY)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("c_count"))
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("c_count"), F.lit(0).cast("long")).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


ORACLE_CUSTOMER_ORDER_COUNTS = f"""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
    AND o_orderpriority <> '{Q13_EXCLUDED_PRIORITY}'
  GROUP BY c_custkey)
GROUP BY c_count
"""

Q15_START, Q15_END = "1996-01-01", "1996-04-01"


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose quarterly revenue equals
    the global maximum (uncorrelated scalar subquery over a derived
    aggregate).

    Scale shape: one shuffled aggregate over the date-pruned fact scan
    produces per-supplier revenue; the global max is a one-row
    aggregate broadcast back (never a single-reducer global sort); the
    surviving ~1 row broadcasts into the supplier dimension join.
    Revenue sums on DECIMAL so partial-aggregation order can't move
    the result across engines."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= Q15_START) & (F.col("l_shipdate") < Q15_END)
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            ),
            2,
        )
        .cast("double")
        .alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    winners = rev.join(
        F.broadcast(mx), rev.total_revenue == mx.max_revenue
    ).select("l_suppkey", "total_revenue")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        F.broadcast(winners)
        .join(supp, winners.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


ORACLE_TOP_SUPPLIER = f"""
WITH rev AS (
  SELECT l_suppkey,
         round(sum(((l_extendedprice * (1 - l_discount)))::DECIMAL(18,6)), 2)::DOUBLE
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_START}'
    AND l_shipdate < TIMESTAMP '{Q15_END}'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""

Q22_URGENT = "1-URGENT"


def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per-segment count/total of customers whose
    balance beats the global positive-balance average AND who have no
    urgent orders (scalar subquery + NOT EXISTS anti join).

    Scale shape: the global average is a one-row aggregate broadcast
    into the customer scan (no shuffle of customer rows for the
    threshold); the anti join's build side is ``distinct o_custkey``
    of the urgent slice — shrunk before the shuffle; the final
    aggregate is segment-bounded."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    urgent_cust = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == Q22_URGENT)
        .select("o_custkey")
        .distinct()
    )
    rich = cust.join(F.broadcast(avg_bal)).where(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    return (
        rich.join(urgent_cust, rich.c_custkey == urgent_cust.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
    )


ORACLE_IDLE_RICH = f"""
SELECT c_mktsegment, count(*) AS numcust,
       round(sum(c_acctbal::DECIMAL(18,6)), 2)::DOUBLE AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '{Q22_URGENT}')
GROUP BY c_mktsegment
"""

def q_late_order_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS → semi join): count orders per priority
    that have at least one lineitem shipped more than 60 days after
    the order date. The correlated EXISTS (key equality + non-equi
    date predicate) becomes a LEFT SEMI join with the compound
    condition — one orderkey shuffle, lineitem projected to two
    columns before the exchange, priority-bounded aggregate after.
    Adapted to the trimmed schema (no l_commitdate/l_receiptdate):
    lateness is shipdate vs orderdate + 60 days."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


ORACLE_LATE_ORDER_PRIORITIES = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY 1
"""


def q_sole_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (correlated EXISTS + NOT EXISTS pair): for
    multi-supplier orders, find the supplier who ALONE shipped last —
    there EXISTS another supplier on the order, and there does NOT
    EXIST another supplier shipping as late. Decorrelated into two
    aggregates over ONE orderkey shuffle domain:

    - per-order stats (max shipdate, distinct-supplier count) replace
      the EXISTS probe (``n_supp >= 2``);
    - suppliers-at-max per order replace the NOT EXISTS probe
      (``n_at_max == 1`` keeps exactly the sole-latest supplier —
      ``max(l_suppkey)`` is then THE supplier).

    The oracle states the literal correlated EXISTS/NOT EXISTS form,
    so the driver run is a decorrelation differential. Supplier names
    attach via broadcast; output is the top 20 by waiting count
    (unique name tiebreak keeps the limit deterministic). Adapted to
    the trimmed schema: 'kept waiting' is proxied by latest shipdate
    (no l_receiptdate/commitdate)."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    st = l.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("max_ship"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )
    at_max = (
        l.join(st.where(F.col("n_supp") >= 2), "l_orderkey")
        .where(F.col("l_shipdate") == F.col("max_ship"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_at_max"),
            F.max("l_suppkey").alias("l_suppkey"),
        )
        .where(F.col("n_at_max") == 1)
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        at_max.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


ORACLE_SOLE_LATE_SUPPLIERS = """
WITH sole AS (
  SELECT l1.l_orderkey, l1.l_suppkey
  FROM lineitem l1
  WHERE EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM lineitem l3
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey
                      AND l3.l_shipdate >= l1.l_shipdate)
)
SELECT s_name, count(DISTINCT l_orderkey) AS numwait
FROM sole JOIN supplier ON s_suppkey = l_suppkey
GROUP BY 1
ORDER BY numwait DESC, s_name ASC
LIMIT 20
"""


# --- Batch 5 (round 6) — the last five TPC-H optimizer shapes the pack
# was missing: Q2 (correlated scalar MIN), Q11 (HAVING vs a global
# scalar), Q12 (conditional aggregation over a join), Q16 (NOT IN
# exclusion + multi-key COUNT DISTINCT), Q20 (nested IN with a
# correlated two-aggregate threshold). The testdata schema is trimmed
# (no partsupp / l_shipmode / comment columns), so each query re-bases
# the reference predicate onto lineitem's observed part-supplier
# relation while keeping the decorrelation shape intact; every oracle
# states the LITERAL correlated/nested form so the driver run is a
# decorrelation differential, exactly like Q4/Q17/Q21/Q22 above.

Q2_SIZE = 15
Q11_NATION = "NATION_3"
Q11_FRACTION = "0.001"  # decimal literal — exact on both engines
Q12_START, Q12_END = "1997-01-01", "1998-01-01"
Q16_BRAND = "Brand#45"
Q16_TYPE_PREFIX = "MEDIUM"
Q16_SIZES = [1, 4, 7, 10, 15, 22, 25, 49]
Q20_NATION = "NATION_1"
Q20_NAME_PREFIX = "small "
Q20_RECENT = "1999-01-01"


def q_min_cost_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated scalar MIN): for each size-15 part,
    the supplier(s) who charged the minimum price ever observed for
    that part. The correlated subquery ``l_extendedprice = (SELECT
    min(...) WHERE l2.l_partkey = p_partkey)`` decorrelates into ONE
    per-partkey MIN aggregate joined back on (partkey, price) — the
    lineitem fact is scanned once, restricted FIRST by a broadcast
    semi join on the filtered part dim (40 of 2000 parts survive
    ``p_size = 15``), so both the aggregate and the join-back run on
    the pruned slice. Supplier and nation attach via broadcast.

    Scale shape: no repeated subquery execution (the naive plan is
    one scan per outer row); the only exchange is the partkey
    aggregate over an already-filtered fact."""
    part = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_size") == Q2_SIZE)
        .select("p_partkey", "p_name")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    priced = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    min_price = priced.groupBy("p_partkey").agg(
        F.min("l_extendedprice").alias("min_price")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        priced.join(
            F.broadcast(min_price.withColumnRenamed("p_partkey", "mp_partkey")),
            (F.col("p_partkey") == F.col("mp_partkey"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .distinct()
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


ORACLE_MIN_COST = f"""
SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
FROM part, lineitem, supplier, nation
WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
  AND s_nationkey = n_nationkey AND p_size = {Q2_SIZE}
  AND l_extendedprice = (SELECT min(l2.l_extendedprice) FROM lineitem l2
                         WHERE l2.l_partkey = p_partkey)
ORDER BY s_acctbal DESC, s_name, p_partkey
LIMIT 100
"""


def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (group HAVING vs a global scalar aggregate):
    the parts that concentrate more than ``Q11_FRACTION`` of one
    nation's total traded value. The scalar subquery — the SAME
    filtered sum, ungrouped — decorrelates into a one-row aggregate
    broadcast into the HAVING filter: the nation-restricted slice is
    computed ONCE (suppliers of the nation found via two broadcast
    hops), reused by both the per-part aggregate and the global
    total, and only the one-row total crosses the plan.

    Sums run in DECIMAL(18,6) on both engines so the threshold
    comparison is exact — no float-associativity flake at the HAVING
    boundary."""
    nation = (
        load_table(spark, sf_dir, "nation")
        .where(F.col("n_name") == Q11_NATION)
        .select("n_nationkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    value = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).cast("decimal(18,6)")
    sliced = li.join(
        F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
    ).select(F.col("l_partkey"), value.alias("val"))
    per_part = sliced.groupBy("l_partkey").agg(F.sum("val").alias("part_value"))
    total = sliced.agg(
        (F.sum("val") * F.expr(f"CAST({Q11_FRACTION} AS DECIMAL(10,6))")).alias(
            "threshold"
        )
    )
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("part_value") > F.col("threshold"))
        .select(
            "l_partkey",
            F.round(F.col("part_value"), 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


ORACLE_IMPORTANT_PARTS = f"""
SELECT l_partkey,
       round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,6)), 2)::DOUBLE
         AS part_value
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = '{Q11_NATION}'
GROUP BY l_partkey
HAVING sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,6))
     > (SELECT sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,6))
               * {Q11_FRACTION}::DECIMAL(10,6)
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                      JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = '{Q11_NATION}')
ORDER BY part_value DESC, l_partkey
"""


def q_returnflag_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (conditional aggregation over a join): per
    return-flag class, how many 1997-shipped line items belong to
    high- vs low-priority orders. The CASE sums fold into ONE
    aggregate pass after the join — no per-priority re-scan. The
    trimmed schema has no l_shipmode, so l_returnflag stands in as
    the mode-like class column; the priority CASE is verbatim Q12.

    Scale shape: the date filter pushes to the lineitem scan
    (pruning ~6/7 of rows before the orderkey shuffle), orders is
    projected to two columns, and the final agg is 3-group bounded."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= Q12_START) & (F.col("l_shipdate") < Q12_END)
        )
        .select("l_orderkey", "l_returnflag")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_RETURNFLAG_PRIORITY = f"""
SELECT l_returnflag,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_START}'
  AND l_shipdate <  TIMESTAMP '{Q12_END}'
GROUP BY 1
ORDER BY 1
"""


def q_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (NOT IN exclusion + multi-key COUNT DISTINCT):
    how many distinct suppliers serve each surviving (brand, type,
    size) part family. The part-supplier relation is lineitem's
    observed distinct (l_partkey, l_suppkey) — the trimmed schema's
    stand-in for partsupp. ``NOT IN (complaint suppliers)`` becomes a
    LEFT ANTI join against the (tiny, broadcast) negative-balance
    supplier set; the IN-list size predicate and the <>/NOT LIKE
    predicates push to the part scan.

    Scale shape: the broadcast part/complaints joins narrow the fact
    BEFORE any exchange (the surviving part families keep ~1/8 of
    rows), and the COUNT DISTINCT runs as distinct-then-count over
    (brand, type, size, suppkey) quads — map-side partial distinct
    shrinks the one shuffle to the unique-quad set. Deduping the raw
    pair relation first (the tempting "shrink fan-out" order) shuffles
    the ENTIRE pair set instead: measured 570 MB shuffled + 855 MB
    spilled at sf10 vs zero spill this way — the filter must meet the
    fact before the exchange."""
    part = (
        load_table(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != Q16_BRAND)
            & (~F.col("p_type").startswith(Q16_TYPE_PREFIX))
            & (F.col("p_size").isin(Q16_SIZES))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    complaints = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    quads = (
        li.join(
            F.broadcast(complaints),
            li.l_suppkey == complaints.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return (
        quads.groupBy("p_brand", "p_type", "p_size")
        .agg(F.count("*").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


ORACLE_SUPPLIER_VARIETY = f"""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> '{Q16_BRAND}'
  AND p_type NOT LIKE '{Q16_TYPE_PREFIX}%'
  AND p_size IN ({", ".join(str(s) for s in Q16_SIZES)})
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q_recent_concentration_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (nested IN with a correlated two-aggregate
    threshold): suppliers in one nation who, for some 'small *' part,
    shipped MORE than half that part's lifetime quantity in the
    recent window — Q20's ``availqty > 0.5 * correlated shipped-qty``
    re-based onto two aggregates of the same fact at different date
    filters (the trimmed schema has no partsupp.availqty). The
    correlated pair decorrelates into ONE conditional-aggregation
    pass over (suppkey, partkey): ``sum(CASE recent)`` vs
    ``0.5 * sum(all)`` — a single scan where the naive plan re-scans
    per pair. The part-name IN pushes down via a broadcast semi join;
    the qualifying suppkey set then semi-joins the (broadcast-sized)
    nation-filtered supplier dim.

    Quantity sums run in DECIMAL(18,6) on both engines so the
    half-threshold comparison is exact."""
    small_parts = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").startswith(Q20_NAME_PREFIX))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    qty = F.col("l_quantity").cast("decimal(18,6)")
    recent_qty = F.when(F.col("l_shipdate") >= Q20_RECENT, qty).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    qualifying = (
        li.join(
            F.broadcast(small_parts), F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(recent_qty).alias("recent"),
            F.sum(qty).alias("lifetime"),
        )
        .where(
            F.col("recent")
            > F.col("lifetime") * F.expr("CAST(0.5 AS DECIMAL(10,6))")
        )
        .select("l_suppkey")
        .distinct()
    )
    nation = (
        load_table(spark, sf_dir, "nation")
        .where(F.col("n_name") == Q20_NATION)
        .select("n_nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        supp.join(qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


ORACLE_RECENT_CONCENTRATION = f"""
SELECT s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = '{Q20_NATION}'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part
                        WHERE p_name LIKE '{Q20_NAME_PREFIX}%')
    GROUP BY l_suppkey, l_partkey
    HAVING sum(CASE WHEN l_shipdate >= TIMESTAMP '{Q20_RECENT}'
                    THEN l_quantity::DECIMAL(18,6)
                    ELSE 0::DECIMAL(18,6) END)
         > sum(l_quantity::DECIMAL(18,6)) * 0.5::DECIMAL(10,6))
ORDER BY s_name
"""


Q5_REGION = "ASIA"
Q5_START, Q5_END = "1996-01-01", "1997-01-01"


def q_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (the 6-way join with a cross-dimension equality):
    revenue per nation from orders where the CUSTOMER and the line's
    SUPPLIER share that nation (``c_nationkey = s_nationkey`` — the
    condition that distinguishes Q5 from a plain rollup), restricted
    to one region and one order-date year.

    Scale shape: all four dimension hops (customer, supplier, nation,
    region) broadcast — the only shuffle is the lineitem⋈orders
    orderkey join, with the date filter pushed to the orders scan and
    the same-nation equality applied as a post-broadcast filter, not
    another exchange. Completes the full 22-query TPC-H shape
    coverage."""
    region = (
        load_table(spark, sf_dir, "region")
        .where(F.col("r_name") == Q5_REGION)
        .select("r_regionkey")
    )
    nation = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= Q5_START) & (F.col("o_orderdate") < Q5_END)
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,6)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


ORACLE_LOCAL_SUPPLIER = f"""
SELECT n_name,
       round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,6)), 2)::DOUBLE
         AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q5_START}'
  AND o_orderdate <  TIMESTAMP '{Q5_END}'
GROUP BY 1
ORDER BY revenue DESC, n_name
"""


def q_zorder_layout_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Z-order clustered-layout lifecycle under the oracle gate
    (sources/sinks.py::write_zordered): lineitem written clustered on
    (l_orderkey, l_partkey) via the Morton interleave key, read back,
    and range-filtered on BOTH clustered dimensions. The layout must
    be LOSSLESS (every row lands in exactly one file) — a dropped or
    duplicated row under the repartitionByRange+sort rewrite breaks
    equality with the oracle's direct filter. File-level pruning
    behavior itself is pinned by tests/test_sources_sinks.py (both
    dimensions' per-file ranges narrow vs a single-sort control);
    session-temp dir, dropped after materializing."""
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources.sinks import (
        read_back,
        write_zordered,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    with session_temp_layout(spark, "zo") as (tdir, materialize):
        path = os.path.join(tdir, "zo")
        write_zordered(li, path, ("l_orderkey", "l_partkey"), bits=10)
        back = read_back(spark, path).where(
            (F.col("l_orderkey") <= 1000) & (F.col("l_partkey") <= 300)
        )
        out = back.agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_qty"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")), 2
            )
            .cast("double")
            .alias("sum_price"),
        )
        return materialize(out)


ORACLE_ZORDER_LAYOUT = """
SELECT count(*) AS n_rows,
       round(sum(l_quantity::DECIMAL(18,6)), 2)::DOUBLE AS sum_qty,
       round(sum(l_extendedprice::DECIMAL(18,6)), 2)::DOUBLE AS sum_price
FROM lineitem
WHERE l_orderkey <= 1000 AND l_partkey <= 300
"""


def q_compacted_layout_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The small-file compaction lifecycle under the oracle gate
    (round 11; sources/compact.py::compact_files): a lineitem
    projection deliberately fragmented into small files, compacted
    with the narrow-coalesce rewrite (+ atomic two-rename swap), read
    back and rolled up per returnflag. The rewrite must be LOSSLESS —
    a dropped/duplicated row under the coalesce+swap breaks equality
    with the oracle's direct aggregation — and must actually compact
    (the in-query file-count check fails the entry closed if the
    rewrite didn't shrink the layout). The small-file count SCALES
    with the data (>= 4x the projected compaction target, floor 24):
    a fixed 24 would stop shrinking once the projection itself
    exceeded 24 x target_mb (~3 GB, around sf50) and fail the guard
    on healthy data — the fixed-small-count scale trap (review r11).
    Session-temp dir, dropped after materializing."""
    import os

    from optimal_parallel_fp_growth_spark.functions.caching import (
        session_temp_layout,
    )
    from optimal_parallel_fp_growth_spark.sources.compact import (
        compact_files,
    )
    from optimal_parallel_fp_growth_spark.sources.sinks import read_back

    target_mb = 128
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    # ~24 on-disk bytes/row for this 3-column projection -> projected
    # compaction target; fragment to >= 4x that so shrink is always
    # possible (and provable) at every scale factor
    est_mb = (li.count() * 24) // (1024 * 1024)
    n_small = max(24, 4 * -(-est_mb // target_mb))
    with session_temp_layout(spark, "cp") as (tdir, materialize):
        path = os.path.join(tdir, "li_small")
        li.repartition(n_small).write.parquet(path)
        stats = compact_files(spark, path, target_mb=target_mb)
        if stats["files_after"] >= stats["files_before"]:
            raise RuntimeError(f"compaction did not shrink: {stats}")
        out = (
            read_back(spark, path)
            .where(F.col("l_quantity") < 10)
            .groupBy("l_returnflag")
            .agg(
                F.count("*").alias("n_rows"),
                F.round(
                    F.sum(F.col("l_extendedprice").cast("decimal(18,6)")),
                    2,
                )
                .cast("double")
                .alias("sum_price"),
            )
            .orderBy("l_returnflag")
        )
        return materialize(out)


ORACLE_COMPACTED_LAYOUT = """
SELECT l_returnflag, count(*) AS n_rows,
       round(sum(l_extendedprice::DECIMAL(18,6)), 2)::DOUBLE AS sum_price
FROM lineitem
WHERE l_quantity < 10
GROUP BY 1 ORDER BY 1
"""


REL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "supplier_pagerank": q_supplier_pagerank,
    "supplier_pagerank_bucketed": q_supplier_pagerank_bucketed,
    "nation_trade_volume": q_nation_trade_volume,
    "product_line_revenue": q_product_line_revenue,
    "promo_revenue_share": q_promo_revenue_share,
    "brand_discount_revenue": q_brand_discount_revenue,
    "pricing_summary": q_pricing_summary,
    "customers_no_big_orders": q_customers_no_big_orders,
    "top_suppliers_per_nation": q_top_suppliers_per_nation,
    "order_priority_stats": q_order_priority_stats,
    "segment_part_overlap": q_segment_part_overlap,
    "shipping_priority": q_shipping_priority,
    "forecast_revenue": q_forecast_revenue,
    "returned_item_report": q_returned_item_report,
    "large_orders": q_large_orders,
    "nation_revenue_share": q_nation_revenue_share,
    "small_qty_revenue": q_small_qty_revenue,
    "customer_order_counts": q_customer_order_counts,
    "top_supplier": q_top_supplier,
    "idle_rich_customers": q_idle_rich_customers,
    "late_order_priorities": q_late_order_priorities,
    "sole_late_suppliers": q_sole_late_suppliers,
    "min_cost_part_supplier": q_min_cost_part_supplier,
    "important_parts": q_important_parts,
    "returnflag_priority_lines": q_returnflag_priority_lines,
    "supplier_variety": q_supplier_variety,
    "recent_concentration_suppliers": q_recent_concentration_suppliers,
    "local_supplier_revenue": q_local_supplier_revenue,
    "zorder_layout_read": q_zorder_layout_read,
    "compacted_layout_read": q_compacted_layout_read,
}

REL_ORACLES: dict[str, str] = {
    "supplier_pagerank": ORACLE_SUPPLIER_PAGERANK,
    "supplier_pagerank_bucketed": ORACLE_SUPPLIER_PAGERANK,
    "nation_trade_volume": ORACLE_TRADE_VOLUME,
    "product_line_revenue": ORACLE_PRODUCT_LINE,
    "promo_revenue_share": ORACLE_PROMO_REVENUE,
    "brand_discount_revenue": ORACLE_BRAND_DISCOUNT,
    "pricing_summary": ORACLE_PRICING,
    "customers_no_big_orders": ORACLE_NO_BIG,
    "top_suppliers_per_nation": ORACLE_TOP_SUPP,
    "order_priority_stats": ORACLE_PRIORITY,
    "segment_part_overlap": ORACLE_OVERLAP,
    "shipping_priority": ORACLE_SHIPPING_PRIORITY,
    "forecast_revenue": ORACLE_FORECAST_REVENUE,
    "returned_item_report": ORACLE_RETURNED_ITEMS,
    "large_orders": ORACLE_LARGE_ORDERS,
    "nation_revenue_share": ORACLE_NATION_SHARE,
    "small_qty_revenue": ORACLE_SMALL_QTY,
    "customer_order_counts": ORACLE_CUSTOMER_ORDER_COUNTS,
    "top_supplier": ORACLE_TOP_SUPPLIER,
    "idle_rich_customers": ORACLE_IDLE_RICH,
    "late_order_priorities": ORACLE_LATE_ORDER_PRIORITIES,
    "sole_late_suppliers": ORACLE_SOLE_LATE_SUPPLIERS,
    "min_cost_part_supplier": ORACLE_MIN_COST,
    "important_parts": ORACLE_IMPORTANT_PARTS,
    "returnflag_priority_lines": ORACLE_RETURNFLAG_PRIORITY,
    "supplier_variety": ORACLE_SUPPLIER_VARIETY,
    "recent_concentration_suppliers": ORACLE_RECENT_CONCENTRATION,
    "local_supplier_revenue": ORACLE_LOCAL_SUPPLIER,
    "zorder_layout_read": ORACLE_ZORDER_LAYOUT,
    "compacted_layout_read": ORACLE_COMPACTED_LAYOUT,
}
