"""Additional analytics coverage: semi/anti joins, conditional
aggregation, rollup hierarchies, per-group top-n windows — the
query shapes an analytics engine must handle beyond plain
join+agg (SURVEY §2.3 A9-A13).

Same scale doctrine as plans/tpch.py: broadcast dims, exact decimal
aggregates, filters that reach the scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from etl_npl_pipeline_spark.functions.exact import dsum, money, rate
from etl_npl_pipeline_spark.plans.tpch import _SQL_DISC, _disc_price
from etl_npl_pipeline_spark.sources.tables import load_table


# --- A9 (Q4 shape): order priority with EXISTS semi-join -----------

def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders having at least one late lineitem — a left-semi join
    (EXISTS): no fact-side duplication, the join only probes."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    late = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
  )
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --- A10 (Q12 shape): conditional aggregation ----------------------

def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counts split by a CASE predicate inside the aggregate —
    one pass, no separate filtered scans."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus ORDER BY l_linestatus
"""


# --- A11 (Q14 shape): ratio of conditional to total revenue --------

def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo revenue share: two exact decimal sums in one pass, the
    ratio taken in double at the end (deterministic)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    promo = F.col("p_type") == F.lit("PROMO")
    zero = F.lit(0).cast("decimal(18,6)")
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(F.when(promo, _disc_price()).otherwise(zero)).cast("double")
            / F.sum(_disc_price()).cast("double")
        ).alias("promo_revenue_pct")
    )


Q14_SQL = f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_SQL_DISC}
                             ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM({_SQL_DISC}) AS DOUBLE) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
"""


# --- A12 (Q19 shape): disjunctive predicates on a join -------------

def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs predicate across joined tables — tests predicate
    normalization; the join keys still drive a broadcast probe."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#11") & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#22") & (F.col("l_quantity") >= 20))
        | ((F.col("p_size") >= 40) & (F.col("l_quantity") < 5))
    )
    return j.where(cond).agg(
        dsum(_disc_price()).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q19_SQL = f"""
SELECT CAST(SUM({_SQL_DISC}) AS DOUBLE) AS revenue, COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND l_quantity >= 10)
   OR (p_brand = 'Brand#22' AND l_quantity >= 20)
   OR (p_size >= 40 AND l_quantity < 5)
"""


# --- A13: rollup hierarchy -----------------------------------------

def q_rollup_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region → nation rollup of customer balances: hierarchical
    subtotals in one aggregation (GROUPING SETS under the hood),
    not one query per level."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    base = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        base.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            dsum(money("c_acctbal")).alias("balance"),
        )
        .orderBy(
            F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first()
        )
    )


Q_ROLLUP_SQL = """
SELECT r_name, n_name, COUNT(*) AS n_cust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS balance
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
"""


# --- A13b: cube ----------------------------------------------------

def q_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping-set combinations
    in one aggregation pass."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(money("o_totalprice")).alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


Q_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


# --- A14: per-group top-n window -----------------------------------

def q_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 revenue parts per brand: rank window over an
    aggregated frame — the agg shrinks data before the window
    shuffle, so the sort is per-brand-tiny at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_partkey", "p_name")
        .agg(dsum(_disc_price()).alias("revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("revenue"), "p_partkey")
    return (
        rev.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("p_brand", "rk", "p_partkey", "p_name", "revenue")
        .orderBy("p_brand", "rk")
    )


Q_TOP_PARTS_SQL = f"""
WITH rev AS (
    SELECT p_brand, p_partkey, p_name,
           CAST(SUM({_SQL_DISC}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand, p_partkey, p_name
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY p_brand ORDER BY revenue DESC, p_partkey
    ) AS rk FROM rev
)
SELECT p_brand, rk, p_partkey, p_name, revenue
FROM ranked WHERE rk <= 3 ORDER BY p_brand, rk
"""
