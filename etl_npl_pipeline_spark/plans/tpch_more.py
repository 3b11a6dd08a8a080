"""Further analytics coverage (SURVEY §2.3 A20-A26): nation-pair
volume, market share, profit attribution, outer-join distributions,
revenue views, correlated-aggregate filters, anti-join aggregates.

Shapes adapted from TPC-H q7/q8/q9/q13/q15/q17/q22 to the synthetic
schema (which has no partsupp table; supply cost is modeled off
p_retailprice). Same doctrine: broadcast dims, exact decimal sums,
one shuffle per agg.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from etl_npl_pipeline_spark.functions.exact import dsum, money, rate
from etl_npl_pipeline_spark.plans.tpch import _SQL_DISC, _disc_price
from etl_npl_pipeline_spark.sources.tables import load_table


# --- A20 (Q7): volume between two nations --------------------------

def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping volume between two nations per year, both
    directions — two broadcast dim joins with a disjunctive
    nation-pair predicate."""
    n1, n2 = "NATION_1", "NATION_2"
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem")

    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_key"))
        .where(
            ((F.col("cust_nation") == n1) & (F.col("supp_nation") == n2))
            | ((F.col("cust_nation") == n2) & (F.col("supp_nation") == n1))
        )
    )
    return (
        j.groupBy(
            "cust_nation", "supp_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(dsum(_disc_price()).alias("revenue"))
        .orderBy("cust_nation", "supp_nation", "l_year")
    )


Q7_SQL = f"""
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       YEAR(l_shipdate) AS l_year,
       CAST(SUM({_SQL_DISC}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE (cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_2')
   OR (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_1')
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# --- A21 (Q8): market share ----------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of one supplier-nation's revenue in a region's market
    per year: conditional decimal sum over total decimal sum."""
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    cust_in_region = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_in_region), orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_key"))
    )
    zero = F.lit(0).cast("decimal(18,6)")
    target = F.when(F.col("supp_nation") == "NATION_3", _disc_price()).otherwise(zero)
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(target).cast("double") / F.sum(_disc_price()).cast("double")).alias(
                "mkt_share"
            )
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
SELECT YEAR(o_orderdate) AS o_year,
       CAST(SUM(CASE WHEN sn.n_name = 'NATION_3' THEN {_SQL_DISC}
                     ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
       / CAST(SUM({_SQL_DISC}) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE r_name = 'EUROPE'
GROUP BY 1 ORDER BY 1
"""


# --- A22 (Q9): profit attribution ----------------------------------

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit by supplier nation and year; supply cost modeled as
    60% of p_retailprice (no partsupp table in this schema)."""
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").contains("widget")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")

    cost = (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.lit(0.60).cast("decimal(4,2)")
        * money("l_quantity")
    )
    profit = _disc_price().cast("decimal(26,6)") - cost.cast("decimal(26,6)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = f"""
SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
       CAST(SUM(CAST({_SQL_DISC} AS DECIMAL(26,6))
                - CAST(CAST(p_retailprice AS DECIMAL(12,2))
                       * CAST(0.60 AS DECIMAL(4,2))
                       * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(26,6)))
            AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2 ORDER BY nation, o_year DESC
"""


# --- A23 (Q13): order-count distribution (left outer) --------------

def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customers x order counts histogram — LEFT OUTER join so
    zero-order customers count, then a distribution over the agg."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
                     AND o_orderpriority != '1-URGENT'
    GROUP BY c_custkey
)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


# --- A24 (Q15): top supplier via revenue view ----------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers achieving the maximum quarterly revenue — a window
    max over an aggregated view instead of a correlated subquery."""
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_disc_price()).alias("total_revenue")
    )
    w = Window.orderBy(F.desc("total_revenue"))
    top = rev.withColumn("mx", F.max("total_revenue").over(Window.partitionBy()))
    return (
        top.where(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           CAST(SUM({_SQL_DISC}) AS DOUBLE) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# --- A25 (Q17): correlated small-quantity filter -------------------

def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from lineitems below 50% of their part's average
    quantity — the correlated avg becomes a window over partkey
    (one shuffle, no per-row subquery)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#13")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    w = Window.partitionBy("p_partkey")
    avg_qty = F.sum(money("l_quantity")).over(w).cast("double") / F.count(
        "l_quantity"
    ).over(w)
    return (
        j.withColumn("avg_qty", avg_qty)
        .where(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg(
            (dsum(money("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q17_SQL = """
WITH j AS (
    SELECT p_partkey, l_quantity, l_extendedprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (PARTITION BY p_partkey) AS DOUBLE)
               / COUNT(l_quantity) OVER (PARTITION BY p_partkey) AS avg_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#13'
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_items
FROM j WHERE l_quantity < 0.5 * avg_qty
"""


# --- A26 (Q22): anti-join on inactive customers --------------------

def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Well-funded customers with NO orders (anti join), grouped by
    a derived key — plus the avg-balance filter as a scalar
    SUBQUERY (folded to a literal by Catalyst, no join node)."""
    cust = load_table(spark, sf_dir, "customer")
    # restrict to early orders so the anti-join is selective (every
    # customer has SOME order in this synthetic data)
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1996-01-01")
    ).select("o_custkey")
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        (F.sum(money("c_acctbal")).cast("double") / F.count("c_acctbal")).alias("ab")
    )
    rich = cust.withColumn("ab", avg_bal.scalar()).where(
        F.col("c_acctbal") > F.col("ab")
    )
    inactive = rich.join(
        orders, rich.c_custkey == orders.o_custkey, "left_anti"
    )
    return (
        inactive.groupBy((F.col("c_custkey") % 7).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(money("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


Q22_SQL = """
WITH ab AS (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
               / COUNT(c_acctbal) AS v
    FROM customer WHERE c_acctbal > 0
)
SELECT c_custkey % 7 AS cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer, ab
WHERE c_acctbal > ab.v
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate < TIMESTAMP '1996-01-01')
GROUP BY 1 ORDER BY 1
"""
