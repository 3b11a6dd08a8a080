"""Analytics bench workload — TPC-H-shaped queries over the
synthetic star schema (region nation customer supplier part orders
lineitem).

Design for scale, per query:
- Fact tables (lineitem, orders) are only ever scanned with the
  columns the query needs — Catalyst prunes because every plan is
  declarative (check ``ReadSchema`` in explain output).
- Dimension tables (region, nation, supplier, part, customer at
  bench SF) join via broadcast — no shuffle of the fact side on a
  dim key. ``F.broadcast`` marks them explicitly so the plan
  survives even with stats off.
- Aggregations are single-shuffle: partial (map-side) aggregation
  is automatic for all the sums/counts used here.
- Money aggregates use exact decimal sums (functions/exact.py) so
  results are bit-identical to the DuckDB oracle regardless of
  partition-level summation order.

Date predicates target the synthetic data's 1995-2001 span (not
classic TPC-H dates). Every aggregate column is aliased to match
the oracle SQL exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_npl_pipeline_spark.functions.exact import davg, dsum, money, rate
from etl_npl_pipeline_spark.sources.tables import load_table


def _disc_price() -> F.Column:
    """Exact decimal l_extendedprice * (1 - l_discount)."""
    one = F.lit(1).cast("decimal(4,2)")
    return money("l_extendedprice") * (one - rate("l_discount"))


def _charge() -> F.Column:
    """Exact decimal extendedprice * (1-discount) * (1+tax)."""
    one = F.lit(1).cast("decimal(4,2)")
    return (
        money("l_extendedprice")
        * (one - rate("l_discount"))
        * (one + rate("l_tax"))
    )


# DuckDB-side equivalents of the exact-decimal expressions.
_SQL_DISC = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)
_SQL_CHARGE = (
    f"{_SQL_DISC} * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))"
)


# --- Q1: pricing summary (scan + filter + groupBy agg) -------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: one pass over lineitem, 4-key group.

    At 100 TB this is the canonical map-side-combine agg: the
    filter pushes into the parquet scan, partial aggs shrink the
    shuffle to |groups| x partitions rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(money("l_quantity")).alias("sum_qty"),
            dsum(money("l_extendedprice")).alias("sum_base_price"),
            dsum(_disc_price()).alias("sum_disc_price"),
            dsum(_charge()).alias("sum_charge"),
            davg(money("l_quantity")).alias("avg_qty"),
            davg(money("l_extendedprice")).alias("avg_price"),
            davg(rate("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM({_SQL_DISC}) AS DOUBLE) AS sum_disc_price,
       CAST(SUM({_SQL_CHARGE}) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- Q3: shipping priority (join + agg + top-k) --------------------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem, revenue top-10.

    customer filtered on segment broadcasts; orders⋈lineitem is the
    one real shuffle (on orderkey). The top-k is a global sort of
    an already-aggregated (small) frame — fine at any scale.
    """
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_disc_price()).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM({_SQL_DISC}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


# --- Q5: local supplier volume (multi-way join) --------------------

def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-table join; all dims broadcast, lineitem shuffles once.

    The region→nation→(customer,supplier) chain collapses into
    broadcast hash joins, so the fact scan streams through a single
    stage until the orderkey shuffle.
    """
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")

    nations_in_region = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")

    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(
            F.broadcast(nations_in_region),
            supp.s_nationkey == nations_in_region.n_nationkey,
        )
        .groupBy("n_name")
        .agg(dsum(_disc_price()).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = f"""
SELECT n_name,
       CAST(SUM({_SQL_DISC}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# --- Q6: forecast revenue (selective filter + global agg) ----------

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan-side query: every predicate pushes into parquet;
    the 'shuffle' is a single-row exchange for the global sum."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(money("l_extendedprice") * rate("l_discount")).alias("revenue")
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --- Q10: returned items (join + agg + top-k) ----------------------

def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_disc_price()).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name,
       -- canonical money is DOUBLE regardless of the file's physical
       -- type (decimal-physical vintages; schema-drift build)
       CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name,
       CAST(SUM({_SQL_DISC}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- Q18: large orders (agg-filtered semi join) --------------------

def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Find orders whose total quantity exceeds a threshold.

    The inner agg produces a small key set → broadcast join back
    against orders instead of a shuffled IN-subquery.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    big_orders = (
        li.groupBy("l_orderkey")
        .agg(dsum(money("l_quantity")).alias("total_qty"))
        .where(F.col("total_qty") > 150)
        .select("l_orderkey", "total_qty")
    )
    return (
        orders.join(
            F.broadcast(big_orders), orders.o_orderkey == big_orders.l_orderkey
        )
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice, total_qty
FROM orders
JOIN (
    SELECT l_orderkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 150
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""
