"""Final TPC-H analog coverage (SURVEY §2.3): min-cost supplier
selection, important-value parts, supplier-part counting, excess
shipment detection, and waiting-supplier attribution.

The synthetic schema has no partsupp table, no l_commitdate /
l_receiptdate, and no comment columns, so q2/q11/q16/q20/q21 are
adapted (same precedent as q9's modeled supply cost,
tpch_more.py:134): the observed lineitem (suppkey, partkey) pairs
act as the supplier catalog, unit price min() as supply cost, and
shipdate-vs-orderdate lag as delivery lateness.

Scale doctrine as elsewhere: dims broadcast, facts shuffle once on
their agg key, correlated subqueries become windows or grouped
self-aggregations, all money sums exact-decimal (functions/exact.py)
so the DuckDB hash-compare is bit-stable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from etl_npl_pipeline_spark.functions.exact import dsum, money
from etl_npl_pipeline_spark.sources.tables import load_table


# --- A27 (Q2): min-cost supplier per part --------------------------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each part of size 15, the EUROPE supplier(s) with the
    lowest observed unit price.

    The correlated ``cost = (SELECT MIN ...)`` subquery becomes a
    window min over partkey — one shuffle on the pre-aggregated
    (suppkey, partkey) catalog instead of a per-row probe. Unit
    price is computed as exact decimal (extendedprice and quantity
    are 2-dp) then compared in double; MIN is order-independent so
    the parallel fold matches DuckDB bit-for-bit.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    part = load_table(spark, sf_dir, "part").where(F.col("p_size") == 15)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")

    # try_divide: a zero-quantity line has no unit cost -> NULL
    # (min skips it). Spark 4 runs ANSI mode by default, so a plain
    # division would ABORT the query on the first such line; the
    # oracle mirrors with NULLIF(l_quantity, 0).
    unit = F.try_divide(
        money("l_extendedprice").cast("double"), F.col("l_quantity")
    )
    catalog = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(unit).alias("supplycost")
    )
    eu_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    j = catalog.join(
        F.broadcast(part), F.col("l_partkey") == part.p_partkey
    ).join(F.broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey"))
    w = Window.partitionBy("p_partkey")
    return (
        j.withColumn("min_cost", F.min("supplycost").over(w))
        .where(F.col("supplycost") == F.col("min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            F.round("supplycost", 6).alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = """
WITH catalog AS (
    SELECT l_partkey, l_suppkey,
           MIN(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE)
               / NULLIF(l_quantity, 0)) AS supplycost
    FROM lineitem GROUP BY 1, 2
), eu AS (
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
       ROUND(supplycost, 6) AS supplycost
FROM catalog
JOIN part ON l_partkey = p_partkey
JOIN eu ON l_suppkey = s_suppkey
WHERE p_size = 15
QUALIFY supplycost = MIN(supplycost) OVER (PARTITION BY p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# --- A28 (Q11): important part values ------------------------------

def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose shipped value from NATION_5 suppliers exceeds
    0.1% of that nation's total shipped value.

    The scalar ``(SELECT SUM(...) * fraction)`` subquery stays a
    scalar SUBQUERY (Catalyst folds the 1-row aggregate into the
    filter as a literal — no join node); both the per-part values and the
    threshold are exact decimal sums, and the > compare runs on the
    decimals directly (value*1000 > total), so no float threshold
    wobble at the boundary.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_5"
    )
    nat_supp = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey")
    shipped = li.join(F.broadcast(nat_supp), li.l_suppkey == F.col("s_suppkey"))
    per_part = shipped.groupBy("l_partkey").agg(
        F.sum(money("l_extendedprice")).alias("value_dec")
    )
    total = per_part.agg(F.sum("value_dec").alias("total_dec"))
    return (
        per_part.withColumn("total_dec", total.scalar())
        .where(F.col("value_dec") * 1000 > F.col("total_dec"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value_dec").cast("double").alias("value"),
        )
        .orderBy(F.desc("value"), "p_partkey")
    )


Q11_SQL = """
WITH per_part AS (
    SELECT l_partkey AS p_partkey,
           SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS value_dec
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_5'
    GROUP BY 1
)
SELECT p_partkey, CAST(value_dec AS DOUBLE) AS value
FROM per_part
WHERE value_dec * 1000 > (SELECT SUM(value_dec) FROM per_part)
ORDER BY value DESC, p_partkey
"""


# --- A29 (Q16): supplier count by part attributes ------------------

def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many distinct credible suppliers ship each (brand, type,
    size) combination — distinct supplier-part pairs from lineitem,
    excluding one brand, one type, and in-arrears suppliers
    (s_acctbal < 0 stands in for the comment-based complaint filter;
    schema has no s_comment).

    countDistinct after a broadcast-pruned pair scan: one shuffle on
    the grouping key; the anti-selective filters run map-side.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad_supp), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand != 'Brand#13' AND p_type != 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --- A30 (Q20): excess-shipment suppliers --------------------------

def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_1 suppliers that shipped more than half of some widget
    part's lifetime volume during 1996 (availqty-vs-halfyear demand
    reshaped to shipped-vs-lifetime; no partsupp table).

    The nested IN subqueries become one grouped aggregation with a
    conditional decimal sum and a left-semi join — the 2*s96 > total
    compare stays in decimal (exact), and the semi join keeps only
    supplier keys flowing into the final broadcast.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").contains("widget")
    ).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_1"
    )

    in_96 = (F.col("l_shipdate") >= F.lit("1996-01-01")) & (
        F.col("l_shipdate") < F.lit("1997-01-01")
    )
    zero = F.lit(0).cast("decimal(12,2)")
    pair = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in_96, money("l_quantity")).otherwise(zero)).alias("q96"),
            F.sum(money("l_quantity")).alias("qall"),
        )
        .where(F.col("q96") * 2 > F.col("qall"))
        .select("l_suppkey")
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(pair, supp.s_suppkey == pair.l_suppkey, "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


Q20_SQL = """
SELECT s_name, ROUND(s_acctbal, 2) AS s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_1'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE '%widget%'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                     AND l_shipdate < TIMESTAMP '1997-01-01'
               THEN CAST(l_quantity AS DECIMAL(12,2))
               ELSE CAST(0 AS DECIMAL(12,2)) END) * 2
           > SUM(CAST(l_quantity AS DECIMAL(12,2)))
  )
ORDER BY s_name
"""


# --- A31 (Q21): suppliers who kept orders waiting ------------------

def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_2 suppliers that were the SOLE late supplier on a
    finished multi-supplier order. Lateness = shipped more than 60
    days after the order date (schema has no receipt/commit dates).

    The EXISTS / NOT EXISTS pair collapses into one grouped
    aggregation per (orderkey, suppkey) + a per-order rollup joined
    back on orderkey — two shuffles total on the same key, no
    correlated probes; AQE can chain them without a third exchange.
    """
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_2"
    )

    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)
    per_pair = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late.cast("int")).alias("was_late"))
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("was_late").alias("n_late"),
    )
    waiting = (
        per_pair.where(F.col("was_late") == 1)
        .join(per_order.where((F.col("n_supp") > 1) & (F.col("n_late") == 1)),
              "l_orderkey")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    # Aggregate BY NAME after the supplier join (TPC-H q21 groups on
    # s_name, not suppkey): identical while names are unique, but on
    # data with duplicate supplier names the per-suppkey grouping
    # returns one row per key where the spec merges them (caught by
    # the sf1 replication check — replicas reuse names). The name
    # re-agg runs on the already-tiny waiting set, so the plan keeps
    # its two big shuffles.
    return (
        waiting.join(F.broadcast(
            supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        ), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("numwait").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


Q21_SQL = """
WITH per_pair AS (
    SELECT l_orderkey, l_suppkey,
           MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
               THEN 1 ELSE 0 END) AS was_late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY 1, 2
), per_order AS (
    SELECT l_orderkey, COUNT(*) AS n_supp, SUM(was_late) AS n_late
    FROM per_pair GROUP BY 1
)
SELECT s_name, COUNT(*) AS numwait
FROM per_pair
JOIN per_order USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE was_late = 1 AND n_supp > 1 AND n_late = 1 AND n_name = 'NATION_2'
GROUP BY 1
ORDER BY numwait DESC, s_name
LIMIT 100
"""


# --- A41: relational set operators ---------------------------------

def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in both 1995 and 1996 but not in 1997 —
    INTERSECT / EXCEPT as hash-based set operators (each is one
    shuffle on the key, no join-condition bookkeeping). Summarized
    to count + key range so the result stays small at any SF."""
    orders = load_table(spark, sf_dir, "orders")

    def active(year):
        return orders.where(F.year("o_orderdate") == year).select("o_custkey")

    keys = active(1995).intersect(active(1996)).exceptAll(
        active(1997).distinct()
    )
    return keys.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("o_custkey").alias("min_key"),
        F.max("o_custkey").alias("max_key"),
    )


Q_SET_OPS_SQL = """
WITH keys AS (
    SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996
    EXCEPT
    SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1997
)
SELECT COUNT(*) AS n_customers, MIN(o_custkey) AS min_key,
       MAX(o_custkey) AS max_key
FROM keys
"""
