"""T24 scd2_pit_join semantics beyond oracle parity: the join is
genuinely point-in-time (orders before the change date resolve to
the ORIGINAL segment, not the current one) and partitions the fact
exactly once."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_npl_pipeline_spark.plans import lakehouse
from etl_npl_pipeline_spark.sources.tables import load_table


def test_pit_partitions_fact_exactly_once(spark, sf_dir):
    out = lakehouse.scd2_pit_join(spark, sf_dir)
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert out.agg(F.sum("n_orders")).collect()[0][0] == n_orders


def test_pit_differs_from_current_version_join(spark, sf_dir):
    """Non-vacuous PIT: custkey%4==0 orders dated BEFORE 1998-01-01
    must land in the customer's original segment, so the RELOCATED
    bucket holds strictly fewer orders than a naive current-version
    join would give it."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    moved = (
        orders.join(
            cust.where(F.col("c_custkey") % 4 == 0),
            orders.o_custkey == cust.c_custkey,
        )
    )
    n_current = moved.count()  # naive: every order of a moved key
    n_pre_change = moved.where(
        F.date_format("o_orderdate", "yyyy-MM-dd") < "1998-01-01"
    ).count()
    assert n_pre_change > 0, "fixture has no pre-change orders"
    out = lakehouse.scd2_pit_join(spark, sf_dir)
    n_relocated = (
        out.where(F.col("segment") == "RELOCATED")
        .agg(F.coalesce(F.sum("n_orders"), F.lit(0)))
        .collect()[0][0]
    )
    assert n_relocated == n_current - n_pre_change
