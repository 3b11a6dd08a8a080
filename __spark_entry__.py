"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` maps every implemented SURVEY.md §2 operator to a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the
DuckDB-equivalent ANSI SQL for each (omitted → rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_npl_pipeline_spark.plans import tpch

QueryFn = Callable[[SparkSession, str], DataFrame]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return tpch.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, QueryFn]:
    return {
        "q1_pricing_summary": tpch.q1_pricing_summary,
        "q3_shipping_priority": tpch.q3_shipping_priority,
        "q5_local_supplier": tpch.q5_local_supplier,
        "q6_forecast_revenue": tpch.q6_forecast_revenue,
        "q10_returned_items": tpch.q10_returned_items,
        "q18_large_orders": tpch.q18_large_orders,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": tpch.Q1_SQL,
        "q3_shipping_priority": tpch.Q3_SQL,
        "q5_local_supplier": tpch.Q5_SQL,
        "q6_forecast_revenue": tpch.Q6_SQL,
        "q10_returned_items": tpch.Q10_SQL,
        "q18_large_orders": tpch.Q18_SQL,
    }
