"""Custom Python Data Source (Spark 4 DataSource API): the REST
observations feed fetched executor-side, one InputPartition per
calendar month — the distributed twin of sources.rest's driver loop.
"""

from __future__ import annotations

from datetime import date, timedelta

import pyspark.sql.functions as F

from etl_npl_pipeline_spark.sources.pyds import (
    RestObservationsDataSource,
    _synthetic_value,
)


def _read(spark, start: str, end: str):
    spark.dataSource.register(RestObservationsDataSource)
    return (
        spark.read.format("rest_observations")
        .option("series_code", "NPL")
        .option("start", start)
        .option("end", end)
        .load()
    )


def test_partitions_per_month_and_row_count(spark):
    df = _read(spark, "2024-01-01", "2024-03-31")
    # one partition per calendar month → parallel fetch
    assert df.rdd.getNumPartitions() == 3
    # Jan 31 + Feb 29 (2024 is a leap year) + Mar 31
    assert df.count() == 31 + 29 + 31


def test_values_deterministic_and_match_driver_recompute(spark):
    df = _read(spark, "2024-02-01", "2024-02-29")
    got = {r.period: r.value for r in df.collect()}
    cur = date(2024, 2, 1)
    while cur <= date(2024, 2, 29):
        p = cur.isoformat()
        assert got[p] == _synthetic_value("NPL", p)
        cur += timedelta(days=1)


def test_downstream_aggregation_distributes(spark):
    df = _read(spark, "2024-01-01", "2024-06-30")
    agg = (
        df.withColumn("month", F.substring("period", 1, 7))
        .groupBy("month")
        .agg(F.count(F.lit(1)).alias("n_days"))
        .orderBy("month")
    )
    rows = agg.collect()
    assert [r.month for r in rows] == [
        "2024-01", "2024-02", "2024-03", "2024-04", "2024-05", "2024-06"
    ]
    assert [r.n_days for r in rows] == [31, 29, 31, 30, 31, 30]
