"""Driver-built report relations, Arrow-backed.

``spark.createDataFrame(list_of_rows, schema)`` parallelizes the
rows into ``defaultParallelism`` slices — a 6-row report frame
becomes a 32-partition RDD on local[32], and its ``orderBy`` then
pays a 3-stage range shuffle with ~97 sampling/shuffle/write tasks
(measured 0.75–0.95 s per report at sf0.1; the same frame routed
through pandas/Arrow runs 0.22–0.34 s with one partition per few
rows). Every model-artifact report a query returns (probe weights,
k-means centroids, drift rows) pays this once per run, so the
builder below is the default for non-empty driver-side relations.

Null semantics are preserved: rows go into an OBJECT-dtype pandas
frame, so ``None`` stays a SQL NULL through Arrow (a float64 pandas
column would silently fold None into NaN, which is a different
value in both engines) and ``float('nan')``/``inf`` stay NaN/inf.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession


def small_report_df(
    spark: SparkSession, rows: Iterable[tuple], schema: str
) -> DataFrame:
    import math

    import pandas as pd

    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    # pandas→Arrow folds float NaN into null (missing) even in an
    # object column, while the row path keeps NaN a NaN — for the
    # rare report carrying a NaN cell (zero-variance drift_z), take
    # the slow row path so the value survives
    if any(
        isinstance(v, float) and math.isnan(v) for r in rows for v in r
    ):
        return spark.createDataFrame(rows, schema)
    # resolve the DDL string once to name the pandas columns; the
    # empty-frame construction is plan-only (no job)
    st = spark.createDataFrame([], schema).schema
    pdf = pd.DataFrame(rows, columns=[f.name for f in st.fields],
                       dtype=object)
    return spark.createDataFrame(pdf, st)
