"""Reshape operators — Spark-first equivalents of the reference's
pandas ``stack`` / ``pivot`` / ``ffill`` (src/ETL-NPL-Pipeline.py:131,
160-163).

Scale notes:
- ``melt`` uses the SQL ``stack()`` generator: a narrow map-side
  transform, zero shuffle, output is |rows| x |value_vars|.
- ``pivot_wide`` requires the pivot key values up front — passing
  them explicitly avoids Spark's extra distinct-collect pass over
  the data (an O(data) driver round-trip at 100 TB).
- ``ffill`` is a window ``last(ignorenulls)``: one shuffle on the
  partition key; within-partition order comes from the sort, not a
  global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def melt(
    df: DataFrame,
    id_vars: Sequence[str],
    value_vars: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide → long (pandas ``stack`` parity, ref src:160).

    Implemented with the ``stack()`` table-generating expression so
    it stays inside codegen — no explode of an intermediate map, no
    shuffle.
    """
    pairs = ", ".join(f"'{v}', `{v}`" for v in value_vars)
    expr = f"stack({len(value_vars)}, {pairs}) as (`{var_name}`, `{value_name}`)"
    return df.select(*[F.col(c) for c in id_vars], F.expr(expr))


def pivot_wide(
    df: DataFrame,
    index: Sequence[str],
    key: str,
    value: str,
    values: Sequence[str] | None = None,
    agg: str = "first",
) -> DataFrame:
    """Long → wide (pandas ``pivot`` parity, ref src:163).

    ``values`` should be supplied whenever known: it skips the
    eager distinct() job Spark otherwise runs to discover pivot
    columns — a full extra pass over the fact table at scale.
    """
    aggfn = getattr(F, agg)
    grouped = df.groupBy(*index)
    piv = grouped.pivot(key, list(values)) if values else grouped.pivot(key)
    return piv.agg(aggfn(value))


def ffill(
    df: DataFrame,
    cols: Sequence[str],
    order_by: str,
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """Forward-fill nulls in ``cols`` along ``order_by`` within each
    partition (pandas ``ffill`` parity, ref src:131).

    Window ``last(ignorenulls=True)`` over rows unbounded-preceding
    → current. Partitioning bounds the state: never ffill across an
    unpartitioned 100 TB frame — that is a single-task sort.
    """
    w = Window.orderBy(order_by).rowsBetween(Window.unboundedPreceding, 0)
    if partition_by:
        w = (
            Window.partitionBy(*partition_by)
            .orderBy(order_by)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out
