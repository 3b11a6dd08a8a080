"""As-of (nearest-prior) join — an operator Spark's API lacks,
composed from a union + partitioned sort + forward-fill window.

Semantics (ASOF JOIN backward in DuckDB terms): for each left row,
attach the right row with the greatest timestamp <= the left
timestamp, within the same key.

Plan shape: tag both sides, union, one shuffle on the key, one
within-partition sort by (time, side-tag), window last(ignorenulls)
carries the most recent right payload forward onto left rows.
Cost: one shuffle + one sort — same as a single window op, with
state bounded per key; no range-explosion join. At 100 TB this
composition beats an interval join by orders of magnitude because
the candidate set never materializes.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: left rows pick up ``value_cols`` from
    the latest right row with right_time <= left_time per key.

    Ties on the timestamp: the right row sorts before the left row
    (side tag 0 < 1), so an exactly-equal timestamp IS matched —
    the same rule as DuckDB's ASOF JOIN (>=).
    """
    lt = left.withColumn("_t", F.col(left_time)).withColumn("_side", F.lit(1))
    rt = (
        right.select(
            F.col(on),
            F.col(right_time).alias("_t"),
            *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        )
        .withColumn("_side", F.lit(0))
    )
    val_aliases = [f"{c}{suffix}" for c in value_cols]
    lt_cols = [c for c in lt.columns]
    merged = lt.select(
        *[F.col(c) for c in left.columns], "_t", "_side",
        *[F.lit(None).cast(rt.schema[a].dataType).alias(a) for a in val_aliases],
    ).unionByName(
        rt.select(
            *[
                F.col(c) if c in (on, "_t", "_side", *val_aliases) else F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in [*left.columns, "_t", "_side", *val_aliases]
            ]
        )
    )
    w = (
        Window.partitionBy(on)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Carry the latest right ROW as a struct, not the bare values:
    # last(value, ignorenulls) would skip a right row whose value IS
    # NULL and match an older one — DuckDB's ASOF matches the
    # nearest-prior row regardless of its payload, and so must we.
    # The when() makes the struct NULL exactly on left rows, so
    # ignorenulls selects on row presence; field access then
    # null-propagates a null payload faithfully.
    rv = F.when(
        F.col("_side") == 0, F.struct(*[F.col(a) for a in val_aliases])
    )
    carried = F.last(rv, ignorenulls=True).over(w)
    filled = merged.select(
        *left.columns,
        "_side",
        *[carried.getField(a).alias(a) for a in val_aliases],
    )
    return filled.where(F.col("_side") == 1).drop("_side")
