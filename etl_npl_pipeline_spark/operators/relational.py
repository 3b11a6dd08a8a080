"""Relational operators — reference parity for the merge/groupby/
segmentation stages (src/ETL-NPL-Pipeline.py:184-189, 353, 441,
706-728).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def agg_by_quarter(
    df: DataFrame,
    quarter_col: str,
    value_cols: Sequence[str],
    agg: str = "avg",
    exact_scale: int | None = 2,
) -> DataFrame:
    """Per-quarter aggregate of ``value_cols`` (ref: the
    ``groupby('Quarter').mean()`` in inflation/MRR transforms,
    src:353, src:441). Map-side partial agg makes the shuffle
    |quarters| wide regardless of input size.

    With ``exact_scale`` set (default), sum/avg run over fixed-scale
    decimals so results are summation-order independent — required
    for bit-exact oracle comparison — and are emitted as doubles.
    """
    exprs = []
    for c in value_cols:
        if exact_scale is not None and agg in ("avg", "sum", "mean"):
            dec = F.col(c).cast(f"decimal(18,{exact_scale})")
            e = F.sum(dec).cast("double")
            if agg in ("avg", "mean"):
                e = e / F.count(F.col(c))
        else:
            e = getattr(F, agg)(c)
        exprs.append(e.alias(c))
    return df.groupBy(quarter_col).agg(*exprs)


def merge_chain(
    dfs: Sequence[DataFrame],
    on: str | Sequence[str],
    how: str = "outer",
    broadcast_tail: bool = False,
) -> DataFrame:
    """Chained equi-joins on a shared key (ref: the common_df /
    segment assembly chains, src:706-728).

    All joins share the same key, so Catalyst reuses one hash
    partitioning across the chain — the data shuffles once, not
    once per join. With ``broadcast_tail`` the non-first frames are
    broadcast (right for small macro/lookup tables joined onto a
    big fact spine).
    """
    if not dfs:
        raise ValueError("merge_chain needs at least one DataFrame")

    def join2(left: DataFrame, right: DataFrame) -> DataFrame:
        r = F.broadcast(right) if broadcast_tail else right
        return left.join(r, on=on, how=how)

    return reduce(join2, dfs)


def segment(
    df: DataFrame,
    col: str,
    categories: Sequence[str],
    contains: bool = True,
) -> dict[str, DataFrame]:
    """Split a frame into per-category views (ref: the
    Housing/Automobile/Credit Card dict split, src:184-189).

    Returns filtered *plans*, not materialized frames: each view is
    a predicate over the same scan, so writing all segments is one
    pass with partitioned output, never N full scans — unless the
    consumer forces them separately, which is its choice.
    """
    out: dict[str, DataFrame] = {}
    for cat in categories:
        pred = F.col(col).contains(cat) if contains else (F.col(col) == cat)
        out[cat] = df.where(pred)
    return out
