"""Scalar column functions — reference parity for the cleaning /
normalization helpers in src/ETL-NPL-Pipeline.py.

All are pure Catalyst expressions (regexp / arithmetic / date
builtins), so they run JVM-side inside whole-stage codegen. None of
these ever need a Python UDF — at 100 TB a row-at-a-time UDF on the
cleaning path would dominate the runtime.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def reformat_quarter(col: Column | str) -> Column:
    """``Qx/YYYY`` → ``YYYY-Qx`` (ref: reformat_quarter, src:63).

    Strings without a ``/`` pass through unchanged, matching the
    reference's isinstance/contains guard.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.rlike(r"^Q\d/\d{4}$"),
        F.concat_ws("-", F.split(c, "/").getItem(1), F.split(c, "/").getItem(0)),
    ).otherwise(c)


def quarter_of(col: Column | str) -> Column:
    """date/timestamp → ``YYYY-Qn`` string (ref: ``dt.to_period('Q')``
    + ``str.replace('Q', '-Q')``, src:350, src:438)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat_ws("-", F.year(c).cast("string"), F.concat(F.lit("Q"), F.quarter(c).cast("string")))


def strip_revision_suffix(col: Column | str) -> Column:
    """Remove trailing revision markers ``r1|p1|r|p`` plus leading
    whitespace, then trim (ref: src:134 ``\\s*[pr]$`` and src:385
    ``\\s*(r1|p1|r|p)$``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r"\s*(r1|p1|r|p)$", ""))


def parse_number(col: Column | str) -> Column:
    """Comma-grouped numeric string → double (ref: src:173
    ``str.replace(',', '').astype(int)``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, ",", "").cast("double")


def pct_to_ratio(col: Column | str) -> Column:
    """Percent points → ratio, e.g. 2.34 → 0.0234 (ref: src:169)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("double") / F.lit(100.0)


def shock_flag(
    quarter_col: Column | str,
    start: str = "2020-Q3",
    end: str = "2023-Q4",
) -> Column:
    """Binary macro-shock dummy over an inclusive quarter range
    (ref: Macro Shock Index, src:564-586 — 1 for Q3/2020-2023).

    ``YYYY-Qn`` strings sort lexicographically in chronological
    order, so a string ``between`` is exact and stays codegen'd.
    """
    c = F.col(quarter_col) if isinstance(quarter_col, str) else quarter_col
    return c.between(start, end).cast("int")
