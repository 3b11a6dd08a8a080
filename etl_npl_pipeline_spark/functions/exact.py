"""Exact (order-independent) aggregation helpers.

The driver's correctness gate hash-compares values against a DuckDB
oracle. Double-precision sums are order-dependent — Spark's
partition-parallel sums and DuckDB's sequential sums can differ in
the last bits, and ROUND() at a half boundary turns that into a
visible mismatch (observed: ROUND(AVG(o_totalprice),4) landing on
...78875).

Fix: aggregate money/rate columns as fixed-scale DECIMALs — decimal
addition is exact and associative, so any summation order gives the
same result — then cast to double at the end. Both engines produce
bit-identical doubles, and derived divisions (avg, ratios) done in
double on identical operands are IEEE-identical too.

Precisions are chosen so products stay exact (never hit Spark's
38-digit cap): money DECIMAL(12,2) × rate DECIMAL(4,2) × rate
→ scale 6, precision ≤ 22.

The matching DuckDB SQL pattern is
``CAST(SUM(CAST(x AS DECIMAL(12,2))) AS DOUBLE)`` etc.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

MONEY = "decimal(12,2)"
RATE = "decimal(4,2)"
QTY = "decimal(12,2)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def money(col: Column | str) -> Column:
    """Cast a 2-dp money double to exact decimal."""
    return _c(col).cast(MONEY)


def rate(col: Column | str) -> Column:
    """Cast a 2-dp rate/discount/tax double to exact decimal."""
    return _c(col).cast(RATE)


def dsum(expr: Column) -> Column:
    """Exact decimal sum, emitted as a (deterministic) double."""
    return F.sum(expr).cast("double")


def davg(expr: Column) -> Column:
    """Deterministic average: exact decimal sum cast to double,
    divided by the non-null count in double."""
    return F.sum(expr).cast("double") / F.count(expr)
