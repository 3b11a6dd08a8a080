"""Z-order (Morton) interleaved sort keys — multi-column data
skipping for lakehouse layouts.

Sorting files by the bit-interleave of two key hashes clusters rows
so that parquet min/max file statistics prune scans filtered on
EITHER column (a plain sort on (a, b) only prunes on the leading
column) — the same layout trick Delta's OPTIMIZE ZORDER BY applies.
The key derives from md5 prefixes, so it is deterministic across
engines, retries, and partitionings (the repo-wide never-rand()
doctrine) and needs no statistics collection pass.

Everything here is a pure column expression: codegen JVM arithmetic,
no UDF, no shuffle of its own — the sort that consumes the key pays
the (range-partitioned, distributed) exchange.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def hash16(col: Column | str) -> Column:
    """First 16 bits of md5(col) as a long — a cheap, engine-stable
    dimension hash (conv from the leading 4 hex chars). NULL
    coalesces to '' first: a layout key must be TOTAL — a null
    dimension gets the ''-slot deterministically instead of a null
    zkey, whose sort position differs between engines (Spark NULLS
    FIRST vs DuckDB NULLS LAST) and which parquet min/max stats
    can't prune on."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(
        F.substring(F.md5(F.coalesce(c, F.lit(""))), 1, 4), 16, 10
    ).cast("long")


def morton_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Bit-interleave two ``bits``-wide longs: bit i of ``a`` lands
    at position 2i, bit i of ``b`` at 2i+1. Unrolled into 2*bits
    shift/mask/or terms — all whole-stage-codegen arithmetic."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z
