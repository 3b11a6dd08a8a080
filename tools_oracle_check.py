#!/usr/bin/env python
"""Targeted DuckDB-oracle check for the named queries (r14).

Same normalization/compare as the verify skill recipe, restricted to
a query subset so a change set can be proven equivalent without a
full 207-query sweep.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
       python tools_oracle_check.py <query> [<query> ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from etl_npl_pipeline_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name in sys.argv[1:]:
        fn = queries[name]
        t0 = time.time()
        sdf = fn(spark, sf)
        srows = [tuple(r) for r in sdf.collect()]
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows={len(srows)} (rows-only) {dt:.1f}s",
                  flush=True)
            continue
        o = con.execute(oracles[name])
        ocols = [d[0] for d in o.description]
        orows = o.fetchall()
        scols = sdf.columns
        cs = sorted(
            tuple(_norm(r[i])
                  for i in sorted(range(len(scols)), key=lambda i: scols[i]))
            for r in srows
        )
        co = sorted(
            tuple(_norm(r[i])
                  for i in sorted(range(len(ocols)), key=lambda i: ocols[i]))
            for r in orows
        )
        ok = (sorted(scols) == sorted(ocols)) and cs == co
        print(f"{name}: rows={len(srows)} match={ok} {dt:.1f}s", flush=True)
        if not ok:
            failed.append(name)
    if failed:
        print("FAILED: " + ",".join(failed), flush=True)
        sys.exit(1)
    print("ALL_MATCH", flush=True)


if __name__ == "__main__":
    main()
