"""DuckDB-oracle comparison mirroring the driver's check:
row-count + schema (column names) + order-insensitive value hash
with columns sorted by name."""

from __future__ import annotations

import math

import duckdb
import pytest

from etl_npl_pipeline_spark.sources.tables import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # mixed-vintage directory table: union_by_name unifies
            # drifted part-file schemas the same way load_table's
            # canonical normalization does (widening promotion)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{p}/*.parquet', union_by_name=true)"
            )
        else:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{p}'"
            )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # kill -0.0 and float repr jitter
        return f"{v:.6f}"
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm_cell(r[i]) for i in order) for r in rows
    )


def assert_matches_oracle(spark_df, sql: str, sf_dir: str):
    con = duck_con(sf_dir)
    oracle = con.execute(sql)
    o_cols = [d[0] for d in oracle.description]
    o_rows = oracle.fetchall()
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(s_cols) == sorted(o_cols), (
        f"schema mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )
    sc, oc = _canon(s_rows, s_cols), _canon(o_rows, o_cols)
    if sc != oc:
        diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:5]
        pytest.fail(f"value mismatch, first diffs: {diffs}")
