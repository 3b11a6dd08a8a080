"""Oracle parity under EDGE values: empty-string and
whitespace-only texts (distinct from nulls), single-char docs,
negative and zero event values, zero/negated order totals, and
zero quantities/discounts in lineitem.

The r6 sweep caught three: Spark 4 runs ANSI mode by default, so a
plain division ABORTS the whole query on the first zero divisor —
q2's unit cost (extendedprice/quantity) and both jaccard folds
(union 0 for shingle-less pairs) now use try_divide with oracle
NULLIF mirrors; and mm_decode_jpeg's builder floors empty text to
one pixel byte, which the oracle now mirrors.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.oracle import assert_matches_oracle

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()

SENSITIVE = [
    "q2_min_cost_supplier",   # zero-quantity unit cost
    "dedup_minhash",          # shingle-less pair jaccard
    "dedup_ngram_jaccard",    # same fold, inverted-index path
    "mm_decode_jpeg",         # empty-text pixel floor
    "q1_pricing_summary",     # discount/qty boundary arithmetic
    "events_window_agg",      # negative/zero values through sums
    "text_token_count",       # whitespace-only token splits
    "dedup_exact",            # ''-vs-whitespace normalize collapse
]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory, sf_dir):
    out = str(tmp_path_factory.mktemp("edge"))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "embeddings"]:
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{out}/{t}.parquet")
    con.execute(
        f"""
        COPY (SELECT doc_id,
            CASE doc_id % 17
              WHEN 3 THEN '' WHEN 5 THEN '   '
              WHEN 7 THEN chr(10) || chr(9) || ' ' WHEN 9 THEN 'x'
              ELSE text END AS text,
            lang, source,
            CASE doc_id % 17
              WHEN 3 THEN 0 WHEN 5 THEN 3 WHEN 7 THEN 3 WHEN 9 THEN 1
              ELSE n_chars END AS n_chars
          FROM read_parquet('{sf_dir}/documents.parquet'))
        TO '{os.path.join(out, "documents.parquet")}' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (SELECT event_id, ts, user_id, event_type,
            CASE event_id % 11
              WHEN 2 THEN -value WHEN 4 THEN 0.0 ELSE value
            END AS value, props
          FROM read_parquet('{sf_dir}/events.parquet'))
        TO '{os.path.join(out, "events.parquet")}' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (SELECT o_orderkey, o_custkey, o_orderstatus,
            CASE o_orderkey % 13
              WHEN 2 THEN 0.0 WHEN 4 THEN -o_totalprice
              ELSE o_totalprice END AS o_totalprice,
            o_orderdate, o_orderpriority
          FROM read_parquet('{sf_dir}/orders.parquet'))
        TO '{os.path.join(out, "orders.parquet")}' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
            CASE l_orderkey % 13 WHEN 3 THEN 0.0 ELSE l_quantity
            END AS l_quantity,
            l_extendedprice,
            CASE l_orderkey % 13 WHEN 5 THEN 0.0 WHEN 7 THEN 0.1
              ELSE l_discount END AS l_discount,
            l_tax, l_returnflag, l_linestatus, l_shipdate
          FROM read_parquet('{sf_dir}/lineitem.parquet'))
        TO '{os.path.join(out, "lineitem.parquet")}' (FORMAT PARQUET)
        """
    )
    return out


@pytest.mark.parametrize("name", SENSITIVE)
def test_edge_value_parity(name, spark, edge_dir):
    df = QUERIES[name](spark, edge_dir)
    assert_matches_oracle(df, ORACLES[name], edge_dir)


# --- r7: boundary MAGNITUDES (distinct from zeros/negations) ------
#
# Money columns at decimal(12,2) extremes so squared terms cross
# 1e16 and sums cross 1e12. The r7 sweep caught two here, both
# pinned: profile_orders stringified doubles diverged (Spark
# scientific notation at 1e7 vs DuckDB plain — now both stringify
# through decimal(18,2)), and events_anomalies' ORACLE overflowed
# DuckDB's INT64 decimal multiply ((12,2)x(12,2); now (19,2)
# operands force the INT128 path).

EXTREME_SENSITIVE = [
    "profile_orders",
    "events_anomalies",
    "events_quantiles",
    "events_median",
    "dq_orders",
    "q18_large_orders",
]


@pytest.fixture(scope="module")
def extreme_dir(tmp_path_factory, sf_dir):
    out = str(tmp_path_factory.mktemp("extreme"))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "documents", "embeddings"]:
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{out}/{t}.parquet")
    con.execute(
        f"""
        COPY (SELECT event_id, ts, user_id, event_type,
            CASE event_id % 7
              WHEN 0 THEN 99999999.99
              WHEN 1 THEN -99999999.99
              WHEN 2 THEN 0.01
              ELSE value END AS value, props
          FROM read_parquet('{sf_dir}/events.parquet'))
        TO '{os.path.join(out, "events.parquet")}' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (SELECT o_orderkey, o_custkey, o_orderstatus,
            CASE o_orderkey % 7
              WHEN 0 THEN 99999999.99
              WHEN 1 THEN 0.01 ELSE o_totalprice END AS o_totalprice,
            o_orderdate, o_orderpriority
          FROM read_parquet('{sf_dir}/orders.parquet'))
        TO '{os.path.join(out, "orders.parquet")}' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (SELECT * REPLACE (
            CASE l_orderkey % 7 WHEN 0 THEN 9999999.99
              ELSE l_extendedprice END AS l_extendedprice)
          FROM read_parquet('{sf_dir}/lineitem.parquet'))
        TO '{os.path.join(out, "lineitem.parquet")}' (FORMAT PARQUET)
        """
    )
    return out


@pytest.mark.parametrize("name", EXTREME_SENSITIVE)
def test_extreme_magnitude_parity(name, spark, extreme_dir):
    df = QUERIES[name](spark, extreme_dir)
    assert_matches_oracle(df, ORACLES[name], extreme_dir)
