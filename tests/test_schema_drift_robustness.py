"""Oracle parity under SCHEMA DRIFT: the same values stored under
drifted physical schemas — int32 keys, float32 measures,
decimal(12,2)-physical money, reordered columns, stray producer
columns (`_ingest_batch`, `_producer`, `_shard`).

A 100 TB lake is written by many producers over years; the vintage
of a file must not change a query's answer. load_table normalizes
every scan against the CANONICAL catalog schema (sources/tables.py):
value-preserving widening casts, canonical column order, unknown
columns dropped — and parquet pushdown survives the cast
(UnwrapCastInBinaryComparison), pinned below.

The r7 sweep found six oracle-side divergences, all the same
species: the ORACLE inherited the file's physical type into its
output (decimal money, float32 quantile arithmetic) while the
engine's contract is canonical double. The oracles now state the
contract explicitly (CAST(... AS DOUBLE)); this suite pins the six
plus the join/hash/explode shapes most sensitive to key width.
"""

from __future__ import annotations

import contextlib
import io
import shutil

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.oracle import assert_matches_oracle

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()

SENSITIVE = [
    # the six sweep finds
    "q10_returned_items",
    "q18_large_orders",
    "events_median",
    "events_quantiles",
    "mor_snapshot_asof",
    "mor_compacted_read",
    # key-width-sensitive shapes: joins on int32-vintage keys,
    # md5/hash-keyed splits, window arithmetic on float32 measures
    "q3_shipping_priority",
    "q21_waiting_suppliers",
    "dedup_exact",
    "data_split",
    "events_window_agg",
    "events_asof_join",
    "profile_orders",
    "ann_topk",
]


@pytest.fixture(scope="module")
def drift_dir(tmp_path_factory, sf_dir):
    out = str(tmp_path_factory.mktemp("drift"))
    con = duckdb.connect()
    for t in ["region", "nation", "supplier", "part"]:
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{out}/{t}.parquet")
    con.execute(
        f"""COPY (SELECT
              CAST(o_custkey AS INTEGER) AS o_custkey,
              o_orderpriority,
              CAST(o_orderkey AS INTEGER) AS o_orderkey,
              CAST(o_totalprice AS DECIMAL(12,2)) AS o_totalprice,
              o_orderdate, o_orderstatus,
              CAST(7 AS INTEGER) AS _ingest_batch
            FROM read_parquet('{sf_dir}/orders.parquet'))
            TO '{out}/orders.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT
              l_returnflag, l_linestatus, l_shipdate,
              CAST(l_orderkey AS INTEGER) AS l_orderkey,
              CAST(l_partkey AS INTEGER) AS l_partkey,
              CAST(l_suppkey AS INTEGER) AS l_suppkey,
              CAST(l_linenumber AS BIGINT) AS l_linenumber,
              CAST(l_quantity AS DECIMAL(12,2)) AS l_quantity,
              CAST(l_extendedprice AS DECIMAL(12,2)) AS l_extendedprice,
              l_discount, l_tax
            FROM read_parquet('{sf_dir}/lineitem.parquet'))
            TO '{out}/lineitem.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT
              event_type, CAST(value AS REAL) AS value, props,
              CAST(event_id AS INTEGER) AS event_id, ts,
              CAST(user_id AS INTEGER) AS user_id,
              'crawler-7' AS _producer
            FROM read_parquet('{sf_dir}/events.parquet'))
            TO '{out}/events.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT
              lang, source, text,
              CAST(doc_id AS INTEGER) AS doc_id,
              CAST(n_chars AS INTEGER) AS n_chars,
              CAST(0 AS BIGINT) AS _shard
            FROM read_parquet('{sf_dir}/documents.parquet'))
            TO '{out}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT
              CAST(label AS BIGINT) AS label, embedding,
              CAST(vec_id AS INTEGER) AS vec_id
            FROM read_parquet('{sf_dir}/embeddings.parquet'))
            TO '{out}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT c_mktsegment, c_name,
              CAST(c_custkey AS INTEGER) AS c_custkey,
              CAST(c_acctbal AS DECIMAL(12,2)) AS c_acctbal,
              c_nationkey
            FROM read_parquet('{sf_dir}/customer.parquet'))
            TO '{out}/customer.parquet' (FORMAT PARQUET)"""
    )
    return out


@pytest.mark.parametrize("name", SENSITIVE)
def test_schema_drift_parity(name, spark, drift_dir):
    df = QUERIES[name](spark, drift_dir)
    assert_matches_oracle(df, ORACLES[name], drift_dir)


def test_canonical_schema_restored(spark, drift_dir):
    """Every drifted table reads back with exactly the catalog
    schema — types widened, order restored, stray columns gone."""
    from etl_npl_pipeline_spark.sources.tables import CANONICAL, load_table

    for name, canon in CANONICAL.items():
        df = load_table(spark, drift_dir, name)
        assert df.dtypes == canon, name


def test_pushdown_survives_widening_cast(spark, drift_dir):
    """A filter on the canonical bigint key must still reach the
    int32 parquet scan (UnwrapCastInBinaryComparison), and pruning
    must exclude the stray producer column — otherwise every
    drifted vintage would full-scan at 100 TB."""
    from pyspark.sql import functions as F

    from etl_npl_pipeline_spark.sources.tables import load_table

    df = (
        load_table(spark, drift_dir, "orders")
        .where(F.col("o_orderkey") < 2000)
        .select("o_orderkey", "o_totalprice")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "LessThan(o_orderkey,2000)" in plan
    assert "_ingest_batch" not in plan
    assert "o_orderpriority" not in plan.split("ReadSchema")[1]


def test_missing_catalog_column_is_loud(spark, tmp_path, sf_dir):
    """A file missing a catalog column must fail at plan time with
    the table and column named — not at execution with an opaque
    resolve error."""
    import duckdb as dd

    out = str(tmp_path)
    con = dd.connect()
    con.execute(
        f"""COPY (SELECT r_regionkey
             FROM read_parquet('{sf_dir}/region.parquet'))
            TO '{out}/region.parquet' (FORMAT PARQUET)"""
    )
    from etl_npl_pipeline_spark.sources.tables import load_table

    with pytest.raises(ValueError, match="region.*r_name"):
        load_table(spark, out, "region")


# --- mixed-vintage DIRECTORY tables -------------------------------
#
# The harder real case: ONE table directory whose part files come
# from different producer vintages (canonical bigint/double part +
# int32/decimal-physical part). Spark can neither mergeSchema the
# int32/int64 footers nor scan the decimal-physical file through a
# double read schema, so load_table groups part files by footer
# schema, normalizes each homogeneous group, and unions
# (_read_mixed_vintage). The DuckDB oracle reads the same directory
# with union_by_name — an independent implementation of the same
# promotion — so parity also checks the widening is value-exact.

MIXED_SENSITIVE = [
    "q4_order_priority",
    "q13_order_distribution",
    "q22_global_sales",
    "events_window_agg",
    "events_median",
    "profile_orders",
]


@pytest.fixture(scope="module")
def mixed_dir(tmp_path_factory, sf_dir):
    out = str(tmp_path_factory.mktemp("mixed"))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "lineitem", "documents", "embeddings"]:
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{out}/{t}.parquet")
    import os

    os.makedirs(f"{out}/orders.parquet")
    con.execute(
        f"""COPY (SELECT * FROM read_parquet('{sf_dir}/orders.parquet')
             WHERE o_orderkey < 1000)
            TO '{out}/orders.parquet/part-a.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT
              CAST(o_orderkey AS INTEGER) AS o_orderkey,
              CAST(o_custkey AS INTEGER) AS o_custkey,
              o_orderstatus,
              CAST(o_totalprice AS DECIMAL(12,2)) AS o_totalprice,
              o_orderdate, o_orderpriority, 7 AS _b
            FROM read_parquet('{sf_dir}/orders.parquet')
            WHERE o_orderkey >= 1000)
            TO '{out}/orders.parquet/part-b.parquet' (FORMAT PARQUET)"""
    )
    os.makedirs(f"{out}/events.parquet")
    con.execute(
        f"""COPY (SELECT * FROM read_parquet('{sf_dir}/events.parquet')
             WHERE event_id % 2 = 0)
            TO '{out}/events.parquet/part-a.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT event_id, ts, user_id, event_type,
              CAST(value AS REAL) AS value, props
            FROM read_parquet('{sf_dir}/events.parquet')
            WHERE event_id % 2 = 1)
            TO '{out}/events.parquet/part-b.parquet' (FORMAT PARQUET)"""
    )
    return out


def test_mixed_vintage_canonical_schema(spark, mixed_dir):
    from etl_npl_pipeline_spark.sources.tables import CANONICAL, load_table

    for t in ("orders", "events"):
        df = load_table(spark, mixed_dir, t)
        assert df.dtypes == CANONICAL[t], t
    # nothing lost in the union
    assert load_table(spark, mixed_dir, "orders").count() == 1500


@pytest.mark.parametrize("name", MIXED_SENSITIVE)
def test_mixed_vintage_parity(name, spark, mixed_dir):
    df = QUERIES[name](spark, mixed_dir)
    assert_matches_oracle(df, ORACLES[name], mixed_dir)
