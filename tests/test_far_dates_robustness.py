"""Oracle parity at the calendar extremes: half the event/order/
lineitem timestamps pushed ~120 years back (1905-ish) and half
pushed to 2250-2400 — near (and for orders, past) the pandas
datetime64[ns] horizon, far outside the shipped testdata's range.

The r7 sweep (tools_adversarial_sweep.py far_dates) passed every
native operator and found two contract gaps, both pinned here:
- src_rest_pages: a gateway window with ZERO observations is an
  empty feed, not an error — fetch_observations now returns the
  empty relation when the caller declares ``empty_schema``.
- compat_pandas_quarterly is the documented exclusion: year-2400
  orders are unrepresentable in pandas' ns timestamps (the
  reference's own pandas engine fails identically); its native
  twins op_quarter_agg / npl_quarterly are in the pinned set
  instead, proving the engine itself has no range limit.
"""

from __future__ import annotations

import shutil

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.oracle import assert_matches_oracle

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()

# window arithmetic, sessionization, as-of, gap-fill, quarter
# bucketing, date-filtered scans — every shape that does timestamp
# math, at both extremes
SENSITIVE = [
    "src_rest_pages",
    "op_quarter_agg",
    "npl_quarterly",
    "events_sessionize",
    "events_window_agg",
    "events_asof_join",
    "events_gapfill",
    "events_hopping_window",
    "events_session_window",
    "q1_pricing_summary",
    "q4_order_priority",
    "op_yoy_growth",
]


@pytest.fixture(scope="module")
def far_dates_dir(tmp_path_factory, sf_dir):
    out = str(tmp_path_factory.mktemp("far_dates"))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "documents", "embeddings"]:
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{out}/{t}.parquet")
    con.execute(
        f"""COPY (SELECT event_id,
              CASE WHEN event_id % 2 = 0
                   THEN ts + INTERVAL 226 YEAR
                   ELSE ts + INTERVAL 50 YEAR END AS ts,
              user_id, event_type, value, props
            FROM read_parquet('{sf_dir}/events.parquet'))
            TO '{out}/events.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT o_orderkey, o_custkey, o_orderstatus,
              o_totalprice,
              CASE WHEN o_orderkey % 2 = 0
                   THEN o_orderdate + INTERVAL 404 YEAR
                   ELSE o_orderdate - INTERVAL 91 YEAR END AS o_orderdate,
              o_orderpriority
            FROM read_parquet('{sf_dir}/orders.parquet'))
            TO '{out}/orders.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT * REPLACE (
              CASE WHEN l_orderkey % 2 = 0
                   THEN l_shipdate + INTERVAL 404 YEAR
                   ELSE l_shipdate - INTERVAL 91 YEAR END AS l_shipdate)
            FROM read_parquet('{sf_dir}/lineitem.parquet'))
            TO '{out}/lineitem.parquet' (FORMAT PARQUET)"""
    )
    return out


@pytest.mark.parametrize("name", SENSITIVE)
def test_far_dates_parity(name, spark, far_dates_dir):
    df = QUERIES[name](spark, far_dates_dir)
    assert_matches_oracle(df, ORACLES[name], far_dates_dir)
