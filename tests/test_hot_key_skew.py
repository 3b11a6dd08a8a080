"""Oracle parity under HOT-KEY skew: one user owns ~half of all
events. This is the 100-TB streaming failure mode — per-key state
concentration through sessionization, session windows, and stateful
aggregation — checked for CORRECTNESS (both engines see the same
skewed data; a mismatch means a skew-sensitive semantics bug, e.g.
batch-boundary state handling for a giant group). A 15-query sweep
at sf0.01 ran green in r6; this keeps the stateful core guarded on
a small sf0.001 build.
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

# the per-user stateful ops (custom state, native session windows,
# stateful agg) plus the tumbling-window aggs the skew flows through
SENSITIVE = [
    "events_sessionize",
    "events_session_window",
    "stream_sessionize",
    "stream_user_totals",
    "stream_session_window",
    "events_window_agg",
    "sql_udtf_sessionize",
]


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory, sf_dir):
    out = str(tmp_path_factory.mktemp("skew"))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"]:
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{out}/{t}.parquet")
    con.execute(
        f"""
        COPY (SELECT event_id, ts,
                     CASE WHEN event_id % 2 = 0 THEN 42
                          ELSE user_id END AS user_id,
                     event_type, value, props
              FROM read_parquet('{sf_dir}/events.parquet'))
        TO '{os.path.join(out, "events.parquet")}' (FORMAT PARQUET)
        """
    )
    return out


@pytest.mark.parametrize("name", SENSITIVE)
def test_hot_key_parity(name, spark, skew_dir):
    df = QUERIES[name](spark, skew_dir)
    assert_matches_oracle(df, ORACLES[name], skew_dir)


def test_udtf_bucket_presplit_exact_across_widths(spark, skew_dir):
    """The r11 hot-key mitigation buckets the UDTF partition key by
    time and merges bucket boundaries in a JVM window. The merge is
    EXACT for any bucket width — including widths SMALLER than the
    300 s session gap, where one session spans several empty buckets
    — so bucketed output must equal the unbucketed plan bit-for-bit."""
    from etl_npl_pipeline_spark.plans.surfaces import sql_udtf_sessionize

    base = [
        tuple(r)
        for r in sql_udtf_sessionize(
            spark, skew_dir, split_seconds=None
        ).collect()
    ]
    assert len(base) > 0
    for width in (60, 3600):
        got = [
            tuple(r)
            for r in sql_udtf_sessionize(
                spark, skew_dir, split_seconds=width
            ).collect()
        ]
        assert got == base, f"bucket width {width} diverged"
