"""Oracle parity under NULL injection: ~5% NULLs in the nullable
non-key columns (document text/lang/source/n_chars, event
value/props, order totalprice). Real corpora contain nulls; the
shipped testdata has none, so null-path divergences hide until
production. The r6 sweep caught three: DuckDB's
``list_prepend(0, NULL) = [0]`` silently turned null docs into
fp=0 in two oracles, and Spark's ``concat_ws`` swallowed a null
token array into ``md5('')`` in doc_chunks — a half-null row
(n_tok NULL, hash md5('')) that would poison chunk-level dedup.
Contract pinned here: null in, null out, coherently across every
column of the row.
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

# the r6 offenders + the text/doc/value paths nulls flow through.
# Second wave (full-sweep finds): UDF crash guards (minhash
# signatures, media builders/decoders), the as-of row-vs-value
# carry, NULLS FIRST/LAST divergence (interleave), total z-order
# keys, and the NOT-IN null collapse (incremental store).
SENSITIVE = [
    "text_fingerprint",
    "doc_chunks",
    "text_chunk_filter",
    "dedup_chunks",
    "text_quality",
    "text_token_count",
    "text_normalize",
    "dedup_exact",
    "doc_length_hist",
    "events_window_agg",
    "events_median",
    "dq_orders",
    "profile_orders",
    "events_asof_join",
    "data_interleave",
    "data_zorder",
    "dedup_incremental",
    "dedup_minhash",
    "mm_audio_features",
    "mm_decode_meta",
    "src_rest_pages",
]


@pytest.fixture(scope="module")
def nulls_dir(tmp_path_factory, sf_dir):
    out = str(tmp_path_factory.mktemp("nulls"))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "lineitem", "embeddings"]:
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{out}/{t}.parquet")
    con.execute(
        f"""
        COPY (SELECT doc_id,
                CASE WHEN doc_id % 19 = 3 THEN NULL ELSE text END AS text,
                CASE WHEN doc_id % 23 = 5 THEN NULL ELSE lang END AS lang,
                CASE WHEN doc_id % 29 = 7 THEN NULL ELSE source END AS source,
                CASE WHEN doc_id % 19 = 3 THEN NULL ELSE n_chars END AS n_chars
              FROM read_parquet('{sf_dir}/documents.parquet'))
        TO '{os.path.join(out, "documents.parquet")}' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (SELECT event_id, ts, user_id, event_type,
                CASE WHEN event_id % 17 = 2 THEN NULL ELSE value END AS value,
                CASE WHEN event_id % 13 = 4 THEN NULL ELSE props END AS props
              FROM read_parquet('{sf_dir}/events.parquet'))
        TO '{os.path.join(out, "events.parquet")}' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (SELECT o_orderkey, o_custkey, o_orderstatus,
                CASE WHEN o_orderkey % 31 = 6 THEN NULL
                     ELSE o_totalprice END AS o_totalprice,
                o_orderdate, o_orderpriority
              FROM read_parquet('{sf_dir}/orders.parquet'))
        TO '{os.path.join(out, "orders.parquet")}' (FORMAT PARQUET)
        """
    )
    return out


@pytest.mark.parametrize("name", SENSITIVE)
def test_null_injection_parity(name, spark, nulls_dir):
    df = QUERIES[name](spark, nulls_dir)
    assert_matches_oracle(df, ORACLES[name], nulls_dir)
