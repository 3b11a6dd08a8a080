"""A54 events_path_analysis invariants beyond oracle parity: user
counts partition across paths, path length is capped, and the
ranking is the count ordering."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_npl_pipeline_spark.plans import profiling
from etl_npl_pipeline_spark.sources.tables import load_table


def test_paths_rank_and_shape(spark, sf_dir):
    rows = profiling.events_path_analysis(spark, sf_dir).collect()
    assert 0 < len(rows) <= profiling.PATH_TOPK
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    # ranking is count-desc with path-asc tie-break
    for a, b in zip(rows, rows[1:]):
        assert a["n_users"] > b["n_users"] or (
            a["n_users"] == b["n_users"] and a["path"] < b["path"]
        )
    # every reported journey is at most PATH_LEN steps
    assert all(
        len(r["path"].split(">")) <= profiling.PATH_LEN for r in rows
    )


def test_topk_counts_bounded_by_users(spark, sf_dir):
    rows = profiling.events_path_analysis(spark, sf_dir).collect()
    n_users = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["n_users"] for r in rows) <= n_users
    assert rows[0]["n_users"] >= 1
