"""ST7: streaming upsert into a merge-on-read table (foreachBatch).

Oracle is the batch path: after draining the update stream, the
reconciled mor_read view must equal the same upsert computed with
plain batch DataFrame ops on the same inputs.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_npl_pipeline_spark import sinks
from etl_npl_pipeline_spark.sources.tables import load_table
from etl_npl_pipeline_spark.streaming.events import (
    events_stream,
    stream_upsert_mor,
)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_stream_upsert_matches_batch(spark, sf_dir, tmp_path):
    tbl = str(tmp_path / "mor_tbl")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    base = ev.where(F.col("event_id") < 200)
    sinks.mor_init(base, tbl)

    # update stream: overlapping key range with transformed values —
    # the streamed version must win on overlap, insert on the rest
    updates = (
        events_stream(spark, sf_dir)
        .select("event_id", "event_type", "value")
        .where((F.col("event_id") >= 100) & (F.col("event_id") < 300))
        .withColumn("value", F.col("value") * 2)
    )
    stream_upsert_mor(updates, tbl)

    got = _rows(sinks.mor_read(spark, tbl, key_cols=["event_id"]))

    batch_updates = ev.where(
        (F.col("event_id") >= 100) & (F.col("event_id") < 300)
    ).withColumn("value", F.col("value") * 2)
    expected = _rows(
        base.join(batch_updates, "event_id", "left_anti").unionByName(
            batch_updates
        )
    )
    assert got == expected


def test_stream_upsert_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Re-draining the same bounded stream from a FRESH checkpoint
    replays batch 0; the batch-id-versioned overwrite must leave the
    table unchanged instead of duplicating the delta."""
    import shutil

    tbl = str(tmp_path / "mor_tbl2")
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    sinks.mor_init(ev.where(F.col("event_id") < 50), tbl)

    updates = (
        events_stream(spark, sf_dir)
        .select("event_id", "value")
        .where(F.col("event_id") < 100)
    )
    stream_upsert_mor(updates, tbl)
    first = _rows(sinks.mor_read(spark, tbl, key_cols=["event_id"]))

    shutil.rmtree(f"{tbl}/_checkpoint")  # simulate lost progress
    stream_upsert_mor(updates, tbl)
    assert _rows(sinks.mor_read(spark, tbl, key_cols=["event_id"])) == first
