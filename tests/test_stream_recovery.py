"""Checkpoint-recovery contract: kill a drain mid-stream, restart
from the same checkpoint, and the final result equals the batch
oracle exactly-once — nothing lost (state restores from the state
store), nothing double-counted (committed batches don't replay;
replayed uncommitted batches land idempotently).

Targets the two production-shaped sinks:
- ST6 totals (applyInPandasWithState) through run_stream_to_dir —
  the resumed stateful operator must carry pre-crash state.
- ST7 MOR upsert (foreachBatch + epoch manifest) — the resumed
  drain must complete the table to the batch-upsert oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql.streaming.state import GroupStateTimeout

from etl_npl_pipeline_spark import sinks
from etl_npl_pipeline_spark.sources.tables import load_table
from etl_npl_pipeline_spark.streaming.events import (
    _TWS_OUT,
    _user_totals_fn,
    run_stream_to_dir,
    stream_upsert_mor,
)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _multi_file_source(spark, sf_dir, out, n_files=6):
    """events split across n_files parquet files so maxFilesPerTrigger=1
    yields a multi-batch drain with a kill point in the middle."""
    (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            "event_type",
            (F.col("value").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(out)
    )
    return (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, cents long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(out)
    )


def _totals_stream(src):
    return src.select("user_id", "cents").groupBy("user_id").applyInPandasWithState(
        _user_totals_fn,
        outputStructType=_TWS_OUT,
        stateStructType="n BIGINT, cents BIGINT",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _fold_totals(spark, out_root):
    # update mode emits a user's running state once per batch it
    # appears in; the max over (n_events, cents) is the final state
    return (
        spark.read.parquet(out_root)
        .groupBy("user_id")
        .agg(F.max(F.struct("n_events", "cents")).alias("s"))
        .select("user_id", F.col("s.n_events").alias("n_events"), F.col("s.cents").alias("cents"))
    )


def test_stateful_totals_survive_mid_drain_kill(spark, sf_dir, tmp_path):
    src_dir = str(tmp_path / "src")
    out_root = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # first attempt dies before batch 3 commits
    with pytest.raises(Exception, match="injected failure|Injected|STREAM"):
        run_stream_to_dir(
            _totals_stream(_multi_file_source(spark, sf_dir, src_dir)),
            out_root,
            ckpt,
            label="recovery_totals_crash",
            fail_at_batch=3,
        )

    # restart from the SAME checkpoint: resumes at batch 3 with
    # restored per-user state; earlier committed batches do not rerun
    run_stream_to_dir(
        _totals_stream(
            spark.readStream.schema(
                "event_id long, user_id long, event_type string, cents long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        ),
        out_root,
        ckpt,
        label="recovery_totals_resume",
    )

    got = _rows(_fold_totals(spark, out_root))
    expected = _rows(
        spark.read.parquet(src_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("cents"),
        )
    )
    assert got == expected


def test_resume_skips_committed_batches(spark, sf_dir, tmp_path):
    """The resumed query must start at the failed batch, not batch 0 —
    the checkpoint's committed offsets are honored."""
    src_dir = str(tmp_path / "src")
    out_root = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    from etl_npl_pipeline_spark.streaming.events import DRAIN_PROGRESS

    with pytest.raises(Exception, match="injected failure|STREAM"):
        run_stream_to_dir(
            _totals_stream(_multi_file_source(spark, sf_dir, src_dir)),
            out_root,
            ckpt,
            label="recovery_skip_crash",
            fail_at_batch=2,
        )
    run_stream_to_dir(
        _totals_stream(
            spark.readStream.schema(
                "event_id long, user_id long, event_type string, cents long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        ),
        out_root,
        ckpt,
        label="recovery_skip_resume",
    )
    # 6 source files → batches 0..5; crash before 2 → resume runs 2..5
    resumed = DRAIN_PROGRESS["recovery_skip_resume"]["batches"]
    assert resumed <= 4, f"resume reran committed batches ({resumed})"
    got = _rows(_fold_totals(spark, out_root))
    expected = _rows(
        spark.read.parquet(src_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("cents"),
        )
    )
    assert got == expected


def test_mor_upsert_recovers_to_batch_oracle(spark, sf_dir, tmp_path):
    """ST7: kill the MOR drain mid-stream; the restarted drain (same
    checkpoint → same epoch manifest) completes the table to exactly
    the batch last-writer-wins oracle — replayed deltas land on their
    own versions idempotently, committed ones are not re-planned."""
    src_dir = str(tmp_path / "src")
    tbl = str(tmp_path / "mor_tbl")

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    sinks.mor_init(ev.where(F.col("event_id") < 100), tbl)

    _multi_file_source(spark, sf_dir, src_dir)  # writes the files
    updates = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, cents long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .select("event_id", (F.col("cents") / 100.0).alias("value"))
        .where(F.col("event_id") < 400)
    )
    with pytest.raises(Exception, match="injected failure|STREAM"):
        stream_upsert_mor(updates, tbl, fail_at_batch=3)

    stream_upsert_mor(updates, tbl)  # resume, same checkpoint

    got = _rows(sinks.mor_read(spark, tbl, key_cols=["event_id"]))
    batch_updates = (
        spark.read.parquet(src_dir)
        .select("event_id", (F.col("cents") / 100.0).alias("value"))
        .where(F.col("event_id") < 400)
    )
    base = ev.where(F.col("event_id") < 100)
    expected = _rows(
        base.join(batch_updates, "event_id", "left_anti").unionByName(
            batch_updates
        )
    )
    assert got == expected
