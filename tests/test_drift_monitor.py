"""ST16 stream_drift_monitor invariants: the oracle hash proves the
streamed result equals the quantized batch computation; these pin
the streaming mechanics and the moment algebra directly.

* stream == batch: the streamed report equals _dm_report over the
  full-corpus moments computed in one batch aggregate;
* replay overwrite: folding the same batch twice (at-least-once
  redelivery) must not change the accumulated moments;
* moment additivity: moments of the vec_id-parity splits ADD to the
  full-corpus moments exactly (the property the fold relies on).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_npl_pipeline_spark.plans import llmdata


def _xq(spark, sf_dir):
    return llmdata._emb(spark, sf_dir).select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x * F.lit(llmdata.DM_SCALE) + F.lit(0.5)),
        ).alias("xq"),
    )


def test_stream_equals_batch(spark, sf_dir):
    streamed = llmdata.stream_drift_monitor(spark, sf_dir).collect()
    batch = llmdata._dm_report(
        spark, llmdata._dm_moments(_xq(spark, sf_dir))
    ).collect()
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]


def test_moment_additivity_and_replay(spark, sf_dir):
    xq = _xq(spark, sf_dir)
    full = llmdata._dm_moments(xq)
    a = llmdata._dm_moments(xq.where(F.col("vec_id") % 4 < 2))
    b = llmdata._dm_moments(xq.where(F.col("vec_id") % 4 >= 2))
    assert llmdata._dm_add(a, b) == full
    # replay: the fold is keyed by batch_id, so redelivery
    # overwrites — simulate by writing the same slot twice
    per_batch = {}
    per_batch[0] = a
    per_batch[0] = a  # redelivered
    per_batch[1] = b
    acc: dict = {}
    for k in sorted(per_batch):
        acc = llmdata._dm_add(acc, per_batch[k])
    assert acc == full
