"""A52 events_attribution invariants beyond oracle parity: credit
conservation and model-total consistency — the properties that make
an attribution report trustworthy regardless of the data."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_npl_pipeline_spark.plans import profiling
from etl_npl_pipeline_spark.sources.tables import load_table


def test_attribution_credit_is_conserved(spark, sf_dir):
    rows = profiling.events_attribution(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_conv = ev.where(F.col("event_type") == "purchase").count()

    # every conversion is assigned exactly one first and one last
    assert sum(r.first_touch for r in rows) == n_conv
    assert sum(r.last_touch for r in rows) == n_conv

    # linear ppm: each conversion distributes 1e6, losing < 1 ppm
    # unit per contributing channel to the floor (≤ 3 channels)
    total_ppm = sum(r.linear_ppm for r in rows)
    assert total_ppm <= 1_000_000 * n_conv
    assert total_ppm > 1_000_000 * n_conv - 3 * n_conv

    # last-touch revenue partitions total purchase revenue
    rev = sum(r.last_touch_rev for r in rows)
    want = (
        ev.where(F.col("event_type") == "purchase")
        .agg(F.sum(F.col("value").cast("decimal(12,2)")).cast("double"))
        .collect()[0][0]
    )
    assert abs(rev - want) < 0.02 * max(len(rows), 1)


def test_attribution_lookback_excludes_stale_touches(spark):
    """A touch outside the 72h lookback (or after the conversion)
    must not be credited; the '(none)' row absorbs the conversion."""
    rows = [
        # user 1: touch 100h before conversion -> stale
        (1, "2024-01-01 00:00:00", 1, "click", 10.0),
        (2, "2024-01-05 04:00:00", 1, "purchase", 50.0),
        # user 2: touch after the conversion -> not credited
        (3, "2024-01-02 01:00:00", 2, "purchase", 20.0),
        (4, "2024-01-02 02:00:00", 2, "view", 1.0),
        # user 3: one in-window click -> full credit
        (5, "2024-01-03 00:00:00", 3, "click", 2.0),
        (6, "2024-01-03 01:00:00", 3, "purchase", 30.0),
    ]
    df = spark.createDataFrame(
        [(i, t, u, e, v, "{}") for i, t, u, e, v in rows],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {
            r.channel: r
            for r in profiling.events_attribution(spark, d).collect()
        }
    assert set(out) == {"(none)", "click"}
    assert out["(none)"].first_touch == 2
    assert out["(none)"].linear_ppm == 2_000_000
    assert out["click"].first_touch == 1
    assert out["click"].last_touch == 1
    assert out["click"].linear_ppm == 1_000_000
    assert out["click"].last_touch_rev == 30.0
