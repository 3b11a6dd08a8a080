#!/usr/bin/env python
"""Price the bench's events cache_table pin (r14, VERDICT r13 #10).

bench.py pins the events table before its timed passes (the
production hot-table pattern, identical across rounds). This probe
publishes what that subsidy is actually worth: it runs the batch
events tier twice in THIS process — first unpinned, then pinned —
steady-2nd-run noop timings both times, and writes
events_pin_probe.json, which bench.py attaches to bench_detail.json.

Run it standalone (fresh process, no pin inherited):
    python tools_events_pin_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from etl_npl_pipeline_spark.session import get_spark  # noqa: E402

EVENTS_TIER = [
    "events_window_agg",
    "events_sessionize",
    "events_quantiles",
    "events_anomalies",
    "events_hopping_window",
    "events_asof_join",
    "events_session_window",
    "events_range_join",
    "events_gapfill",
    "events_funnel",
    "events_retention",
    "events_attribution",
    "events_cep_pattern",
    "events_markov_transitions",
    "events_ab_test",
    "events_ohlc_bars",
    "events_path_analysis",
    "events_windowed_topk",
    "events_sla_breach",
    "events_median",
]


def _steady(spark, fn, sf_dir):
    for i in range(2):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
    return round(wall, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("events-pin-probe")
    queries = entrymod.queries()
    names = [n for n in EVENTS_TIER if n in queries]
    queries["q6_forecast_revenue"](spark, sf_dir).count()
    from pyspark.sql.functions import pandas_udf as _pudf

    _warm = _pudf(lambda s: s, "long")
    spark.range(10).select(_warm("id")).count()

    unpinned = {n: _steady(spark, queries[n], sf_dir) for n in names}
    from etl_npl_pipeline_spark.sources.tables import cache_table

    cache_table(spark, sf_dir, "events")
    pinned = {n: _steady(spark, queries[n], sf_dir) for n in names}

    out = {
        "sf_dir": sf_dir,
        "method": "same process, steady 2nd-run noop; unpinned tier "
        "first, then cache_table(events), then the same tier again",
        "unpinned_total_sec": round(sum(unpinned.values()), 3),
        "pinned_total_sec": round(sum(pinned.values()), 3),
        "subsidy_sec": round(
            sum(unpinned.values()) - sum(pinned.values()), 3
        ),
        "per_query": {
            n: {"unpinned": unpinned[n], "pinned": pinned[n]}
            for n in names
        },
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "events_pin_probe.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in (
        "unpinned_total_sec", "pinned_total_sec", "subsidy_sec")}))


if __name__ == "__main__":
    main()
