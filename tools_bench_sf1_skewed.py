#!/usr/bin/env python
"""Skewed-at-scale probe (r9, VERDICT r8 #4): run the heavy-query
tier + the dedup tier + the skew-sensitive TPC-H shapes against the
ZIPFIAN sf1 build (tools_make_sf1_skewed.py) and publish
sf1_skewed.json.

What the flat sf1/sf10 decades could not show: every key there keeps
sf0.1's frequency, so AQE's skew handling never engages and a
hot-key straggler can hide. Here 20% of orders belong to one
customer, 10% of lineitems to one supplier/part, 14% of events to
one bot user, and ~250-copy boilerplate hub documents exist in every
replica. Per query this records:

- steady wall + shuffle bytes on the skewed build, with the FLAT sf1
  numbers measured in the same process as the reference — the gate
  is bytes_skewed / bytes_flat ≈ 1 (same data volume, different key
  distribution; a blowup means candidate pairs or join fanout went
  quadratic on the hot key);
- spill bytes (must stay 0);
- whether AQE engaged its skew machinery (AQEShuffleRead
  skewed/coalesced markers in the FINAL adaptive plan);
- no BroadcastNestedLoopJoin anywhere.

Fanout caveat, recorded per query rather than gated: joins THROUGH a
hot FK legitimately produce more output rows (the mega-customer's
orders x customer row is 1:1, but q18-style group sums move), so
wall-time ratios are annotated, not failed.

Run: python tools_make_sf1_skewed.py && python tools_bench_sf1_skewed.py
Subset: python tools_bench_sf1_skewed.py q18_large_orders dedup_exact
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from etl_npl_pipeline_spark.metrics import run_with_metrics  # noqa: E402
from etl_npl_pipeline_spark.session import get_spark  # noqa: E402

SKEW_DIR = "/root/repo/.tmp/sf1_skewed"
FLAT_DIR = "/root/repo/.tmp/sf1"

# heavy tier (the r5 ranking the sf1 harness uses) — hot keys touch
# orders/customer/lineitem/events in most of these
HEAVY = [
    "pipeline_full_read",
    "corpus_curation",
    "dedup_components_star",
    "stream_stream_left_join",
    "dedup_components",
    "data_contrastive_pairs",
    "dedup_bloom",
    "stream_stream_join",
    "sql_udtf_sessionize",
    "ann_ivf",
]
# dedup tier: the hub-document groups hit exactly these
DEDUP = [
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_semantic",
    "dedup_incremental",
]
# skew-sensitive joins/groupBys: mega-customer, hot supplier, bot user
SKEWED_SHAPES = [
    "q13_order_distribution",
    "q18_large_orders",
    "q21_waiting_suppliers",
    "q9_product_profit",
    "events_sessionize",
    "stream_user_totals",
]
# r12: the bot user (14% of events) is the designed stress for the
# path-based attribution equi-join and the OHLC per-bucket windows;
# hub documents stress the bottom-k containment probe volume
R12_SHAPES = [
    "events_attribution",
    "events_ohlc_bars",
    "dedup_containment_bottomk",
    "q_cohort_ltv",
]
ALL_QUERIES = HEAVY + DEDUP + SKEWED_SHAPES + R12_SHAPES


def main() -> None:
    if not os.path.isdir(SKEW_DIR):
        sys.exit("run tools_make_sf1_skewed.py first")
    if not os.path.isdir(FLAT_DIR):
        sys.exit("run tools_make_sf1.py first (flat reference)")
    subset = [a for a in sys.argv[1:] if a in ALL_QUERIES]
    run_queries = subset or ALL_QUERIES
    spark = get_spark("bench-sf1-skewed")
    queries = entrymod.queries()
    queries["q6_forecast_revenue"](spark, FLAT_DIR).count()
    from pyspark.sql.functions import pandas_udf as _pudf

    spark.range(10).select(_pudf(lambda s: s, "long")("id")).count()

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "sf1_skewed.json"
    )
    out: dict[str, dict] = {}
    if subset and os.path.exists(out_path):
        with open(out_path) as fh:
            out = json.load(fh).get("queries", {})

    for name in run_queries:
        fn = queries[name]

        def _noop(d):
            df = fn(spark, d)
            df.write.format("noop").mode("overwrite").save()
            return df

        # flat sf1 reference, same process/host (steady = 2nd run)
        _noop(FLAT_DIR)
        m_flat = run_with_metrics(spark, lambda: _noop(FLAT_DIR))
        # skewed: cold, then metered steady; keep the df so the FINAL
        # adaptive plan (with AQEShuffleRead markers) is inspectable
        t0 = time.time()
        _noop(SKEW_DIR)
        cold = time.time() - t0
        holder: dict = {}

        def _run_skew():
            holder["df"] = _noop(SKEW_DIR)

        m_skew = run_with_metrics(spark, _run_skew)
        plan = (
            holder["df"]._jdf.queryExecution().executedPlan().toString()
        )
        sw_f = m_flat["shuffle_write_bytes"]
        sw_s = m_skew["shuffle_write_bytes"]
        out[name] = {
            "skew_cold_sec": round(cold, 3),
            "skew_steady_sec": round(m_skew["wall_sec"], 3),
            "flat_steady_sec": round(m_flat["wall_sec"], 3),
            "wall_ratio_skew_vs_flat": round(
                m_skew["wall_sec"] / max(m_flat["wall_sec"], 1e-9), 2
            ),
            "shuffle_mb_flat": round(sw_f / 1e6, 3),
            "shuffle_mb_skew": round(sw_s / 1e6, 3),
            "shuffle_byte_ratio": (
                round(sw_s / sw_f, 2) if sw_f > 0 else None
            ),
            "spill_bytes_skew": m_skew["memory_spill_bytes"]
            + m_skew["disk_spill_bytes"],
            "bnlj": "BroadcastNestedLoop" in plan,
            "aqe_skew_split": "skewed=true" in plan
            or "isSkew=true" in plan
            or ("AQEShuffleRead" in plan and "skewed" in plan),
        }
        print(name, json.dumps(out[name]), flush=True)

    doc = {
        "build": (
            "tools_make_sf1_skewed.py: 10x replication with 20% of "
            "orders on one customer, 10% of lineitems on one "
            "supplier / one part, 14% of events on one bot user, "
            "~250-copy hub-document groups per replica, hub "
            "embeddings"
        ),
        "gates": {
            "spill": "spill_bytes_skew == 0 everywhere",
            "bytes": (
                "shuffle_byte_ratio ~ 1 vs flat sf1 (same volume, "
                "hot keys) — modest movement from group-count "
                "changes is annotated, order-of-magnitude is a fail"
            ),
            "bnlj": "no BroadcastNestedLoopJoin in any final plan",
            "aqe": (
                "aqe_skew_split false everywhere is the CORRECT "
                "outcome at sf1: the hot TPC-H joins plan as "
                "BroadcastHashJoin (probe-side key skew is "
                "irrelevant to a BHJ), q21's one SortMergeJoin has "
                "a ~25 MB hot partition — far below AQE's 256 MB "
                "skewedPartitionThreshold — and stream state joins "
                "are not AQE-splittable (state is keyed; see the "
                "bucket co-keying finding). At 100x the same hot "
                "shares cross the threshold and AQE splits."
            ),
        },
        "queries": out,
    }
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
