#!/usr/bin/env python
"""Correctness at scale: run a representative slice of the
oracle-backed contract queries at the sf1.0 dataset
(tools_make_sf1.py) and cross-check against DuckDB running the SAME
oracle SQL over the SAME parquet — the sf0.01 driver check, one
order of magnitude up. Publishes sf1_correctness.json (bench.py
republishes it into bench_detail.json["sf1_correctness"]).

The slice spans every plan family: TPC-H joins/aggs, window
functions, events sessionization, LLM-data dedup/quality, the NPL
pipeline, and the new bucketed join. Streaming and fixture-building
queries are excluded (their oracles replay the same logic — scale
behavior is covered by tools_bench_sf1.py's timing/plan checks).

Run: python tools_make_sf1.py && python tools_check_sf1_correctness.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from etl_npl_pipeline_spark.session import get_spark  # noqa: E402

SF1_DIR = "/root/repo/.tmp/sf1"

CHECK = [
    # TPC-H joins/aggs — all 22 analogs + rollup/cube/set-ops/top-k
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q12_priority_shipping",
    "q13_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_part_supplier_counts",
    "q17_small_quantity",
    "q18_large_orders",
    "q19_disjunctive",
    "q20_excess_shippers",
    "q21_waiting_suppliers",
    "q22_global_sales",
    "q_rollup_region",
    "q_cube_status_priority",
    "q_set_ops",
    "q_top_parts_per_brand",
    # events analytics: sessions, windows, as-of, funnel, retention
    "events_sessionize",
    "events_window_agg",
    "events_median",
    "events_hopping_window",
    "events_asof_join",
    "events_range_join",
    "events_gapfill",
    "events_funnel",
    "events_retention",
    "events_anomalies",
    "dq_orders",
    # NPL pipeline + window functions
    "npl_quarterly",
    "op_rolling_avg",
    "op_yoy_growth",
    # LLM-data map-only + dedup + splits
    "text_quality",
    "text_fingerprint",
    "text_scrub",
    "text_repetition",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_chunks",
    "data_split",
    "data_mixture",
    "data_cap_domains",
    "vocab_top_ngrams",
    "doc_length_hist",
    "join_bucketed",
]
# Excluded on purpose: dedup_components / corpus_curation (the
# DuckDB oracle replays a recursive CTE — minutes at sf1; their
# Spark-side scale behavior is covered by tools_bench_sf1.py),
# streaming queries (oracle replays the same batch logic), and
# fixture-rebuild queries (excel/REST/MOR — they re-manufacture
# their own inputs, so sf has no effect).


def _norm(v):
    # 12 significant digits, not fixed decimals: sf1 money sums reach
    # ~4e10, where the driver's %.6f would demand 17 significant
    # digits — beyond float64 — and flag 1-ULP aggregation-order
    # noise (measured: q1 sum_charge differed by 1 ULP at sf1, exact
    # at sf0.1). 12 sig figs is still far below any real tolerance.
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.12g}"
    return str(v)


def main() -> None:
    if not os.path.isdir(SF1_DIR):
        sys.exit("run tools_make_sf1.py first")
    spark = get_spark("sf1-correctness")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF1_DIR}/{t}.parquet'"
        )
    out: dict[str, dict] = {}
    for name in CHECK:
        t0 = time.time()
        sdf = queries[name](spark, SF1_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        o = con.execute(oracles[name])
        ocols = [d[0] for d in o.description]
        orows = o.fetchall()
        order_s = sorted(range(len(scols)), key=lambda i: scols[i])
        order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
        cs = sorted(tuple(_norm(r[i]) for i in order_s) for r in srows)
        co = sorted(tuple(_norm(r[i]) for i in order_o) for r in orows)
        out[name] = {
            "rows": len(srows),
            "oracle_rows": len(orows),
            "match": sorted(scols) == sorted(ocols) and cs == co,
            "sec": round(time.time() - t0, 2),
        }
        print(name, json.dumps(out[name]), flush=True)
    doc = {
        "sf": "1.0 (10x replication of sf0.1)",
        "checked": len(out),
        "all_match": all(v["match"] for v in out.values()),
        "queries": out,
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "sf1_correctness.json"), "w",
    ) as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps({k: doc[k] for k in ("checked", "all_match")}))


if __name__ == "__main__":
    main()
