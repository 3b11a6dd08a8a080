#!/usr/bin/env python
"""Adjudicate the r12 streaming-tier bench regression (VERDICT r12 #1).

The r12 steady-state bench flagged ``stream_stream_join`` against the
calibrated self-baseline (2.672 s baseline -> 7.854 s suite reading),
and the whole streaming drain tier moved +25% with ZERO streaming code
change (``git diff 7d5b76f..HEAD -- etl_npl_pipeline_spark/streaming/``
is empty). Two confounds make the suite reading suspect:

* the r12 bench host measured ~2.07x slower on the shuffle probe
  (0.686 s vs the baseline's 0.332 s), and the gate's machine_scale
  stretches the threshold but cannot model per-tier sensitivity —
  streaming drains pay fixed per-micro-batch state-store open/commit
  costs that scale with I/O latency, not shuffle throughput;
* two new drains (stream_ohlc_bars and its batch twin) joined the
  bench set in r12, so each drain now runs with more neighbor
  checkpoint/memory-sink churn in the back-to-back pass.

Method (the drift_adjudication.json pattern): on a quiet host, run
each moved drain EXCLUSIVELY — one cold pass (plan compile + JVM
warm), then 3 warm runs, min — and scale onto the baseline host via
the shuffle probe. Verdict per drain:

* ``noise_cleared`` if the scaled isolated time is within the gate
  envelope (1.25x baseline + 0.3 s slack) — the suite reading was
  context noise and the existing floor stands;
* ``confirmed`` if the isolated run reproduces the regression — the
  floor must be re-anchored only after a code bisect.

Writes stream_adjudication.json; bench.py republishes it into
bench_detail.json["stream_adjudication"].
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from etl_npl_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# the four drains VERDICT r12 named as moved
MOVERS = [
    "stream_stream_join",
    "stream_dedup_events",
    "stream_user_totals",
    "stream_cdc_scd2",
]

GATE_RATIO = 1.25
GATE_SLACK_SEC = 0.3


def _shuffle_probe(spark) -> float:
    sh = []
    for i in range(4):
        t0 = time.time()
        spark.range(0, 2_000_000).selectExpr("id % 1024 as k").groupBy(
            "k"
        ).count().selectExpr("bit_xor(count) h").collect()
        if i:
            sh.append(time.time() - t0)
    return round(min(sh), 3)


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BASELINE_SELF.json")) as fh:
        base_doc = json.load(fh)
    base = base_doc["queries"]
    base_cal = (base_doc.get("calibration") or {}).get("shuffle_sec")

    spark = get_spark("stream-adjudicate")
    queries = entrymod.queries()
    # warm: JVM + Arrow workers + one throwaway drain so the
    # state-store provider and memory-sink machinery are hot
    queries["q6_forecast_revenue"](spark, SF_DIR).count()
    queries["stream_events_window"](spark, SF_DIR).count()
    cal = _shuffle_probe(spark)
    machine_scale = min(3.0, max(1.0, cal / base_cal)) if base_cal else 1.0

    r12_suite = {
        "stream_stream_join": 7.854,
        "stream_dedup_events": 3.25,
        "stream_user_totals": 3.014,
        "stream_cdc_scd2": 5.807,
    }

    out: dict[str, dict] = {}
    for name in MOVERS:
        fn = queries[name]
        runs = []
        for _ in range(4):  # first run = cold, dropped
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        iso = min(runs[1:])
        envelope = GATE_RATIO * base[name] * machine_scale + GATE_SLACK_SEC
        cleared = iso <= envelope
        out[name] = {
            "isolated_runs_sec": runs,
            "isolated_min_warm_sec": iso,
            "baseline_sec": base[name],
            "r12_suite_sec": r12_suite.get(name),
            "gate_envelope_sec": round(envelope, 3),
            "machine_scale": round(machine_scale, 3),
            "verdict": "noise_cleared" if cleared else "confirmed",
        }
        print(name, json.dumps(out[name]), flush=True)

    noise = sum(1 for v in out.values() if v["verdict"] == "noise_cleared")
    doc = {
        "question": "is the r12 streaming-tier bench move (+25% tier, "
                    "stream_stream_join 2.67->7.85s) a code regression "
                    "or suite-context noise on a 2.07x-slower host?",
        "method": "exclusive cold+min-of-3-warm per drain on a quiet "
                  "host, gate envelope = 1.25x baseline x machine_scale "
                  "+ 0.3s (the bench.py gate formula), shuffle-probe "
                  "scaled",
        "code_change_note": "git diff 7d5b76f..HEAD -- streaming/ is "
                            "empty — no streaming code changed in r12",
        "calibration_shuffle_sec": {"now": cal, "baseline": base_cal},
        "queries": out,
        "overall": f"{noise}/{len(out)} drains clear the gate envelope "
                   f"in isolation",
    }
    with open(os.path.join(here, "stream_adjudication.json"), "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps({"overall": doc["overall"]}))


if __name__ == "__main__":
    main()
