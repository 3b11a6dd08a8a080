#!/usr/bin/env python
"""Capture .explain('formatted') output + physical metrics for the
named queries at $SPARK_GRAFT_SF_DIR, writing plans/r13/<q>_<tag>.txt.

Usage: python tools_capture_plans.py <tag> <query> [<query> ...]
       python tools_capture_plans.py <tag> --timed <query> ...

Plans go to plans/r13/; with --timed each query is also executed
twice via the noop sink (steady 2nd-run wall + shuffle bytes printed
as one JSON line per query). Streaming-drain queries execute their
drain at plan-construction time — capturing their plan is already an
execution, so their numbers are wall-only."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from etl_npl_pipeline_spark.session import get_spark
from etl_npl_pipeline_spark.metrics import run_with_metrics

def main():
    args = sys.argv[1:]
    tag = args.pop(0)
    timed = "--timed" in args
    args = [a for a in args if a != "--timed"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-capture")
    qs = entrymod.queries()
    outdir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_DIR", "r14"),
    )
    os.makedirs(outdir, exist_ok=True)
    for name in args:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"capture:{name}")
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        rec = {"query": name, "tag": tag}
        if timed:
            m1 = run_with_metrics(spark, lambda: fn(spark, sf_dir)
                                  .write.format("noop").mode("overwrite").save())
            m2 = run_with_metrics(spark, lambda: fn(spark, sf_dir)
                                  .write.format("noop").mode("overwrite").save())
            rec.update(cold=m1["wall_sec"], steady=m2["wall_sec"],
                       shuffle_mb=round(m2["shuffle_write_bytes"]/1e6, 3),
                       input_mb=round(m2["input_bytes"]/1e6, 3),
                       spill=m2["memory_spill_bytes"]+m2["disk_spill_bytes"],
                       tasks=m2["num_tasks"], stages=m2["stages"])
        print("PLANCAP " + json.dumps(rec), flush=True)
        spark.sparkContext.setJobDescription(None)

if __name__ == "__main__":
    main()
