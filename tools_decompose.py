#!/usr/bin/env python
"""Per-job decomposition of one query (r14, guide §1): run the query
once (cold) and once (steady) via the noop sink, then dump every
Spark job that ran during the steady pass — submission time, wall,
stage count, task count, description — so the expensive phase of a
multi-job query is identifiable instead of guessed.

Usage: python tools_decompose.py <query> [<query>...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from etl_npl_pipeline_spark.session import get_spark  # noqa: E402


def _jobs(spark):
    store = spark._jsc.sc().statusStore()
    jvm = spark._jvm
    jl = store.jobsList(jvm.java.util.ArrayList())
    out = []
    for i in range(jl.size()):
        j = jl.apply(i)
        sub = j.submissionTime()
        comp = j.completionTime()

        def _ms(opt):
            return (
                opt.get().getTime() if opt.isDefined() else None
            )

        out.append(
            {
                "job_id": j.jobId(),
                "desc": (j.description().get() if j.description().isDefined() else "")[:80],
                "submitted_ms": _ms(sub),
                "completed_ms": _ms(comp),
                "n_stages": j.stageIds().size(),
                "n_tasks": j.numTasks(),
            }
        )
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("decompose")
    queries = entrymod.queries()
    queries["q6_forecast_revenue"](spark, sf_dir).count()
    from pyspark.sql.functions import pandas_udf as _pudf

    _warm = _pudf(lambda s: s, "long")
    spark.range(10).select(_warm("id")).count()

    for name in sys.argv[1:]:
        fn = queries[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = time.time() - t0
        before = {j["job_id"] for j in _jobs(spark)}
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        steady = time.time() - t0
        after = _jobs(spark)
        new = sorted(
            (j for j in after if j["job_id"] not in before),
            key=lambda j: j["job_id"],
        )
        gaps = []
        prev_end = None
        for j in new:
            if j["submitted_ms"] is None or j["completed_ms"] is None:
                continue
            if prev_end is not None:
                gaps.append(round((j["submitted_ms"] - prev_end) / 1000.0, 3))
            j["wall_sec"] = round(
                (j["completed_ms"] - j["submitted_ms"]) / 1000.0, 3
            )
            prev_end = j["completed_ms"]
        print(
            f"=== {name}: cold {cold:.2f}s steady {steady:.2f}s "
            f"jobs={len(new)} job_wall_sum="
            f"{sum(j.get('wall_sec', 0) for j in new):.2f}s "
            f"inter_job_gaps_sum={sum(gaps):.2f}s"
        )
        for j in new:
            print(
                f"  job {j['job_id']:>5} {j.get('wall_sec', '?'):>7}s "
                f"stages={j['n_stages']:>3} tasks={j['n_tasks']:>5} "
                f"{j['desc']}"
            )


if __name__ == "__main__":
    main()
