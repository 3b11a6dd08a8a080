#!/usr/bin/env python
"""Fresh-process cold-JVM A/B probe (r14, VERDICT r13 item #1).

Runs the named queries ONCE cold + ONCE steady in THIS process
(same warm-up discipline as bench.py: one trivial count + one
pandas_udf spin-up) and prints one JSON line with both timings.
The orchestrating shell runs this N times per code version (repo
checkout supplied via PYTHONPATH/cwd) and takes the min — the
cold-JVM, fresh-process, min-of-N methodology the r13 VERDICT
requires for adjudicating the driver-measured regressions on
touched paths (ann_compacted_query, stream_index_refresh, the
containment/jaccard family).

Usage: python tools_ab_probe.py q1 q2 ... [--sf-dir DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from etl_npl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for a in sys.argv[1:]:
        if a.startswith("--sf-dir="):
            sf_dir = a.split("=", 1)[1]
    spark = get_spark("ab-probe")
    queries = entrymod.queries()

    # same warm-up as bench.py so query #1 doesn't pay session start
    queries["q6_forecast_revenue"](spark, sf_dir).count()
    from pyspark.sql.functions import pandas_udf as _pudf

    _warm = _pudf(lambda s: s, "long")
    spark.range(10).select(_warm("id")).count()

    out: dict[str, dict] = {}
    for name in args:
        fn = queries[name]
        runs = []
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        out[name] = {"cold": runs[0], "steady": runs[1]}
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
