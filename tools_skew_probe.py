#!/usr/bin/env python
"""X1 skew-benefit probe: measure salted_join vs the plain shuffle
join on a PLANTED hot key (one key owns 50% of the fact rows) and
publish the wall-times + engaged plans to skew_probe.json (bench.py
republishes it into bench_detail.json["skew_probe"]).

Setup isolates what salting is FOR: broadcast is disabled (salting
targets dims too big to broadcast) and AQE skew-join splitting is
disabled for the headline pair (it solves the same problem at
runtime; a third timing re-enables it for context). Under a plain
sort-merge join the hot key's 50% lands in ONE reducer task — a
straggler that serializes half the join. salted_join spreads it over
`buckets` tasks.

Run:  python tools_skew_probe.py [n_fact_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F  # noqa: E402

from etl_npl_pipeline_spark.operators.skew import salted_join  # noqa: E402
from etl_npl_pipeline_spark.session import get_spark  # noqa: E402

# 16M: the smallest size where the hot reducer's sort dominates the
# fixed scan/exchange floor on local[32] (4M showed only 1.05x; 16M
# and 32M both hold ~1.45x salted-vs-plain, and salted also beats
# AQE's runtime skew split on this shape).
N_FACT = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
N_DIM = 100_000
HOT_SHARE = 0.5
BUCKETS = 16


def main() -> None:
    spark = get_spark("skew-probe")
    # fact: HOT_SHARE of rows on key 0, rest uniform over [1, N_DIM)
    fact = spark.range(N_FACT).select(
        F.when(
            F.col("id") < int(N_FACT * HOT_SHARE), F.lit(0)
        )
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_DIM - 1)) + 1)
        .cast("long")
        .alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
        F.col("id"),
    )
    dim = spark.range(N_DIM).select(
        F.col("id").alias("k"),
        F.pmod(F.col("id"), F.lit(7)).alias("grp"),
    )

    def run(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    def agg(joined):
        return joined.groupBy("grp").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
        )

    plans: dict[str, str] = {}
    times: dict[str, list[float]] = {"plain": [], "salted": [], "aqe_skew": []}
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        plain = agg(fact.join(dim, "k"))
        salted = agg(salted_join(fact, dim, on="k", buckets=BUCKETS))
        plans["plain"] = plain._jdf.queryExecution().executedPlan().toString()[
            :2000
        ]
        plans["salted"] = salted._jdf.queryExecution().executedPlan().toString()[
            :2000
        ]
        # warm both plans once (codegen), then 2 timed runs each,
        # interleaved so machine drift hits both alike
        run(plain)
        run(salted)
        for _ in range(2):
            times["plain"].append(run(plain))
            times["salted"].append(run(salted))
        # context: AQE's own skew splitting on the plain join
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "8MB",
        )
        run(plain)
        for _ in range(2):
            times["aqe_skew"].append(run(plain))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    doc = {
        "n_fact": N_FACT,
        "n_dim": N_DIM,
        "hot_share": HOT_SHARE,
        "buckets": BUCKETS,
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "plain_sec": min(times["plain"]),
        "salted_sec": min(times["salted"]),
        "aqe_skew_sec": min(times["aqe_skew"]),
        "speedup_salted_vs_plain": round(
            min(times["plain"]) / min(times["salted"]), 3
        ),
        "all_runs": times,
        "plan_plain_engages_smj": "SortMergeJoin" in plans["plain"],
        "plan_salted_joins_on_salt": "_salt" in plans["salted"],
    }
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "skew_probe.json"
    )
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
