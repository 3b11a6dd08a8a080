"""Publish the ann_pq knob grid: (m_subspaces x k_codes x
rerank_factor) -> recall@5 + wall-clock at $SPARK_GRAFT_SF_DIR,
against the exact brute-force baseline. Writes pq_sweep.json, which
bench.py republishes into bench_detail.json so the chosen PQ_KNOBS
always sit next to the grid that justified them."""

from __future__ import annotations

import json
import os
import time

from etl_npl_pipeline_spark.operators.pq import pq_topk
from etl_npl_pipeline_spark.plans import llmdata
from etl_npl_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("pq-sweep")
    import pyspark.sql.functions as F

    emb = llmdata._emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < llmdata.ANN_N_QUERIES)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in llmdata.ann_topk(spark, sf_dir).collect()
    }
    grid = []
    for k_codes in (16, 32):
        for rf in (8, 16, 24):
            t0 = time.time()
            got = {
                (r["query_id"], r["neighbor_id"])
                for r in pq_topk(
                    queries,
                    emb,
                    k=llmdata.ANN_K,
                    m_subspaces=16,
                    k_codes=k_codes,
                    rerank_factor=rf,
                ).collect()
            }
            grid.append(
                {
                    "m_subspaces": 16,
                    "k_codes": k_codes,
                    "rerank_factor": rf,
                    "recall_at_5": round(len(exact & got) / len(exact), 4),
                    "sec": round(time.time() - t0, 3),
                }
            )
            print(grid[-1])
    out = {
        "sf_dir": sf_dir,
        "baseline": "ann_topk exact brute force",
        "pick_rule": "cheapest with recall_at_5 >= 0.95 "
        "(code resolution binds before rerank depth)",
        "grid": grid,
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "pq_sweep.json"),
        "w",
    ) as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
