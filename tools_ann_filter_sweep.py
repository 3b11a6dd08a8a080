#!/usr/bin/env python
"""Selectivity sweep for metadata-filtered ANN search (VERDICT r12
#2): measure that candidate work SHRINKS with filter selectivity on
all three persisted-index query paths (ivf / pq / lsh).

For each selectivity s in {1%, 10%, 50%} the allowed set is the
deterministic slice ``vec_id % 100 < s*100``; each path runs with its
serving knobs (ivf n_probe, pq rerank_factor, lsh planes/tables from
the published KNOBS) against the shared persisted index at
$SPARK_GRAFT_SF_DIR. Published per (path, selectivity):

* candidate_rows — the algorithm-defined candidate volume, computed
  from the SAME artifacts the operator scans (ivf: allowed postings
  in each query's probed cells; pq: |allowed codes| x |Q|, the ADC
  matmul's row count; lsh: distinct (query, neighbor) pairs from the
  filtered postings probe join);
* shuffle_mb / wall_sec of the real filtered query (steady, 2nd run).

The claim under test: candidate_rows at 1% << 10% << 50% << unfiltered
— i.e. the pushdown does the work-shrinking a pre-filter promises,
rather than post-filtering a full ranking. Writes
ann_filter_sweep.json; bench.py republishes it into bench_detail.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F  # noqa: E402

from etl_npl_pipeline_spark.metrics import run_with_metrics  # noqa: E402
from etl_npl_pipeline_spark.operators.ann_index import (  # noqa: E402
    _read_artifact,
    ivf_query,
    lsh_query,
    pq_query,
)
from etl_npl_pipeline_spark.plans import llmdata  # noqa: E402
from etl_npl_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SELECTIVITIES = [0.01, 0.10, 0.50, 1.00]  # 1.00 = unfiltered reference


def main() -> None:
    spark = get_spark("ann-filter-sweep")
    idx = llmdata._ann_index(spark, SF_DIR)
    emb = llmdata._emb(spark, SF_DIR)
    queries = emb.where(F.col("vec_id") < llmdata.ANN_N_QUERIES)
    n_q = queries.count()

    # per-query probed cells (same centroid assignment the operator
    # computes) — reused to count ivf candidate postings per filter
    cents = _read_artifact(spark, idx, "ivf_centroids")
    n_probe = llmdata.IVF_KNOBS["n_probe"]
    # warm the index read + Arrow workers
    ivf_query(spark, idx, queries, k=1, n_probe=n_probe).count()

    out: dict[str, dict] = {}
    for sel in SELECTIVITIES:
        allowed = emb.where(
            (F.col("vec_id") % 100) < int(sel * 100)
        ).select(F.col("vec_id").alias("neighbor_id"))
        n_allowed = allowed.count()
        key = f"{int(sel * 100)}pct"
        entry: dict[str, dict] = {"n_allowed": n_allowed}

        aid = None if sel == 1.0 else allowed

        # --- ivf: candidates = allowed postings in probed cells
        from etl_npl_pipeline_spark.operators.ann_index import (
            _vectors as _vecs,
        )

        vec = _vecs(spark, idx)
        if aid is not None:
            vec = vec.join(aid, "neighbor_id", "left_semi")
        # probe cells exactly as the operator: nearest n_probe
        # centroids per query (rebuilt here with the same UDF shape)
        crows = sorted(
            cents.collect(), key=lambda r: r["cell"]
        )
        import numpy as np

        cmat = np.array([r["centroid"] for r in crows])
        qrows = queries.select("vec_id", "embedding").collect()
        qv = np.array([r["embedding"] for r in qrows], dtype=np.float64)
        qv = qv / np.maximum(
            np.linalg.norm(qv, axis=1, keepdims=True), 1e-12
        )
        d = ((qv[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
        probe_cells = np.argsort(d, axis=1)[:, :n_probe]
        cell_sizes = {
            r["cell"]: r["n"]
            for r in vec.groupBy("cell").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        ivf_cand = int(
            sum(
                cell_sizes.get(int(c), 0)
                for row in probe_cells
                for c in row
            )
        )

        def _steady(fn):
            fn()  # cold
            return run_with_metrics(spark, fn)

        m = _steady(
            lambda: ivf_query(
                spark, idx, queries, k=llmdata.ANN_K,
                n_probe=n_probe, allowed_ids=aid,
            ).write.format("noop").mode("overwrite").save()
        )
        entry["ivf"] = {
            "candidate_rows": ivf_cand,
            "wall_sec": m["wall_sec"],
            "shuffle_mb": round(m["shuffle_write_bytes"] / 1e6, 3),
        }

        # --- pq: ADC work = |allowed codes| x |Q|
        codes = _read_artifact(spark, idx, "pq_codes")
        if aid is not None:
            codes = codes.join(aid, "neighbor_id", "left_semi")
        n_codes = codes.count()
        m = _steady(
            lambda: pq_query(
                spark, idx, queries, k=llmdata.ANN_K,
                rerank_factor=llmdata.PQ_KNOBS["rerank_factor"],
                allowed_ids=aid,
            ).write.format("noop").mode("overwrite").save()
        )
        entry["pq"] = {
            "candidate_rows": int(n_codes * n_q),
            "wall_sec": m["wall_sec"],
            "shuffle_mb": round(m["shuffle_write_bytes"] / 1e6, 3),
        }

        # --- lsh: distinct candidate pairs from filtered postings
        kn = llmdata.LSH_KNOBS
        buckets = _read_artifact(spark, idx, "lsh_buckets")
        if aid is not None:
            buckets = buckets.join(aid, "neighbor_id", "left_semi")
        from etl_npl_pipeline_spark.operators.ann_index import (
            _lsh_table_signatures,
        )

        sig_udf = _lsh_table_signatures(kn["n_planes"], kn["n_tables"])
        q_sig = queries.select(
            F.col("vec_id").alias("query_id"),
            sig_udf(F.col("embedding")).alias("sigs"),
        ).select("query_id", F.posexplode("sigs").alias("t", "sig"))
        probes = [F.col("sig")] + [
            F.col("sig").bitwiseXOR(F.lit(1 << b))
            for b in range(kn["n_planes"])
        ]
        q_idx = q_sig.select(
            "query_id", "t", F.explode(F.array(*probes)).alias("sig")
        )
        lsh_cand = (
            q_idx.join(buckets, ["t", "sig"])
            .where(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id")
            .distinct()
            .count()
        )
        m = _steady(
            lambda: lsh_query(
                spark, idx, queries, k=llmdata.ANN_K,
                n_planes=kn["n_planes"], n_tables=kn["n_tables"],
                allowed_ids=aid,
            ).write.format("noop").mode("overwrite").save()
        )
        entry["lsh"] = {
            "candidate_rows": int(lsh_cand),
            "wall_sec": m["wall_sec"],
            "shuffle_mb": round(m["shuffle_write_bytes"] / 1e6, 3),
        }
        out[key] = entry
        print(key, json.dumps(entry), flush=True)

    doc = {
        "question": "does allowed_ids pre-filtering shrink candidate "
                    "work with selectivity on every index path?",
        "method": "allowed = vec_id % 100 < s; candidate volume "
                  "computed from the same persisted artifacts the "
                  "operators scan; wall/shuffle from the real filtered "
                  "query (steady 2nd run, noop sink)",
        "sf_dir": SF_DIR,
        "n_queries": n_q,
        "knobs": {
            "ivf_n_probe": n_probe,
            "pq_rerank_factor": llmdata.PQ_KNOBS["rerank_factor"],
            "lsh": llmdata.LSH_KNOBS,
        },
        "selectivities": out,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "ann_filter_sweep.json"), "w") as fh:
        json.dump(doc, fh, indent=1)
    shrink = all(
        out["1pct"][p]["candidate_rows"]
        < out["10pct"][p]["candidate_rows"]
        < out["50pct"][p]["candidate_rows"]
        <= out["100pct"][p]["candidate_rows"]
        for p in ("ivf", "pq", "lsh")
    )
    print(json.dumps({"candidate_work_shrinks_with_selectivity": shrink}))


if __name__ == "__main__":
    main()
