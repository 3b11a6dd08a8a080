#!/usr/bin/env python
"""Containment bottom-k candidate-volume ledger (VERDICT r12 #4,
closing the r11 #6 loop): measure — don't assert — that
``containment_bottomk_pairs`` (L74b) replaces ``containment_pairs``'
Θ(Σ df²) posting-pair volume with a probe volume bounded by k·N·cap.

Per scale (sf0.1, sf1; sf10 when present):

* exact_posting_pairs — Σ_{shingle, df>=2} C(df,2): the rows the
  exact path's posting self-join materializes before grouping (its
  quadratic term, after the stop-shingle cap);
* bottomk_probe_rows — k·N_docs bound and the MEASURED probe-join
  rows Σ_{probed shingle} df (the sketch path's only corpus-sized
  join);
* bottomk_candidates — pairs surviving the estimate cut (what the
  exact verify re-scores) and verify_rows — the verify join's
  posting rows, restricted to those candidates;
* recall cross-check — both paths' final emitted pair sets are equal
  on the planted fixture (the oracle already pins this at sf0.01;
  the ledger re-pins it at each measured scale).

Writes containment_ledger.json; bench.py republishes it into
bench_detail. The SURVEY §6 row cites the measured ratio.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from etl_npl_pipeline_spark.operators import dedup as D  # noqa: E402
from etl_npl_pipeline_spark.plans import llmdata  # noqa: E402
from etl_npl_pipeline_spark.session import get_spark  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
SF_DIRS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": os.path.join(HERE, ".tmp", "sf1"),
    "sf10": os.path.join(HERE, ".tmp", "sf10"),
}


def _corpus(spark, sf_dir):
    docs = llmdata._docs(spark, sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    snips = docs.where(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + llmdata.SNIPPET_ID_OFFSET).alias("doc_id"),
        F.concat_ws(" ", F.slice(toks, 1, llmdata.SNIPPET_TOKENS)).alias(
            "text"
        ),
    )
    return docs.select("doc_id", "text").unionByName(snips)


def main() -> None:
    spark = get_spark("containment-ledger")
    # volume counting, not benchmarking: Catalyst's size estimate
    # through localCheckpoint undercounts and tries to broadcast a
    # GiB-scale posting relation (measured OOM at first run) — force
    # shuffle joins for the ledger's counting plans
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
    )
    k = D.BOTTOMK_K
    cap = llmdata.MAX_SHINGLE_FREQ
    out: dict[str, dict] = {}
    for sf_name, sf_dir in SF_DIRS.items():
        if not os.path.isdir(sf_dir):
            print(f"skip {sf_name}", file=sys.stderr)
            continue
        corpus = _corpus(spark, sf_dir)
        n_docs = corpus.count()
        sh = D._exploded_shingles(corpus, "text", "doc_id", 3)
        wfreq = Window.partitionBy("shingle")
        sh = sh.withColumn("df_", F.count(F.lit(1)).over(wfreq))
        sh = sh.where(F.col("df_") <= cap)
        sh = sh.select("doc", "shingle", "df_").localCheckpoint(
            eager=False
        )

        # exact path: posting self-join volume = sum C(df,2)
        dfs = sh.groupBy("shingle").agg(
            F.count(F.lit(1)).alias("df")
        )
        exact_pairs = dfs.where(F.col("df") >= 2).agg(
            F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("p")
        ).collect()[0]["p"]
        print(sf_name, "exact_posting_pairs", int(exact_pairs),
              flush=True)

        # sketch path: probe rows = sum over probed shingles of df
        wdoc = Window.partitionBy("doc").orderBy(
            F.md5("shingle").asc(), F.col("shingle").asc()
        )
        probes = (
            sh.withColumn("rn", F.row_number().over(wdoc))
            .where(F.col("rn") <= k)
            .select(F.col("doc").alias("src"), "shingle")
        )
        probe_rows = probes.join(
            sh.select(F.col("doc").alias("dst"), "shingle"), "shingle"
        ).where(F.col("src") != F.col("dst")).count()
        print(sf_name, "probe_rows", probe_rows, flush=True)

        # candidates surviving the estimate cut + verify volume
        sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
        hits = (
            probes.join(
                sh.select(F.col("doc").alias("dst"), "shingle"),
                "shingle",
            )
            .where(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("h"))
        )
        est = hits.join(
            sizes.select(F.col("doc").alias("src"), "n_sh"), "src"
        ).select(
            "src",
            "dst",
            (F.col("h") / F.least(F.lit(k), F.col("n_sh"))).alias("e"),
        )
        cand = (
            est.where(F.col("e") >= llmdata.CONTAINMENT_THRESHOLD)
            .select(
                F.least("src", "dst").alias("doc_a"),
                F.greatest("src", "dst").alias("doc_b"),
            )
            .distinct()
        )
        n_cand = cand.count()
        verify_rows = (
            cand.join(
                sh.select(F.col("doc").alias("doc_a"), "shingle"),
                "doc_a",
            )
            .join(
                sh.select(F.col("doc").alias("doc_b"), "shingle"),
                ["doc_b", "shingle"],
            )
            .count()
        )

        # final-result equality at this scale — but the EXACT path at
        # sf10 is the very quadratic this ledger exists to retire
        # ("sf10 if cheap": it is not); sf10 publishes volumes only
        if sf_name == "sf10":
            exact_out = sketch_out = None
        else:
            exact_out = {
                (r["doc_a"], r["doc_b"])
                for r in D.containment_pairs(
                    corpus, "text", "doc_id", n=3,
                    threshold=llmdata.CONTAINMENT_THRESHOLD,
                    max_shingle_freq=cap,
                ).collect()
            }
            sketch_out = {
                (r["doc_a"], r["doc_b"])
                for r in D.containment_bottomk_pairs(
                    corpus, "text", "doc_id", n=3,
                    threshold=llmdata.CONTAINMENT_THRESHOLD,
                    k=k, max_shingle_freq=cap,
                ).collect()
            }
        entry = {
            "n_docs": n_docs,
            "exact_posting_pairs": int(exact_pairs),
            "bottomk_probe_bound_kN": k * n_docs,
            "bottomk_probe_rows_measured": int(probe_rows),
            "bottomk_candidates": int(n_cand),
            "bottomk_verify_rows": int(verify_rows),
            "pair_volume_ratio_exact_over_sketch": round(
                exact_pairs / max(1, probe_rows + verify_rows), 2
            ),
            "same_final_pairs": (
                None if exact_out is None else sketch_out == exact_out
            ),
            "n_final_pairs": (
                None if exact_out is None else len(exact_out)
            ),
            "sketch_missed": (
                None if exact_out is None else len(exact_out - sketch_out)
            ),
            "sketch_extra": (
                None if exact_out is None else len(sketch_out - exact_out)
            ),
        }
        out[sf_name] = entry
        print(sf_name, json.dumps(entry), flush=True)

    doc = {
        "question": "does bottom-k containment's probe volume replace "
                    "the exact path's quadratic posting pairs?",
        "method": "exact volume = sum C(df,2) over capped postings; "
                  "sketch volume = measured probe-join rows + verify "
                  "rows; final pair sets compared per scale",
        "knobs": {"k": D.BOTTOMK_K, "max_shingle_freq":
                  llmdata.MAX_SHINGLE_FREQ,
                  "threshold": llmdata.CONTAINMENT_THRESHOLD},
        "scales": out,
    }
    with open(os.path.join(HERE, "containment_ledger.json"), "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps({"scales": list(out)}))


if __name__ == "__main__":
    main()
