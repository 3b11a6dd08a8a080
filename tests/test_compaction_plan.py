"""L81 data_compaction_plan semantics beyond oracle parity: only
small files are planned, every eligible file lands in exactly one
task, and task ids are dense per source."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_npl_pipeline_spark.plans import llmdata
from etl_npl_pipeline_spark.sources.tables import load_table


def _files(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            (F.col("doc_id") % llmdata.CP_N_FILES).alias("file_id"),
            F.col("n_chars").alias("nb"),
        )
        .groupBy("source", "file_id")
        .agg(F.sum("nb").alias("bytes"))
    )


def test_plan_covers_exactly_the_small_files(spark, sf_dir):
    plan = llmdata.data_compaction_plan(spark, sf_dir)
    files = _files(spark, sf_dir)
    stats = files.groupBy("source").agg(
        (F.sum("bytes").cast("double") / F.count(F.lit(1))).alias("avg_b")
    )
    eligible = (
        files.join(stats, "source")
        .where(F.col("bytes").cast("double") < F.col("avg_b"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("bytes").alias("b"),
        )
        .collect()
    )
    got = {
        r["source"]: (r["nf"], r["bi"])
        for r in plan.groupBy("source")
        .agg(F.sum("n_files").alias("nf"), F.sum("bytes_in").alias("bi"))
        .collect()
    }
    want = {r["source"]: (r["n"], r["b"]) for r in eligible}
    assert got == want
    # big files exist and are left alone (the planner is non-trivial)
    n_all = files.count()
    n_planned = sum(v[0] for v in got.values())
    assert 0 < n_planned < n_all


def test_task_ids_dense_per_source(spark, sf_dir):
    plan = llmdata.data_compaction_plan(spark, sf_dir).collect()
    by_src = {}
    for r in plan:
        by_src.setdefault(r["source"], []).append(r["task_id"])
    for src, ids in by_src.items():
        assert sorted(ids) == list(range(len(ids))), src
