"""Persisted ANN index lifecycle (operators/ann_index.py): build
once → query many, results bit-identical to the retrain-per-call
operators, artifacts sized exactly by |corpus| x knobs."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from etl_npl_pipeline_spark.operators import ann_index as AI
from etl_npl_pipeline_spark.plans import llmdata as L


def _queries(spark, sf_dir):
    emb = L._emb(spark, sf_dir)
    return emb, emb.where(F.col("vec_id") < L.ANN_N_QUERIES)


def test_build_materializes_all_artifacts(spark, sf_dir):
    idx = L._ann_index(spark, sf_dir)
    for name in AI.ARTIFACTS:
        assert os.path.isdir(os.path.join(idx, name)), name
    n = L._emb(spark, sf_dir).count()
    stats = {r.artifact: r.n_rows for r in AI.index_stats(spark, idx).collect()}
    assert stats == {
        "ivf_centroids": L.IVF_KNOBS["n_clusters"],
        "lsh_buckets": n * L.LSH_KNOBS["n_tables"],
        "pq_codebooks": L.PQ_KNOBS["m_subspaces"] * L.PQ_KNOBS["k_codes"],
        "pq_codes": n,
        "vectors": n,
    }


def test_build_is_cached_per_process(spark, sf_dir):
    a = L._ann_index(spark, sf_dir)
    b = L._ann_index(spark, sf_dir)
    assert a == b  # second call is a dict hit, no retrain


def test_index_served_results_match_retrain_path(spark, sf_dir):
    """The lifecycle split must not change a single emitted row:
    same seeds + persisted doubles round-trip exactly, so the
    index-served ivf/pq/lsh top-k equals the legacy per-call
    operators bit-for-bit."""
    from etl_npl_pipeline_spark.operators.ivf import ivf_topk
    from etl_npl_pipeline_spark.operators.pq import pq_topk
    from etl_npl_pipeline_spark.operators.similarity import lsh_topk_multi

    emb, queries = _queries(spark, sf_dir)
    pairs = [
        (L.ann_ivf, lambda: ivf_topk(queries, emb, k=L.ANN_K, **L.IVF_KNOBS)),
        (L.ann_pq, lambda: pq_topk(queries, emb, k=L.ANN_K, **L.PQ_KNOBS)),
        (
            L.ann_lsh,
            lambda: lsh_topk_multi(queries, emb, k=L.ANN_K, **L.LSH_KNOBS),
        ),
    ]
    for served, legacy in pairs:
        got = [tuple(r) for r in served(spark, sf_dir).collect()]
        want = [
            tuple(r)
            for r in legacy().orderBy("query_id", "rank").collect()
        ]
        assert got == want


def test_knob_change_rebuilds_distinct_index(spark, sf_dir):
    emb = L._emb(spark, sf_dir)
    key = os.path.realpath(sf_dir)
    a = AI.build_ann_index(spark, emb, key, n_clusters=4, lsh_tables=2)
    b = AI.build_ann_index(spark, emb, key, n_clusters=6, lsh_tables=2)
    assert a != b
    stats_a = {
        r.artifact: r.n_rows for r in AI.index_stats(spark, a).collect()
    }
    assert stats_a["ivf_centroids"] == 4
    assert stats_a["lsh_buckets"] == emb.count() * 2
