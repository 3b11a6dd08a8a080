"""L72b graph_label_prop_indexed (r12, VERDICT r11 #1): the
index-served kNN graph must EQUAL the exact brute-force graph on the
planted-grid fixture — that equality is the whole determinism
argument behind its DuckDB oracle (exact copies co-locate in one IVF
cell, cos 1.0 beats every cross-group score, so n_probe=1 top-(c-1)
is the complete within-group graph).

Pins, from strongest to weakest:
1. served edges == brute_force_topk edges on the same grid corpus
   (the composition-level equivalence the oracle relies on);
2. served edges == the id-arithmetic group graph (what the oracle
   actually replays);
3. report semantics: groups whose seed residue exists converge to
   the diagonal, seedless groups (vec_id % 5 == 2 bases) stay -1.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from etl_npl_pipeline_spark.operators import similarity as S
from etl_npl_pipeline_spark.operators.ann_index import (
    build_ann_index,
    ivf_query,
)
from etl_npl_pipeline_spark.plans import llmdata


def _grid_corpus(spark, sf_dir):
    emb = llmdata._emb(spark, sf_dir)
    return emb.select(
        "vec_id",
        "embedding",
        "label",
        F.explode(
            F.sequence(F.lit(0), F.lit(llmdata.LP_GRID_COPIES - 1))
        ).alias("j"),
    ).select(
        (
            F.col("vec_id") * llmdata.LP_GRID_STRIDE + F.col("j")
        ).alias("vec_id"),
        "embedding",
        "label",
    )


def _served_edges(spark, sf_dir):
    corpus = _grid_corpus(spark, sf_dir)
    n = llmdata._emb(spark, sf_dir).count()
    n_clusters = max(
        llmdata.SEMDEDUP_CLUSTERS,
        -(-(n * llmdata.LP_GRID_COPIES) // llmdata.SEMDEDUP_TARGET_CELL),
    )
    idx = build_ann_index(
        spark,
        corpus,
        os.path.realpath(sf_dir.rstrip("/")) + "#lp-grid",
        n_clusters=n_clusters,
        pq_m=llmdata.PQ_KNOBS["m_subspaces"],
        pq_k=llmdata.PQ_KNOBS["k_codes"],
        lsh_planes=llmdata.LSH_KNOBS["n_planes"],
        lsh_tables=llmdata.LSH_KNOBS["n_tables"],
    )
    served = ivf_query(
        spark, idx, corpus, k=llmdata.LP_GRID_COPIES - 1, n_probe=1
    )
    return {
        (r["query_id"], r["neighbor_id"]) for r in served.collect()
    }


def test_served_graph_equals_brute_force(spark, sf_dir):
    corpus = _grid_corpus(spark, sf_dir)
    exact = S.brute_force_topk(
        corpus, corpus, k=llmdata.LP_GRID_COPIES - 1
    )
    exact_edges = {
        (r["query_id"], r["neighbor_id"]) for r in exact.collect()
    }
    assert _served_edges(spark, sf_dir) == exact_edges


def test_served_graph_is_the_group_graph(spark, sf_dir):
    emb_ids = [
        r["vec_id"] for r in llmdata._emb(spark, sf_dir)
        .select("vec_id").collect()
    ]
    c, s = llmdata.LP_GRID_COPIES, llmdata.LP_GRID_STRIDE
    want = {
        (v * s + a, v * s + b)
        for v in emb_ids
        for a in range(c)
        for b in range(c)
        if a != b
    }
    assert _served_edges(spark, sf_dir) == want


def test_confusion_matrix_group_semantics(spark, sf_dir):
    rows = llmdata.graph_label_prop_indexed(spark, sf_dir).collect()
    emb = llmdata._emb(spark, sf_dir).collect()
    c, s, m = (
        llmdata.LP_GRID_COPIES,
        llmdata.LP_GRID_STRIDE,
        llmdata.LP_SEED_MOD,
    )
    # every group with a seed residue converges to its true label;
    # a group is seedless iff no j in [0, c) has (v*s + j) % m == 0
    exp: dict[tuple[int, int], int] = {}
    for r in emb:
        v, lab = r["vec_id"], r["label"]
        seeded = any((v * s + j) % m == 0 for j in range(c))
        key = (lab, lab if seeded else -1)
        exp[key] = exp.get(key, 0) + c
    got = {(r["true_label"], r["pred_label"]): r["n"] for r in rows}
    assert got == exp


def test_base_embeddings_have_no_cross_group_cos_ties(spark, sf_dir):
    """Fixture precondition behind the oracle (ADVICE r12): the
    served kNN tie-breaks by neighbor_id ACROSS groups, while the
    DuckDB oracle replays the id-arithmetic WITHIN-group graph. The
    two agree only because no cross-group pair ties the within-group
    cos of exactly 1.0 — i.e. the base embeddings are pairwise
    distinct after normalization. Pin max cross-base cos < 1.0 so a
    future fixture regen with duplicate (or colinear) vectors fails
    HERE instead of silently diverging in the driver window."""
    emb = llmdata._emb(spark, sf_dir).select("vec_id", "embedding")
    top1 = S.brute_force_topk(emb, emb, k=1)
    max_cos = top1.agg(F.max("cos_sim").alias("m")).collect()[0]["m"]
    assert max_cos < 1.0 - 1e-12, (
        f"duplicate/colinear base embeddings (max cross cos={max_cos}) "
        "break the L72b oracle's no-cross-group-tie invariant"
    )
