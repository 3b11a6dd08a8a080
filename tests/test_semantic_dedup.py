"""Quality pins for dedup_semantic (SemDeDup cluster-blocked cosine).

The cluster blocking is the approximation: a pair is only visible if
both vectors land in the same k-means cell. That assumption is about
NEAR-IDENTICAL pairs (the SemDeDup use case) — the synthetic sf
embeddings have no such pairs (max pairwise cosine ~0.48), so recall
there is measured against planted duplicates in a controlled fixture,
and the sf data pins the no-false-positive / determinism properties.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from etl_npl_pipeline_spark.operators import similarity as S
from etl_npl_pipeline_spark.plans.llmdata import (
    EMB_THRESHOLD,
    _emb,
    dedup_semantic,
    semantic_pairs,
)


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_semantic_recall_on_planted_dups(spark):
    """Plant 20 near-identical pairs (cosine >= 0.99) among 200
    random vectors: every planted pair must come back — for
    near-identical vectors the same-cell assumption is exact."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(200, 16))
    rows = [(i, base[i].tolist()) for i in range(200)]
    planted = set()
    for j in range(20):
        dup = base[j] + rng.normal(scale=1e-3, size=16)
        rows.append((1000 + j, dup.tolist()))
        planted.add((j, 1000 + j))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = _pairs(
        S.semantic_near_dups(df, n_clusters=4, threshold=0.99)
    )
    assert planted <= got, f"missed planted pairs: {planted - got}"


def test_semantic_no_false_positives(spark, sf_dir):
    """Blocked pairwise uses the exact cosine, so every emitted pair
    must also be in the exact all-pairs ground truth."""
    emb = _emb(spark, sf_dir)
    exact = _pairs(
        S.embedding_near_dups_blocked(
            emb.withColumn("__one", F.lit(0)),
            block_col="__one",
            threshold=EMB_THRESHOLD,
            max_block=1_000_000,
        )
    )
    got = _pairs(semantic_pairs(spark, sf_dir))
    assert got <= exact


def test_semantic_deterministic(spark, sf_dir):
    a = _pairs(semantic_pairs(spark, sf_dir))
    b = _pairs(semantic_pairs(spark, sf_dir))
    assert a == b


def test_semantic_oracle_form_booleans(spark, sf_dir):
    """The r8 oracle-backed form: every planted exact-copy pair is
    found and the JVM-side recheck clears every emitted pair."""
    rows = dedup_semantic(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r["planted_found"] for r in rows)
    assert all(r["fp_free"] for r in rows)


def test_semantic_degenerate_quantizer_quarantines(spark, sf_dir):
    """One cluster = one giant cell: the max_block quarantine must
    kick in (zero pairs), never an O(n^2) blow-up."""
    emb = _emb(spark, sf_dir)
    out = S.semantic_near_dups(
        emb, n_clusters=1, threshold=EMB_THRESHOLD, max_block=10
    )
    assert out.count() == 0
