"""L80 emb_kmeans invariants beyond the oracle parity test:
determinism across runs, seed movement, exact-partition sizes, and
the fixed-point argmin re-derived in numpy for the final round."""

from __future__ import annotations

import math

import numpy as np

from etl_npl_pipeline_spark.plans import llmdata


def _collect(spark, sf_dir):
    df = llmdata.emb_kmeans(spark, sf_dir)
    rows = df.collect()
    cents = {}
    sizes = {}
    for r in rows:
        cents.setdefault(r["k"], [0] * 64)[r["dim"]] = r["c"]
        sizes[r["k"]] = r["n_k"]
    return cents, sizes


def _quantized(spark, sf_dir):
    emb = llmdata._emb(spark, sf_dir).select("vec_id", "embedding")
    out = {}
    for r in emb.collect():
        out[r["vec_id"]] = np.array(
            [math.floor(v * 1e6 + 0.5) for v in r["embedding"]],
            dtype=np.int64,
        )
    return out

def test_kmeans_shape_and_sizes(spark, sf_dir):
    cents, sizes = _collect(spark, sf_dir)
    assert set(cents) == set(range(llmdata.KM_K))
    assert all(len(c) == 64 for c in cents.values())
    xq = _quantized(spark, sf_dir)
    # sizes are a partition of the corpus (no vector lost/duplicated)
    assert sum(sizes.values()) == len(xq)
    # on the real embeddings fixture no cluster collapses empty
    assert all(n > 0 for n in sizes.values())


def test_kmeans_deterministic(spark, sf_dir):
    a = llmdata.emb_kmeans(spark, sf_dir).collect()
    b = llmdata.emb_kmeans(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_kmeans_centroids_are_member_means(spark, sf_dir):
    """Re-derive the final round in numpy: assign every quantized
    vector to its nearest round-(R-1) centroid (exact integer L2,
    ties on cluster id) by replaying ALL rounds, then check the
    published centroids equal floor(mean+0.5) of the members and
    the sizes match."""
    cents, sizes = _collect(spark, sf_dir)
    xq = _quantized(spark, sf_dir)
    ids = sorted(xq)
    # replay from the same deterministic seed
    c = np.stack([xq[i] for i in ids[: llmdata.KM_K]]).astype(np.int64)
    for _ in range(llmdata.KM_ROUNDS):
        members = {k: [] for k in range(llmdata.KM_K)}
        for i in ids:
            d = ((xq[i][None, :] - c) ** 2).sum(axis=1)
            members[int(np.argmin(d))].append(i)  # argmin: lowest k wins ties
        nxt = c.copy()
        for k, mem in members.items():
            if mem:
                s = np.stack([xq[i] for i in mem]).sum(axis=0)
                nxt[k] = np.array(
                    [math.floor(v / len(mem) + 0.5) for v in s],
                    dtype=np.int64,
                )
        c = nxt
    for k in range(llmdata.KM_K):
        assert list(c[k]) == cents[k], f"centroid {k} mismatch"
        assert len(members[k]) == sizes[k], f"size {k} mismatch"
