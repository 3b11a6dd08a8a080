"""L79 text_quality_probe invariants (r13): the oracle hash proves
engine agreement; these pin that the probe LEARNED something.

* shape: 5 weight rows + train_mse, deterministic across reruns;
* the fitted probe beats the zero model: train_mse < E[y'^2]
  (the mse GD starts from at w=0) by a real margin;
* the GD trajectory is reproducible from the published sufficient
  statistics: re-deriving the weights in pure Python from the same
  exact-integer moments yields the identical values (the oracle
  does this in SQL; this test does it in-process, so a moment
  mismatch and a GD mismatch are distinguishable).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from etl_npl_pipeline_spark.operators import text as T
from etl_npl_pipeline_spark.plans import llmdata


def _moments(spark, sf_dir):
    docs = llmdata._docs(spark, sf_dir)
    feats = T.quality_features("text")
    n_digits = F.length("text") - F.length(
        F.regexp_replace("text", "[0-9]", "")
    )
    d = docs.select(
        F.lit(1).cast("long").alias("f0"),
        feats["n_words"].cast("long").alias("f1"),
        feats["stop_hits"].cast("long").alias("f2"),
        feats["n_chars"].cast("long").alias("f3"),
        n_digits.cast("long").alias("f4"),
        (
            F.when(feats["len_band"] == 1, F.lit(40)).otherwise(F.lit(0))
            + F.lit(3) * F.least(feats["stop_hits"], F.lit(10))
            + F.when(
                F.lit(5) * n_digits <= feats["n_chars"], F.lit(20)
            ).otherwise(F.lit(0))
        ).cast("long").alias("y"),
    )
    aggs = [
        F.sum(F.col(f"f{i}") * F.col(f"f{j}")).alias(f"s{i}{j}")
        for i in range(5) for j in range(i, 5)
    ] + [
        F.sum(F.col(f"f{i}") * F.col("y")).alias(f"b{i}")
        for i in range(5)
    ] + [F.sum(F.col("y") * F.col("y")).alias("ysq"),
         F.count(F.lit(1)).alias("n")]
    return d.agg(*aggs).collect()[0]


def test_probe_learns_and_is_rederivable(spark, sf_dir):
    out = {
        r["term"]: r["value"]
        for r in llmdata.text_quality_probe(spark, sf_dir).collect()
    }
    assert set(out) == set(llmdata.QP_TERMS) | {"train_mse"}

    row = _moments(spark, sf_dir)
    n = row["n"]
    c = llmdata.QP_SCALES
    s = [[0] * 5 for _ in range(5)]
    for i in range(5):
        for j in range(i, 5):
            s[i][j] = s[j][i] = row[f"s{i}{j}"]
    m = [[s[i][j] / (c[i] * c[j] * n) for j in range(5)]
         for i in range(5)]
    bb = [row[f"b{i}"] / (c[i] * llmdata.QP_YSCALE * n)
          for i in range(5)]
    yy = row["ysq"] / (llmdata.QP_YSCALE ** 2 * n)

    w = [0.0] * 5
    for _ in range(llmdata.QP_STEPS):
        nw = []
        for j in range(5):
            acc = 0.0
            for i in range(5):
                acc = acc + m[j][i] * w[i]
            nw.append(
                math.floor(
                    (w[j] - llmdata.QP_LR * 2.0 * (acc - bb[j])) * 1e9
                    + 0.5
                ) / 1e9
            )
        w = nw
    for j, term in enumerate(llmdata.QP_TERMS):
        assert out[term] == w[j], (term, out[term], w[j])

    # the zero model's mse is yy; the fit must beat it clearly
    assert out["train_mse"] < 0.5 * yy, (out["train_mse"], yy)
    # and at least one non-intercept feature carries signal
    assert any(abs(out[t]) > 1e-6 for t in llmdata.QP_TERMS[1:])


def test_incremental_equals_batch_and_thirds(spark, sf_dir):
    """L79b: moment addition must reproduce the batch fit exactly,
    for ANY disjoint partition of the corpus — checked for the
    parity halves (the contract) and an independent 3-way split."""
    full = sorted(
        tuple(r)
        for r in llmdata.text_quality_probe(spark, sf_dir).collect()
    )
    inc = sorted(
        tuple(r)
        for r in llmdata.text_quality_probe_incremental(
            spark, sf_dir
        ).collect()
    )
    assert inc == full

    docs = llmdata._docs(spark, sf_dir)
    moms = [
        llmdata._qp_moments(
            llmdata._qp_feature_frame(
                docs.where(F.col("doc_id") % 3 == r)
            )
        )
        for r in range(3)
    ]
    acc = moms[0]
    for mm in moms[1:]:
        acc = llmdata._qp_add_moments(acc, mm)
    three = sorted(
        tuple(r) for r in llmdata._qp_fit(spark, acc).collect()
    )
    assert three == full


def test_stream_probe_trilogy_and_replay_guard(spark, sf_dir):
    """ST15: stream == incremental == batch, and the foreachBatch
    accumulator's batch_id keying makes an at-least-once REPLAY an
    overwrite, not a double-add (simulated by folding the same
    batch twice through the same accumulator logic)."""
    batch = sorted(
        tuple(r)
        for r in llmdata.text_quality_probe(spark, sf_dir).collect()
    )
    stream = sorted(
        tuple(r)
        for r in llmdata.stream_quality_probe(spark, sf_dir).collect()
    )
    assert stream == batch

    # replay simulation: batch 0 delivered twice, keyed accumulator
    docs = llmdata._docs(spark, sf_dir)
    half = llmdata._qp_feature_frame(docs.where(F.col("doc_id") % 2 == 0))
    rest = llmdata._qp_feature_frame(docs.where(F.col("doc_id") % 2 == 1))
    per_batch = {}
    per_batch[0] = llmdata._qp_moments(half)
    per_batch[0] = llmdata._qp_moments(half)  # replayed: overwrites
    per_batch[1] = llmdata._qp_moments(rest)
    acc = per_batch[0]
    acc = llmdata._qp_add_moments(acc, per_batch[1])
    replay_fit = sorted(
        tuple(r) for r in llmdata._qp_fit(spark, acc).collect()
    )
    assert replay_fit == batch
