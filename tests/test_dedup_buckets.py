"""LSH bucket-cap and simhash single-eval pairing semantics.

The cap is the 100-TB safety valve: a degenerate boilerplate bucket
(10^6 identical docs) must not build an unbounded collect_list or
explode C(10^6, 2) pairs. These tests pin (a) oversize buckets are
dropped whole, (b) normal buckets are unaffected, and (c) the
rewritten simhash pairing matches a brute-force hamming join.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_npl_pipeline_spark.operators import dedup as D


def _sig_row(doc: int, base: int):
    return (doc, *[base] * D.N_PERM)


def test_minhash_oversize_bucket_dropped(spark):
    # docs 0-9 share one signature (one bucket of 10 across all
    # bands); docs 100/101 share another (bucket of 2).
    cols = ["doc"] + [f"sig_{i}" for i in range(D.N_PERM)]
    rows = [_sig_row(d, 7) for d in range(10)]
    rows += [_sig_row(100, 42), _sig_row(101, 42)]
    sigs = spark.createDataFrame(rows, cols)

    # cap below the big bucket (each of the 16 bands holds all 10
    # docs -> bucket size 10 > 5): only the pair bucket survives
    capped = D.minhash_candidates(sigs, max_bucket_size=5)
    got = {(r.doc_a, r.doc_b) for r in capped.collect()}
    assert got == {(100, 101)}

    # cap above every bucket: all C(10,2) + 1 pairs
    uncapped = D.minhash_candidates(sigs, max_bucket_size=1000)
    assert uncapped.count() == 45 + 1


def test_simhash_candidates_match_bruteforce(spark):
    # hand-picked 64-bit signatures with known hamming distances
    sigs = spark.createDataFrame(
        [
            (1, 0b1111000),
            (2, 0b1111001),   # ham(1,2)=1
            (3, 0b1111111),   # ham(1,3)=3, ham(2,3)=2
            (4, -1),          # all ones: far from everything small
            (5, 0),           # ham(5,1)=4 -> excluded at max=3
        ],
        ["doc", "simhash"],
    )
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in D.simhash_candidates(sigs, max_hamming=3).collect()
    }
    # brute force over all pairs
    a = sigs.selectExpr("doc as doc_a", "simhash as ha")
    b = sigs.selectExpr("doc as doc_b", "simhash as hb")
    brute = (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .where(F.col("hamming") <= 3)
    )
    want = {(r.doc_a, r.doc_b, r.hamming) for r in brute.collect()}
    assert got == want
    assert (1, 2, 1) in got and (1, 3, 3) in got


def test_simhash_oversize_bucket_dropped(spark):
    # 20 identical signatures -> every chunk bucket oversize at cap 5
    rows = [(d, 0x1234) for d in range(20)] + [(100, 1 << 40), (101, 1 << 40)]
    sigs = spark.createDataFrame(rows, ["doc", "simhash"])
    got = {
        (r.doc_a, r.doc_b)
        for r in D.simhash_candidates(sigs, max_bucket_size=5).collect()
    }
    # the identical-signature herd is dropped whole; the far pair
    # shares all four chunks and survives
    assert got == {(100, 101)}


def test_simhash_plan_evaluates_signature_once(spark, sf_dir):
    """The pairing must not re-execute the signature pandas_udf per
    join side: exactly one ArrowEvalPython node in the plan."""
    from etl_npl_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sigs = D.simhash_signatures(docs, "text", "doc_id")
    plan = D.simhash_candidates(sigs)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("ArrowEvalPython") <= 1


def test_embedding_block_cap_quarantines_hub_label(spark):
    """One dominant block key must not go quadratic: blocks larger
    than max_block emit zero pairs (quarantine), small blocks still
    pair normally."""
    from etl_npl_pipeline_spark.operators import similarity as S

    # hub block: 8 identical vectors under label 0 (C(8,2)=28 pairs
    # if uncapped); small block: one identical pair under label 1
    rows = [(i, 0, [1.0, 0.0]) for i in range(8)]
    rows += [(100, 1, [0.0, 1.0]), (101, 1, [0.0, 1.0])]
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])

    capped = S.embedding_near_dups_blocked(
        df, "label", threshold=0.9, max_block=5
    )
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(100, 101)}

    uncapped = S.embedding_near_dups_blocked(
        df, "label", threshold=0.9, max_block=1000
    )
    assert uncapped.count() == 28 + 1


def test_containment_bottomk_recall_vs_exact(spark, sf_dir):
    """L74b sketch vs L74 exact on the planted-snippet fixture: every
    planted (source, snippet) pair must survive the bottom-k probe
    (a fully contained snippet estimates exactly 1.0 — every sampled
    shingle hits), and every emitted pair must also be in the exact
    path's output (the verify stage re-scores exactly, so the sketch
    can only MISS, never invent)."""
    from etl_npl_pipeline_spark.plans import llmdata

    exact = {
        (r.doc_a, r.doc_b, r.inter, r.cont_a, r.cont_b)
        for r in llmdata.dedup_containment(spark, sf_dir).collect()
    }
    sketch = {
        (r.doc_a, r.doc_b, r.inter, r.cont_a, r.cont_b)
        for r in llmdata.dedup_containment_bottomk(spark, sf_dir).collect()
    }
    assert sketch <= exact
    planted = {
        (a, b) for a, b, *_ in exact if b - a == llmdata.SNIPPET_ID_OFFSET
    }
    got_planted = {
        (a, b) for a, b, *_ in sketch if b - a == llmdata.SNIPPET_ID_OFFSET
    }
    assert planted and got_planted == planted


def test_containment_bottomk_probe_volume_bounded(spark):
    """The sketch's scale claim: probe rows per doc <= k no matter
    how long the document is (a 10,000-shingle doc contributes 16
    probe rows, not 10,000 posting rows)."""
    from etl_npl_pipeline_spark.operators.dedup import (
        BOTTOMK_K,
        containment_bottomk_pairs,
    )

    long_doc = " ".join(f"w{i}" for i in range(500))
    quote = " ".join(f"w{i}" for i in range(30))
    rows = [(1, long_doc), (2, quote), (3, "totally different text here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = containment_bottomk_pairs(
        df, "text", "doc_id", threshold=0.9, k=BOTTOMK_K
    ).collect()
    got = {(r.doc_a, r.doc_b): (r.cont_a, r.cont_b) for r in out}
    assert set(got) == {(1, 2)}
    # snippet fully contained: cont_b (the smaller side) == 1.0
    assert got[(1, 2)][1] == 1.0
