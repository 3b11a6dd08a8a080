"""Iterative BPE trainer (operators/bpe.py, r10): merge sequence
equals an independent pure-Python reference (greedy left-to-right
apply, count-desc/lex-asc tie-break), determinism across runs,
greedy run semantics, early stop, and tokenizer apply."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_npl_pipeline_spark.operators.bpe import bpe_apply, bpe_train


def _ref_bpe(word_freqs: dict[str, int], n_merges: int):
    """Independent reference: dict/list implementation of Sennrich
    BPE with the same tie-break contract."""
    vocab = [(list(w), f) for w, f in word_freqs.items()]
    merges = []
    for i in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (l, r), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((i + 1, l, r, l + r, n))
        nxt = []
        for syms, f in vocab:
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                    out.append(l + r)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            nxt.append((out, f))
        vocab = nxt
    return merges


def _wf_df(spark, word_freqs):
    return spark.createDataFrame(
        list(word_freqs.items()), "w string, freq long"
    )


def test_matches_reference_implementation(spark):
    wf = {
        "aaaa": 3,
        "aaab": 4,
        "banana": 2,
        "aab": 5,
        "low": 5,
        "lower": 2,
        "lowest": 6,
        "newer": 3,
        "wider": 1,
        "née": 2,  # non-ASCII chars segment as code points
    }
    got = [tuple(r) for r in bpe_train(spark, _wf_df(spark, wf), 15).collect()]
    want = _ref_bpe(wf, 15)
    assert got == want and len(got) == 15


def test_greedy_run_semantics(spark):
    """'aaaa' must merge as (aa)(aa), 'aaa' as (aa)(a) — each match
    consumes the shared boundary (the double-separator encoding)."""
    wf = {"aaaa": 1}
    merges = [tuple(r) for r in bpe_train(spark, _wf_df(spark, wf), 2).collect()]
    # round 1: (a,a) appears 3 times in 'aaaa'
    assert merges[0] == (1, "a", "a", "aa", 3)
    # round 2: after (aa)(aa), the only pair is (aa,aa) once
    assert merges[1] == (2, "aa", "aa", "aaaa", 1)


def test_early_stop_when_pairs_exhaust(spark):
    wf = {"ab": 1}
    merges = bpe_train(spark, _wf_df(spark, wf), 10).collect()
    assert len(merges) == 1  # one merge fully collapses the vocab


def test_deterministic_across_runs(spark):
    wf = {"abab": 2, "abba": 2, "baba": 2}  # deliberate count ties
    a = [tuple(r) for r in bpe_train(spark, _wf_df(spark, wf), 6).collect()]
    b = [tuple(r) for r in bpe_train(spark, _wf_df(spark, wf), 6).collect()]
    assert a == b == _ref_bpe(wf, 6)


def test_bpe_apply_tokenizes_with_learned_merges(spark):
    wf = {"lower": 4, "lowest": 3, "low": 5}
    merges = [
        (r.lhs, r.rhs)
        for r in bpe_train(spark, _wf_df(spark, wf), 4)
        .orderBy("rank")
        .collect()
    ]
    words = spark.createDataFrame([("lowest",), ("slow",)], "w string")
    toks = {
        r.w: r.tokens for r in bpe_apply(words, merges).collect()
    }
    # independent reference apply
    def ref_apply(w):
        syms = list(w)
        for l, r in merges:
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                    out.append(l + r)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = out
        return syms

    assert toks["lowest"] == ref_apply("lowest")
    assert toks["slow"] == ref_apply("slow")
    assert "".join(toks["lowest"]) == "lowest"

def test_train_final_state_equals_frozen_apply(spark):
    """bpe_train(return_state=True)'s final vocab must equal
    re-applying the frozen merge list via bpe_apply — the two paths
    a pipeline uses (train-side encode vs per-shard apply) cannot
    diverge."""
    wf = {"lower": 4, "lowest": 3, "low": 5, "banana": 2, "aab": 5}
    merges_df, final = bpe_train(
        spark, _wf_df(spark, wf), 6, return_state=True
    )
    merges = [(r.lhs, r.rhs) for r in merges_df.orderBy("rank").collect()]
    applied = bpe_apply(_wf_df(spark, wf), merges)
    got_final = sorted((r.s, r.freq) for r in final.collect())
    got_apply = sorted(
        ("\x01" + "\x01\x01".join(r.tokens) + "\x01", r.freq)
        for r in applied.collect()
    )
    assert got_final == got_apply
