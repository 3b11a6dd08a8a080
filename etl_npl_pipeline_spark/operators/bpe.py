"""Iterative BPE tokenizer training (r10, VERDICT r9 item #4) —
the full merge-apply loop on top of the single-round pair count
(plans/llmdata.vocab_bpe_pairs, L45).

Algorithm (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units" — the standard public method): start
from the distinct-word frequency table segmented into characters;
each round counts adjacent SYMBOL pairs weighted by word frequency,
merges the most frequent pair (ties: count desc, then left / right
symbol lexicographic asc — fully deterministic), re-segments, and
repeats for ``n_merges`` rounds. The corpus is scanned ONCE (the
word-frequency aggregation); every round after that is O(vocab) —
Zipf collapses billions of tokens into a bounded distinct-word
table, which is why the classic trainer scales.

Spark shape:
- the vocab table stays a DataFrame end to end; each round is one
  small job (pair explode → groupBy(l, r) → top-1) plus a map-side
  merge application. Per-round argmax collects ONE row — a model
  artifact, the same doctrine as the ANN centroids.
- the segmentation is a DOUBLE-SEPARATOR string encoding:
  ``\\x01h\\x01\\x01e\\x01…`` (each symbol wrapped in \\x01). A merge
  of (a, b) is then a plain ``replace(s, '\\x01a\\x01\\x01b\\x01',
  '\\x01ab\\x01')`` — builtin, codegen, and EXACTLY the greedy
  left-to-right non-overlapping merge: consecutive runs like "aaaa"
  pair up as (aa)(aa) because each match consumes the shared
  boundary, and a symbol that merely starts with ``b`` can't false-
  match because its trailing wrapper differs. The same encoding is
  replayable in ANSI SQL (replace/string_split), which is what
  gives the trainer a full DuckDB oracle — the unrolled V-stage CTE
  in plans/llmdata.VOCAB_BPE_TRAIN_SQL.
- plan depth is bounded with a localCheckpoint every
  ``checkpoint_every`` rounds (the chained replace() lineage would
  otherwise grow linearly in V and blow analysis time).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

SEP = "\x01"


def _initial_segmentation(word_col: F.Column) -> F.Column:
    # \x01c\x01 per character; concatenation yields the
    # double-separator interior and single-separator edges
    return F.regexp_replace(word_col, "(.)", f"{SEP}$1{SEP}")


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent symbol-pair counts over the segmented vocab,
    weighted by word frequency. All codegen builtins."""
    syms = vocab.select(
        "freq",
        F.split(
            F.expr("substring(s, 2, length(s) - 2)"), SEP + SEP
        ).alias("syms"),
    ).where(F.size("syms") >= 2)
    pairs = syms.select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, size(syms) - 1),"
                " i -> struct(element_at(syms, i) AS l,"
                "             element_at(syms, i + 1) AS r))"
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.l", "p.r").agg(F.sum("freq").alias("n"))


def bpe_train(
    spark: SparkSession,
    word_freq: DataFrame,
    n_merges: int,
    checkpoint_every: int = 8,
    return_state: bool = False,
):
    """Train ``n_merges`` BPE merges over a (w, freq) distinct-word
    table; returns the learned merge table
    (rank, lhs, rhs, merged, pair_count) — the tokenizer-training
    deliverable. Stops early when no pair remains (tiny corpora).

    With ``return_state=True`` returns ``(merges, final_vocab)``
    where final_vocab is the fully-merged segmented word table
    (s, freq) — the corpus encoded under the learned tokenizer,
    available for free at the end of training (the apply pass a
    separate ``bpe_apply`` call would otherwise recompute).

    Cost model: each round is ONE Spark job (pair agg + TakeOrdered
    + a 1-row collect), so wall-clock is latency-bound at small
    vocab — measured ~0.25 s/round at sf≤0.1 regardless of data
    (the job floor: fresh-plan Catalyst analysis + scheduling), i.e.
    ~13 s for 50 merges. That constant does NOT grow with corpus
    size: the per-round data volume is the DISTINCT-WORD table, so
    at 100 TB the same 50 rounds cost 50 × (one small shuffle over
    the vocab) — the iterative-algorithm shape MLlib k-means has,
    not a scan-per-round. The corpus is read exactly once.
    """
    vocab = word_freq.select(
        _initial_segmentation(F.col("w")).alias("s"), F.col("freq")
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, str, int]] = []
    for i in range(n_merges):
        best = (
            _pair_counts(vocab)
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, n = best[0]["l"], best[0]["r"], best[0]["n"]
        merges.append((i + 1, l, r, l + r, int(n)))
        vocab = vocab.withColumn(
            "s",
            F.replace(
                F.col("s"),
                F.lit(f"{SEP}{l}{SEP}{SEP}{r}{SEP}"),
                F.lit(f"{SEP}{l}{r}{SEP}"),
            ),
        )
        if (i + 1) % checkpoint_every == 0:
            # bound the chained-replace lineage (plan analysis cost
            # is linear in depth; re-execution would be quadratic)
            vocab = vocab.localCheckpoint(eager=True)
    merges_df = spark.createDataFrame(
        merges,
        "rank int, lhs string, rhs string, merged string, pair_count long",
    )
    if return_state:
        return merges_df, vocab
    return merges_df


def bpe_apply(vocab_words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a learned merge sequence to a (w, …) word table —
    returns the table with a ``tokens`` array column (the trained
    tokenizer's output). Merges apply in rank order, each as one
    builtin replace over the double-separator encoding."""
    out = vocab_words.withColumn(
        "s", _initial_segmentation(F.col("w"))
    )
    for l, r in merges:
        out = out.withColumn(
            "s",
            F.replace(
                F.col("s"),
                F.lit(f"{SEP}{l}{SEP}{SEP}{r}{SEP}"),
                F.lit(f"{SEP}{l}{r}{SEP}"),
            ),
        )
    return out.withColumn(
        "tokens",
        F.split(F.expr("substring(s, 2, length(s) - 2)"), SEP + SEP),
    ).drop("s")
