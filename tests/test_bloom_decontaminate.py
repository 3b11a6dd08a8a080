"""Bloom pre-filter invariants: zero false negatives (structural),
bounded false-positive rate, and end-to-end equality with the exact
L22 decontamination output."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_npl_pipeline_spark.operators.bloom import (
    bloom_maybe_member,
    build_bloom_bits,
)


def test_no_false_negatives(spark):
    members = spark.range(500).select(
        F.concat(F.lit("gram_"), F.col("id")).alias("g")
    )
    bits = build_bloom_bits(members)
    probed = bloom_maybe_member(members, bits)
    assert probed.where(~F.col("maybe")).count() == 0


def test_false_positive_rate_bounded(spark):
    members = spark.range(500).select(
        F.concat(F.lit("gram_"), F.col("id")).alias("g")
    )
    bits = build_bloom_bits(members)
    strangers = spark.range(20_000).select(
        F.concat(F.lit("other_"), F.col("id")).alias("g")
    )
    fp = bloom_maybe_member(strangers, bits).where(F.col("maybe")).count()
    # 500 grams x 4 hashes in 2^20 bits -> theoretical FP ~ 1.3e-11;
    # allow enormous slack and still catch a broken hash/bit path
    assert fp <= 2, f"false-positive rate too high: {fp}/20000"


def test_bloom_matches_exact_decontaminate(spark, sf_dir):
    from etl_npl_pipeline_spark.plans import llmdata

    exact = {
        (r["doc_id"], r["n_shared_ngrams"])
        for r in llmdata.dedup_decontaminate(spark, sf_dir).collect()
    }
    bloom = {
        (r["doc_id"], r["n_shared_ngrams"])
        for r in llmdata.dedup_bloom(spark, sf_dir).collect()
    }
    assert exact == bloom


def test_bit_array_size_constant_in_gram_count(spark):
    small = build_bloom_bits(
        spark.range(10).select(F.concat(F.lit("a"), F.col("id")).alias("g"))
    )
    big = build_bloom_bits(
        spark.range(10_000).select(F.concat(F.lit("b"), F.col("id")).alias("g"))
    )
    assert small.nbytes == big.nbytes == (1 << 20) // 8
