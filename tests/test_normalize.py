"""Unicode pins for normalize_text: composed/decomposed forms, case
variants, and whitespace runs all canonicalize to the same string."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_npl_pipeline_spark.operators.text import normalize_text


def _norms(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r[0] for r in df.select(normalize_text("text")).collect()]


def test_nfc_composed_equals_decomposed(spark):
    composed = "caf\u00e9"              # e-acute as one codepoint
    decomposed = "cafe\u0301"           # e + combining acute
    assert composed != decomposed        # distinct input byte sequences
    a, b = _norms(spark, [composed, decomposed])
    assert a == b == "caf\u00e9"

def test_case_and_whitespace_canonicalize(spark):
    out = _norms(spark, ["  The\tQuick\n\nFox ", "the quick fox"])
    assert out[0] == out[1] == "the quick fox"


def test_null_passthrough_and_empty(spark):
    out = _norms(spark, [None, "   ", "x"])
    assert out == [None, "", "x"]
