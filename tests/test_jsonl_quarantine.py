"""Corrupt-tolerant JSONL ingest: malformed lines quarantine with
their raw text; good lines parse from the same single scan."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_npl_pipeline_spark.sources.files import read_jsonl_quarantine


def test_jsonl_quarantine_routes_bad_lines(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    good = [f'{{"id": {i}, "text": "doc {i}"}}' for i in range(10)]
    bad = [
        '{"id": 99, "text": "truncated',        # unterminated
        "not json at all",                       # garbage
        '{"id": "x3"}',                          # wrong type for id
    ]
    p.write_text("\n".join(good + bad) + "\n")

    df = read_jsonl_quarantine(spark, str(p), "id BIGINT, text STRING")
    clean = df.where(F.col("_corrupt_record").isNull())
    dead = df.where(F.col("_corrupt_record").isNotNull())

    assert clean.count() == 10
    assert {r["id"] for r in clean.collect()} == set(range(10))
    # the dead-letter side preserves the exact offending lines
    assert {r["_corrupt_record"] for r in dead.collect()} == set(bad)


def test_jsonl_quarantine_all_good_is_empty_deadletter(spark, tmp_path):
    p = tmp_path / "clean.jsonl"
    p.write_text('{"id": 1, "text": "a"}\n{"id": 2, "text": "b"}\n')
    df = read_jsonl_quarantine(spark, str(p), "id BIGINT, text STRING")
    assert df.where(F.col("_corrupt_record").isNotNull()).count() == 0
    assert df.count() == 2
