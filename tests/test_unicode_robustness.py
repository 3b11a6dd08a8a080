"""Oracle parity under multibyte text: accents, CJK, emoji
(non-BMP — surrogate pairs in UTF-16 engines), and RTL Arabic
injected into ~20% of docs, with n_chars kept truthful in
CODEPOINTS. Real corpora are fully Unicode; this pins that length,
token-boundary, ascii/codepoint, md5-over-UTF-8, and regexp
semantics agree between Spark and DuckDB through the whole text
family. The r6 22-query sweep ran green; this keeps the
byte-vs-codepoint-sensitive core guarded.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.oracle import assert_matches_oracle

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()

SENSITIVE = [
    "text_fingerprint",   # per-codepoint rolling hash
    "text_token_count",   # \s+ boundaries around CJK/emoji
    "text_script_profile",  # script-class regexps
    "doc_length_hist",    # n_chars in codepoints
    "dedup_exact",        # md5 over UTF-8 bytes
    "doc_chunks",         # token slices + md5
    "text_normalize",     # NFC through the Arrow UDF
]


@pytest.fixture(scope="module")
def unicode_dir(tmp_path_factory, sf_dir):
    out = str(tmp_path_factory.mktemp("uni"))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"]:
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{out}/{t}.parquet")
    con.execute(
        f"""
        COPY (SELECT doc_id,
            CASE doc_id % 10
              WHEN 3 THEN 'café naïve résumé ' || text || ' Müller straße'
              WHEN 5 THEN '日本語のテキスト 机器学习 ' || text
              WHEN 7 THEN text || ' 🚀 emoji 🎉 test 🌍'
              WHEN 9 THEN 'مرحبا بالعالم ' || text
              ELSE text END AS text,
            lang, source,
            CASE doc_id % 10
              WHEN 3 THEN length('café naïve résumé ' || text
                                 || ' Müller straße')
              WHEN 5 THEN length('日本語のテキスト 机器学习 ' || text)
              WHEN 7 THEN length(text || ' 🚀 emoji 🎉 test 🌍')
              WHEN 9 THEN length('مرحبا بالعالم ' || text)
              ELSE n_chars END AS n_chars
          FROM read_parquet('{sf_dir}/documents.parquet'))
        TO '{os.path.join(out, "documents.parquet")}' (FORMAT PARQUET)
        """
    )
    return out


@pytest.mark.parametrize("name", SENSITIVE)
def test_unicode_parity(name, spark, unicode_dir):
    df = QUERIES[name](spark, unicode_dir)
    assert_matches_oracle(df, ORACLES[name], unicode_dir)
