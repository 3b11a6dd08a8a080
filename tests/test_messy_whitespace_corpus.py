"""Tokenization parity on a corpus WITH runs of whitespace.

The synthetic test corpus has zero multi-space/newline documents, so
a single-space split and a \\s+ split agree on it by accident. This
fixture corpus makes them diverge: if either engine regresses to a
single-space split, these oracle comparisons fail.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from etl_npl_pipeline_spark.plans import llmdata
from etl_npl_pipeline_spark.sources.tables import TABLES
from tests.oracle import assert_matches_oracle

_DOCS = [
    (0, "the  quick\nbrown   fox jumps over the lazy dog and runs on "
        "and on through the tall grass of a very long field indeed", "en", "web"),
    (1, "a\tb\t\tc of the   and to in the of a to in the and of the "
        "quick brown fox jumps over a lazy sleeping dog again", "en", "web"),
    (2, "der\n\nhund und die katze das nicht und der hund die katze "
        "und das haus der garten die strasse nicht heute morgen", "de", "web"),
    (3, "  leading and trailing spaces   with the of and to in a "
        "sentence that keeps going until it has enough words here  ", "en", "books"),
    (4, "single spaced words with the of and to in a plain document "
        "nothing special about this one except ordinary spacing", "en", "books"),
]


@pytest.fixture(scope="module")
def messy_sf_dir(tmp_path_factory):
    """A documents.parquet whose texts contain \\n, \\t, and runs of
    spaces (schema identical to the driver's synthetic table)."""
    d = tmp_path_factory.mktemp("messy_sf")
    pdf = pd.DataFrame(
        [
            {
                "doc_id": i,
                "text": t,
                "lang": lang,
                "source": src,
                "n_chars": len(t),
            }
            for i, t, lang, src in _DOCS
        ]
    )
    con = duckdb.connect()
    con.register("pdf", pdf)
    con.execute(
        f"COPY (SELECT * FROM pdf) TO '{d}/documents.parquet' (FORMAT PARQUET)"
    )
    # the oracle helper registers every table; point the others at
    # the real sf0.001 data
    for t in TABLES:
        if t != "documents":
            con.execute(
                f"COPY (SELECT * FROM '/root/testdata/sf0.001/{t}.parquet') "
                f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
            )
    return str(d)


@pytest.mark.parametrize(
    "qname",
    ["text_quality", "text_token_count", "text_commonness",
     "vocab_top_ngrams", "dedup_chunks", "text_lang_id",
     "dedup_spans", "text_winnow"],
)
def test_tokenizing_queries_match_oracle_on_messy_corpus(
    spark, messy_sf_dir, qname
):
    fn = getattr(llmdata, qname)
    sql = getattr(llmdata, f"{qname.upper()}_SQL")
    assert_matches_oracle(fn(spark, messy_sf_dir), sql, messy_sf_dir)


def test_messy_corpus_actually_diverges_from_single_space(spark, messy_sf_dir):
    """Sanity: on this corpus a ' ' split and a \\s+ split disagree —
    i.e. the fixture really exercises the distinction."""
    import pyspark.sql.functions as F

    from etl_npl_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, messy_sf_dir, "documents")
    diff = docs.where(
        F.size(F.split(F.trim("text"), r"\s+"))
        != F.size(F.split(F.trim("text"), " "))
    ).count()
    # doc 1's tab-joins and empty-string splits cancel in COUNT (not
    # in content); 3 of 5 docs diverge even by token count
    assert diff >= 3
