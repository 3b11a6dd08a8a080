"""The codegen regexp form of stopword_hits must equal the token-
filter definition on ARBITRARY text — including unicode whitespace,
punctuation-glued tokens, and stopwords at string edges. Hypothesis
generates the texts; the reference implementation is computed in
plain Python (re.split on \\s+, exact membership), mirroring the
DuckDB oracles' list_filter construction.

One Spark round per example would be minutes; instead all generated
texts go through Spark in ONE DataFrame pass per run.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings, strategies as st

from etl_npl_pipeline_spark.operators.text import LANG_STOPWORDS, stopword_hits

# token alphabet biased toward stopwords and near-stopwords so
# boundary handling actually gets exercised
_WORDS = st.sampled_from(
    [w for ws in LANG_STOPWORDS.values() for w in ws]
    + ["thee", "ofa", "a.", ".the", "the,", "und!", "x", "la-la", "dogs"]
)
_SEP = st.sampled_from([" ", "  ", "\t", "\n", " \t ", "\r\n"])


@st.composite
def _texts(draw):
    n = draw(st.integers(min_value=0, max_value=12))
    parts = []
    for i in range(n):
        if i:
            parts.append(draw(_SEP))
        parts.append(draw(_WORDS))
    lead = draw(st.sampled_from(["", " ", "\t"]))
    trail = draw(st.sampled_from(["", " ", "\n"]))
    return lead + "".join(parts) + trail


def _ref_hits(text: str, lang: str) -> int:
    toks = [t for t in re.split(r"\s+", text.strip()) if t != ""]
    # python \s+ on stripped ascii-ish text == Java \s+ here: the
    # generator only emits ascii whitespace (the engine contract —
    # see normalize_text for the unicode-ws policy)
    return sum(t in LANG_STOPWORDS[lang] for t in toks)


@pytest.fixture(scope="module")
def corpus():
    texts = []

    @settings(max_examples=300, deadline=None, database=None)
    @given(_texts())
    def _collect(t):
        texts.append(t)

    _collect()
    return texts


def test_regexp_stopword_hits_matches_token_filter(spark, corpus):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "i LONG, text STRING"
    )
    rows = df.select(
        "i",
        "text",
        *[stopword_hits("text", L).alias(f"s_{L}") for L in LANG_STOPWORDS],
    ).collect()
    assert len(rows) == len(corpus)
    for r in rows:
        for L in LANG_STOPWORDS:
            assert r[f"s_{L}"] == _ref_hits(r["text"], L), (
                f"lang={L} text={r['text']!r}"
            )


def test_int8_quantize_error_bounded_by_half_step(spark, sf_dir):
    """Affine int8 quantization's reconstruction error is bounded by
    step/2 = (max-min)/510 per element — the property that makes the
    4x memory cut safe to gate on. Checked on the real embeddings."""
    import pyspark.sql.functions as F

    from etl_npl_pipeline_spark.plans.llmdata import _emb

    emb = _emb(spark, sf_dir)
    e = F.col("embedding")
    mn, mx = F.array_min(e), F.array_max(e)
    step = (mx - mn) / F.lit(255.0)
    errs = F.transform(
        e, lambda x: F.abs(x - (mn + F.round((x - mn) / step, 0) * step))
    )
    bad = (
        emb.where(mx > mn)
        .select((F.array_max(errs) <= step / 2 + F.lit(1e-12)).alias("ok"))
        .where(~F.col("ok"))
        .count()
    )
    assert bad == 0
