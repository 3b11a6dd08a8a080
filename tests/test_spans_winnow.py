"""Semantic properties of the overlapping-span detector (L28) and
winnowing fingerprints (L29) on a corpus with a PLANTED copied run.

The planted run is deliberately misaligned with dedup_chunks' fixed
20-word tiling: the stride-1 span detector must catch it while the
chunk detector (by construction) cannot — that alignment robustness
is the whole point of exact-substring-style dedup (Lee et al. 2021).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from etl_npl_pipeline_spark.plans import llmdata

# doc 1 copies a13..a27 from doc 0 — a 15-token run starting at
# offset 13 (not a multiple of CHUNK_WORDS=20), surrounded by
# unique tokens. doc 2 shares nothing.
_A = [f"a{i}" for i in range(40)]
_RUN = _A[13:28]  # 15 tokens >= SPAN_WORDS (12) and >= k+w-1 (8)
_DOCS = [
    (0, " ".join(_A)),
    (1, " ".join([f"b{i}" for i in range(10)] + _RUN + [f"c{i}" for i in range(10)])),
    (2, " ".join(f"d{i}" for i in range(30))),
]


@pytest.fixture(scope="module")
def planted_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("planted_sf")
    pdf = pd.DataFrame(
        [
            {"doc_id": i, "text": t, "lang": "en", "source": "web",
             "n_chars": len(t)}
            for i, t in _DOCS
        ]
    )
    con = duckdb.connect()
    con.register("pdf", pdf)
    con.execute(
        f"COPY (SELECT * FROM pdf) TO '{d}/documents.parquet' (FORMAT PARQUET)"
    )
    return str(d)


def test_spans_catch_misaligned_copy(spark, planted_sf_dir):
    rows = {r["doc_id"]: r.asDict()
            for r in llmdata.dedup_spans(spark, planted_sf_dir).collect()}
    # a 15-token shared run yields exactly 15-12+1 = 4 shared windows
    # in each doc
    assert rows[0]["dup_spans"] == 4
    assert rows[1]["dup_spans"] == 4
    assert rows[2]["dup_spans"] == 0
    assert rows[0]["n_spans"] == 40 - llmdata.SPAN_WORDS + 1


def test_chunks_miss_what_spans_catch(spark, planted_sf_dir):
    """The same corpus through fixed-tiling chunk dedup: the copied
    run straddles chunk boundaries at different offsets in the two
    docs, so NO chunk repeats — the blind spot dedup_spans closes."""
    rows = {r["doc_id"]: r.asDict()
            for r in llmdata.dedup_chunks(spark, planted_sf_dir).collect()}
    assert all(r["dup_chunks"] == 0 for r in rows.values())


def test_winnow_guarantee_and_compression(spark, planted_sf_dir):
    """Winnowing guarantee: any shared run of >= k+w-1 tokens leaves
    at least one shared fingerprint; and far fewer fingerprints are
    kept than k-grams exist (~2/(w+1))."""
    rows = {r["doc_id"]: r.asDict()
            for r in llmdata.text_winnow(spark, planted_sf_dir).collect()}
    assert rows[0]["shared_fp"] >= 1
    assert rows[1]["shared_fp"] >= 1
    assert rows[2]["shared_fp"] == 0
    n_kgrams_doc0 = 40 - llmdata.WINNOW_K + 1
    assert 0 < rows[0]["n_fp"] < n_kgrams_doc0 / 2
