"""Property-based invariants for doc_chunks (hypothesis): the
chunk lattice must tile any token sequence — every token covered,
overlap exactly size-stride on interior chunks, hashes reproducible.

Runs the SAME Spark expressions as the production query on generated
corpora (one local DataFrame per case batch, not per example — the
properties are checked in bulk to keep JVM round trips bounded).
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from etl_npl_pipeline_spark.plans.llmdata import CHUNK_SIZE, CHUNK_STRIDE

_WORD = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x2FF
    ),
    min_size=1,
    max_size=8,
)


def _chunk_rows(spark, texts):
    """Run the production chunking expressions over literal rows."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    toks = F.split(F.trim(F.col("text")), r"\s+")
    d = df.select("doc_id", toks.alias("t")).withColumn(
        "start_tok",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.size("t") - 1, F.lit(0)),
                F.lit(CHUNK_STRIDE),
            )
        ),
    )
    chunk = F.slice(F.col("t"), F.col("start_tok") + 1, CHUNK_SIZE)
    return d.select(
        "doc_id",
        "start_tok",
        chunk.alias("chunk"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    ).collect()


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.lists(_WORD, min_size=1, max_size=3 * CHUNK_SIZE), min_size=1, max_size=4
    )
)
def test_chunk_lattice_tiles_every_token(spark, word_lists):
    texts = [" ".join(ws) for ws in word_lists]
    rows = _chunk_rows(spark, texts)
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, ws in enumerate(word_lists):
        chunks = sorted(by_doc[doc_id], key=lambda r: r["start_tok"])
        n = len(ws)
        # 1. lattice: starts are exactly 0, stride, ... < n
        assert [c["start_tok"] for c in chunks] == list(
            range(0, n, CHUNK_STRIDE)
        )
        # 2. every chunk is the right slice of the original tokens
        for c in chunks:
            s = c["start_tok"]
            assert c["chunk"] == ws[s : s + CHUNK_SIZE]
            # 3. hash is reproducible client-side (md5 over the
            # space-joined UTF-8 chunk — the dedup join key contract)
            expect = hashlib.md5(
                " ".join(ws[s : s + CHUNK_SIZE]).encode("utf-8")
            ).hexdigest()
            assert c["chunk_hash"] == expect
        # 4. full coverage: union of chunks is the whole doc
        covered = set()
        for c in chunks:
            covered.update(
                range(c["start_tok"], min(c["start_tok"] + CHUNK_SIZE, n))
            )
        assert covered == set(range(n))
