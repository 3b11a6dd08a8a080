"""The r14 vectorized simhash signature (one segment-summed pass per
Arrow batch, np.add.reduceat over doc boundaries) must reproduce the
per-document majority-bit definition exactly — including null text
(empty token list -> signature 0), single-token docs (signature =
the token hash), duplicate tokens (weighted votes), and tie bits
(signed sum 0 -> bit clear: a bit is set only when the sum is
strictly positive)."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_npl_pipeline_spark.operators import dedup as D
from etl_npl_pipeline_spark.operators.dedup import portable_token_hash


def _ref_signature(hashes: list[int]) -> int:
    """Straightforward per-doc reference: bit j set iff strictly more
    tokens have bit j set than clear (duplicates counted)."""
    if not hashes:
        return 0
    sig = 0
    n = len(hashes)
    for j in range(64):
        ones = sum((h >> j) & 1 for h in hashes)
        if 2 * ones > n:
            sig |= 1 << j
    # interpret as signed int64 (Spark long)
    return sig - (1 << 64) if sig >= (1 << 63) else sig


def test_vectorized_signature_matches_reference(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),  # dup of 1
        (3, "one"),  # single token: signature == its hash
        (4, None),  # null text -> empty list -> signature 0
        (5, "x y"),  # two tokens: every differing bit ties -> clear
        (6, "the quick brown fox jumps over the lazy dog again and"),
        (7, "rep rep rep solo"),  # duplicate tokens weight the vote
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc"]: r["simhash"]
        for r in D.simhash_signatures(docs, "text", "doc_id").collect()
    }
    # rebuild the reference from the SAME token-hash expression the
    # operator feeds its UDF (split on \s+ after trim, duplicates and
    # empty-string tokens kept, portable_token_hash JVM-side)
    tok = docs.where(F.col("text").isNotNull()).select(
        F.col("doc_id").alias("doc"),
        F.explode(
            F.transform(
                F.split(F.trim(F.col("text")), r"\s+"),
                portable_token_hash,
            )
        ).alias("h"),
    )
    by_doc: dict[int, list[int]] = {d: [] for d, _ in rows}
    for r in tok.collect():
        by_doc[r["doc"]].append(r["h"] & ((1 << 64) - 1))
    for d, _ in rows:
        assert got[d] == _ref_signature(by_doc[d]), f"doc {d}"
    # identical docs -> identical signatures; null text -> 0
    assert got[1] == got[2]
    assert got[4] == 0
    # single token: the signature IS the (signed) token hash
    h3 = by_doc[3][0]
    assert got[3] == (h3 - (1 << 64) if h3 >= (1 << 63) else h3)
