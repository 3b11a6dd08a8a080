"""L75 text_pii_audit invariants (r13): checksum discrimination,
sequential chars attribution, residual convergence.

The audit's three metric families have distinct semantics worth
pinning independently of the DuckDB hash (which only proves the two
engines agree — not that either is RIGHT):

* thai_id counts ONLY checksum-valid 13-digit runs while redacting
  every candidate run (conservative scrub, honest count);
* chars_redacted is measured sequentially on the intermediate each
  class actually saw (ADVICE r12), so the per-class columns SUM to
  the total characters the full scrub removed — no double counting
  when two classes match overlapping spans;
* residual_hits == 0 for every class (the scrub converges).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_npl_pipeline_spark.plans import llmdata


def _audit(spark, sf_dir):
    rows = llmdata.text_pii_audit(spark, sf_dir).collect()
    return {r["pii_type"]: r.asDict() for r in rows}


def test_thai_checksum_discrimination(spark, sf_dir):
    docs = llmdata._docs(spark, sf_dir)
    n_valid = docs.where(F.col("doc_id") % 19 == 2).count()
    n_invalid = docs.where(F.col("doc_id") % 23 == 6).count()
    a = _audit(spark, sf_dir)["thai_id"]
    # n_hits counts only the checksum-valid plant slice ...
    assert a["n_hits"] == n_valid
    assert a["n_docs"] == n_valid
    # ... while redaction removes BOTH slices' 13-char runs
    assert a["chars_redacted"] == 13 * (n_valid + n_invalid)
    assert a["residual_hits"] == 0


def test_chars_redacted_sums_to_total_removed(spark, sf_dir):
    """sum(chars_redacted) must equal len(dirty) - len(stripped)
    where stripped applies every class sequentially with '' —
    the exact accounting ADVICE r12 asked for."""
    audit = _audit(spark, sf_dir)
    total = sum(v["chars_redacted"] for v in audit.values())

    docs = llmdata._docs(spark, sf_dir)
    did = F.col("doc_id")
    dirty = F.concat(
        F.col("text"),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" contact agent"),
                did.cast("string"),
                F.lit("@mail.example for access"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 9 == 0, F.lit(" call 555-201-3344 or 555-201-3345 now")
        ).otherwise(F.lit("")),
        F.when(did % 11 == 3, F.lit(" node 10.2.30.44 unreachable"))
        .otherwise(F.lit("")),
        F.when(did % 13 == 5, F.lit(" card 4111222233334444 declined"))
        .otherwise(F.lit("")),
        F.when(did % 15 == 1, F.lit(" call +66-81-234-5678 urgently"))
        .otherwise(F.lit("")),
        F.when(
            did % 17 == 4, F.lit(" iban DE44500105175407324931 on file")
        ).otherwise(F.lit("")),
        F.when(
            did % 19 == 2,
            F.lit(f" citizen {llmdata.PII_THAI_VALID} verified"),
        ).otherwise(F.lit("")),
        F.when(
            did % 23 == 6,
            F.lit(f" ref {llmdata.PII_THAI_INVALID} noted"),
        ).otherwise(F.lit("")),
    )
    stripped = dirty
    for _, pat in llmdata.PII_PATTERNS:
        stripped = F.regexp_replace(stripped, pat, "")
    want = (
        docs.select(
            (F.length(dirty) - F.length(stripped)).alias("d")
        )
        .agg(F.sum("d").alias("s"))
        .collect()[0]["s"]
    )
    assert total == want


def test_scrub_converges(spark, sf_dir):
    audit = _audit(spark, sf_dir)
    assert set(audit) == {n for n, _ in llmdata.PII_PATTERNS}
    assert all(v["residual_hits"] == 0 for v in audit.values())
    # every planted class detected on its slice
    assert all(v["n_hits"] > 0 for v in audit.values())
