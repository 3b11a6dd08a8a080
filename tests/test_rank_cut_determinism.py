"""Engine-stability pins for the round-3 rank-cut queries: a top-k
cut must return the SAME rows no matter how the input is
partitioned or how many times it runs — ties broken by a total
order, never by partition arrival. (This is the failure mode that
passes a single-threaded oracle compare and then flakes at 1000
executors.)
"""

from __future__ import annotations

from etl_npl_pipeline_spark.plans import llmdata


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_rank_cut_queries_are_rerun_stable(spark, sf_dir):
    for fn in (
        llmdata.text_tfidf,
        llmdata.rag_retrieve,
        llmdata.data_interleave,
        llmdata.vocab_coverage,
        llmdata.search_bm25,
    ):
        assert _rows(fn(spark, sf_dir)) == _rows(fn(spark, sf_dir)), fn.__name__


def test_rank_cut_stable_under_shuffle_partitions(spark, sf_dir):
    """Same results with a radically different parallelism — the
    tie-break totality is what guarantees this, so a regression here
    means a cut became partition-order dependent."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        baseline = {
            fn.__name__: _rows(fn(spark, sf_dir))
            for fn in (
                llmdata.text_tfidf,
                llmdata.rag_retrieve,
                llmdata.data_interleave,
            )
        }
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        for fn in (
            llmdata.text_tfidf,
            llmdata.rag_retrieve,
            llmdata.data_interleave,
        ):
            assert _rows(fn(spark, sf_dir)) == baseline[fn.__name__], fn.__name__
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
