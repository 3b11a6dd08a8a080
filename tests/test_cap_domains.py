"""Two-phase domain capping must be EXACT: equal to the naive
single-window top-N on a fixture where one source dominates (the
skew case the two-phase plan exists for)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
import pyspark.sql.functions as F

from etl_npl_pipeline_spark.plans import llmdata
from etl_npl_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def skewed_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("skewed_sf")
    rows = []
    # 'hub' has 60 docs (>> CAP_PER_SOURCE and > shards*cap/2);
    # the rest have 5 each (< cap — kept whole)
    for i in range(75):
        src = "hub" if i < 60 else f"tail{(i - 60) // 5}"
        text = " ".join(f"w{i}x{j}" for j in range(30))
        rows.append(
            {"doc_id": i, "text": text, "lang": "en", "source": src,
             "n_chars": len(text)}
        )
    con = duckdb.connect()
    con.register("pdf", pd.DataFrame(rows))
    con.execute(
        f"COPY (SELECT * FROM pdf) TO '{d}/documents.parquet' (FORMAT PARQUET)"
    )
    return str(d)


def test_two_phase_cap_matches_single_window(spark, skewed_sf_dir):
    from pyspark.sql import Window

    got = {
        r["source"]: (r["n_kept"], r["chars"])
        for r in llmdata.data_cap_domains(spark, skewed_sf_dir).collect()
    }
    # naive reference: one global window per source
    docs = load_table(spark, skewed_sf_dir, "documents")
    h = F.md5(F.concat_ws(":", F.lit("cap"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    ref = {
        r["source"]: (r["n_kept"], r["chars"])
        for r in docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= llmdata.CAP_PER_SOURCE)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.sum("n_chars").alias("chars"))
        .collect()
    }
    assert got == ref
    assert got["hub"][0] == llmdata.CAP_PER_SOURCE  # capped
    assert got["tail0"][0] == 5  # under-cap stratum kept whole
