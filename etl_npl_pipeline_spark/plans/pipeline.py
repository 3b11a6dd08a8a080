"""End-to-end pipeline runner — the reference's Extract → Transform
→ Load wired as one Spark job (src/ETL-NPL-Pipeline.py's __main__
flow: extract raw frames, transform per source, assemble, write
per-segment outputs, src:762-793).

Extract here reads the synthetic parquet tables (the REST/CSV/Excel
sources in sources/ are the swap-in points for live data);
Transform is plans/npl; Load is one partitioned write per output
family via sinks.write_segmented — a single pass produces every
segment directory.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from etl_npl_pipeline_spark.plans import npl
from etl_npl_pipeline_spark.sinks import write_segmented, write_timestamped


def run_full_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    timestamp: str | None = None,
) -> dict[str, str]:
    """Run the complete NPL pipeline and write analytics-ready
    outputs. Returns {output_name: written_path}.

    Writes:
    - ``segments``: the per-segment quarterly NPL frame partitioned
      by segment (the Housing/Automobile/... split of the reference,
      one pass instead of a loop of filtered writes)
    - ``common``: the assembled quarterly macro frame
    """
    # Both outputs derive from the SAME two aggregates — the
    # (segment, quarter) decimal-sum frame (one lineitem⋈orders scan)
    # and the per-quarter orders macro frame. Built independently
    # (the pre-r14 shape) each write re-ran the full lineitem join:
    # two scans of the fact table for one pipeline run. A lazy
    # localCheckpoint on each tiny aggregate (≤ |segments|×|quarters|
    # rows) makes the first write materialize them and the second
    # write reuse the persisted blocks — one fact-table pass end to
    # end (guide §2.4/§6.2). Values are identical by construction:
    # the declared npl_quarterly/npl_assemble queries build from the
    # same _seg_agg/_macro expressions, and decimal sums re-associate
    # exactly.
    seg = npl._seg_agg(spark, sf_dir).localCheckpoint(eager=False)
    macro = npl.macro_by_quarter(spark, sf_dir).localCheckpoint(
        eager=False
    )
    quarterly = npl._quarterly_from(seg, macro)
    common = npl._assemble_from(npl._series_from(seg), macro)
    out = {}
    out["segments"] = write_segmented(
        quarterly.where(quarterly.segment.isNotNull()),
        f"{out_dir}/segments",
        "segment",
        timestamp=timestamp,
    )
    out["common"] = write_timestamped(
        common, out_dir, "common", fmt="csv", timestamp=timestamp
    )
    return out
