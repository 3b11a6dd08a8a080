"""Load stage — reference parity for the timestamped per-segment
CSV writes (src/ETL-NPL-Pipeline.py:768-793), Spark-first.

``write_segmented`` replaces the reference's per-category loop with
ONE partitioned write: a single pass over the data lays out
``.../segment=<value>/`` directories. At 100 TB the difference
between one partitioned write and N filtered full scans is N-1
extra reads of the corpus.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame


def run_timestamp(now: datetime | None = None) -> str:
    """``YYYYmmdd_HHMM`` tag (ref: src:769)."""
    dt = now or datetime.now(timezone.utc)
    return dt.strftime("%Y%m%d_%H%M")


def write_segmented(
    df: DataFrame,
    path: str,
    segment_col: str,
    fmt: str = "parquet",
    timestamp: str | None = None,
    mode: str = "overwrite",
) -> str:
    """One-pass segmented write: ``{path}/{ts}/segment=<v>/...``.

    parquet by default (columnar, splittable, statistics); pass
    fmt="csv" for reference-identical output files.
    """
    ts = timestamp or run_timestamp()
    target = f"{path.rstrip('/')}/{ts}"
    writer = df.write.mode(mode).partitionBy(segment_col)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(target)
    return target


def upsert_by_partition(
    df: DataFrame,
    path: str,
    partition_col: str,
    fmt: str = "parquet",
) -> str:
    """Incremental upsert at partition granularity: only the
    partitions present in ``df`` are replaced; others are untouched
    (dynamic partition overwrite). This is the parquet-native
    incremental-load pattern when no table format (Delta/Iceberg)
    is available — idempotent per partition, safe to re-run a
    failed batch.

    Pair with ``foreachBatch`` on a stream for continuous
    incremental loads: each micro-batch overwrites exactly the
    partitions it carries.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .format(fmt)
        .save(path)
    )
    return path


def write_timestamped(
    df: DataFrame, path: str, name: str, fmt: str = "csv",
    timestamp: str | None = None,
) -> str:
    """Single-table timestamped write (ref's per-category filename
    pattern ``{cate}_processed_{ts}``)."""
    ts = timestamp or run_timestamp()
    target = f"{path.rstrip('/')}/{name}_processed_{ts}"
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(target)
    return target


def merge_upsert(
    spark,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str,
    fmt: str = "parquet",
) -> str:
    """Row-level MERGE (upsert) on a plain parquet table — the
    copy-on-write emulation of ``MERGE INTO`` when no transactional
    table format (Delta/Iceberg) is available.

    1. The partitions touched by ``updates`` are enumerated (tiny
       distinct on the update batch).
    2. ONLY those partitions are read back from the target —
       partition pruning keeps the rewrite proportional to the
       update footprint, not the table size.
    3. Existing rows are anti-joined out on the key, the updates
       unioned in, and the affected partitions dynamically
       overwritten. Untouched partitions' files are never opened.

    Semantics: last-writer-wins per key (update replaces existing
    row; new keys insert). Idempotent — re-running the same batch
    yields the same state. At 100 TB the rewrite cost is
    O(affected partitions); choose the partition key so updates
    cluster (e.g. event date for late-arriving facts).

    Not atomic across partitions (no table format, no transaction
    log): a crash mid-write can leave some partitions updated.
    Each partition's own overwrite is atomic-by-rename, and
    re-running the batch converges.
    """
    parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
    import os

    existing = [
        p for p in parts
        if os.path.isdir(f"{target_path}/{partition_col}={p}")
    ]
    if existing:
        import pyspark.sql.functions as F

        old = (
            spark.read.format(fmt)
            .option("basePath", target_path)
            .load([f"{target_path}/{partition_col}={p}" for p in existing])
        )
        keep = old.join(
            F.broadcast(updates.select(*key_cols).distinct()),
            on=key_cols,
            how="left_anti",
        )
        merged = keep.select(*updates.columns).unionByName(updates)
    else:
        merged = updates
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .format(fmt)
        .save(target_path)
    )
    return target_path
