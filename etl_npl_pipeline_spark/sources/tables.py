"""Parquet table catalog for the synthetic test data.

Reference parity: the reference loads each source into a named
frame (``raw_npls``, ``raw_gdp`` ... src/ETL-NPL-Pipeline.py:464+);
here every table is a lazily-planned parquet scan so Catalyst can
prune columns and push filters into the scan — at 100 TB the
difference between reading 2 columns and 11 is the whole game.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Opt-in hot-table pins (cache_table): load_table returns the pinned
# plan when one exists so every consumer shares ONE materialized scan.
# Nothing is pinned unless a harness (bench.py's events tier) asks —
# tests and the driver always measure the raw scan path.
_PINNED: dict[tuple[str, str], DataFrame] = {}


def cache_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Pin one table in executor memory (spill-to-disk) and register
    it so subsequent load_table calls reuse the materialized scan —
    the production pattern for a hot dimension/fact every query in a
    workload touches. Returns the pinned DataFrame after forcing
    materialization."""
    from pyspark import StorageLevel

    df = load_table(spark, sf_dir, name).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    df.count()
    _PINNED[(sf_dir.rstrip("/"), name)] = df
    return df


def uncache_tables() -> None:
    """Unpersist and forget every pinned table."""
    for df in _PINNED.values():
        df.unpersist()
    _PINNED.clear()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one parquet table. No cache, no collect — a pure plan
    (unless the table was explicitly pinned via cache_table)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    pinned = _PINNED.get((sf_dir.rstrip("/"), name))
    if pinned is not None:
        return pinned
    # Self-sufficient under ANY SparkSession (not just session.get_spark()):
    # some generations of events.parquet store TIMESTAMP(NANOS), which Spark
    # only reads with nanosAsLong; timestamp literals in downstream plans
    # assume UTC. Both confs are runtime-settable, so pin them at read time.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ts is TIMESTAMP(NANOS) on disk, read as a nanos long via
        # spark.sql.legacy.parquet.nanosAsLong; truncate to micros
        # (same as DuckDB's ns→us handling) and restore the type.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    # timestamp[us] without isAdjustedToUTC reads as TIMESTAMP_NTZ; the
    # session tz is pinned UTC, so casting to TIMESTAMP is value-identical
    # and keeps every downstream plan (and the driver's schema compare) on
    # the single timestamp type this engine has always produced.
    for col_name, col_type in df.dtypes:
        if col_type == "timestamp_ntz":
            df = df.withColumn(col_name, F.col(col_name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several tables as a dict of plans."""
    use = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}
