"""Snapshot-diff and incremental-view-maintenance contracts
(SURVEY §2.2 T22/T23, r11).

The reference appends timestamped CSV snapshots and recomputes its
rollups from scratch each run (`src/ETL-NPL-Pipeline.py` src:768+,
src:353/441); at 100 TB neither "what changed between snapshots?"
nor "recompute the rollup" can afford a full-table pass. These two
queries give the two standard answers driver-grade oracle evidence:

- ``snapshot_diff``: CDC-style change feed between two persisted
  table versions (the Delta Lake CDF / Iceberg changelog shape),
  restricted to the PARTITIONS the writer actually rewrote.
- ``agg_incremental``: algebraic incremental view maintenance —
  merge the new slice's PARTIAL aggregates into the materialized
  rollup without rescanning history.

Both rebuild their temp tables from parquet ground truth on every
call (the lakehouse.py doctrine), so retries, engines, and scale
factors agree byte-for-byte.
"""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_npl_pipeline_spark.sources.tables import load_table

_DIFF_TMP = "/root/repo/.tmp/snapshot_diff"
_IVM_TMP = "/root/repo/.tmp/agg_incremental"


def _orders_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        "o_orderstatus",
    )


def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T22: change feed between two snapshot versions of an orders
    table — v1 = keys < 3000; v2 applies one deterministic batch
    (update: keys 1000-1999 price +50000; delete: keys < 1000
    divisible by 7; insert: keys 3000-3499). Emits one row per
    changed key with change_type ∈ {insert, delete, update} and the
    pre/post prices — the Delta-CDF/Iceberg-changelog read shape
    that feeds downstream incremental consumers.

    Scale design: the writer only rewrites the partitions the batch
    lands in, so the differ FIRST diffs the snapshot MANIFESTS
    (per-partition file lists — metadata, thousands of rows at
    100 TB) and joins snapshot data ONLY for partitions whose file
    sets differ; untouched partitions are skipped by parquet
    partition pruning on both sides (the o_orderstatus IN (...)
    filter lands in PartitionFilters, zero data read). The join
    itself is a co-partitioned full-outer on the key with null-aware
    classification; at 100 TB both sides shuffle once on o_orderkey
    within only the touched partitions.
    """
    orders = _orders_base(spark, sf_dir)
    shutil.rmtree(_DIFF_TMP, ignore_errors=True)
    v1 = orders.where(F.col("o_orderkey") < 3000)
    v1.write.partitionBy("o_orderstatus").parquet(f"{_DIFF_TMP}/v1")

    upd = F.when(
        (F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 2000),
        F.col("o_totalprice") + 50000.0,
    ).otherwise(F.col("o_totalprice"))
    v2 = (
        orders.where(
            (F.col("o_orderkey") < 3000)
            & ~(
                (F.col("o_orderkey") < 1000)
                & (F.col("o_orderkey") % 7 == 0)
            )
        )
        .withColumn("o_totalprice", upd)
        .unionByName(
            orders.where(
                (F.col("o_orderkey") >= 3000)
                & (F.col("o_orderkey") < 3500)
            )
        )
    )
    v2.write.partitionBy("o_orderstatus").parquet(f"{_DIFF_TMP}/v2")

    # manifest diff: per-partition file fingerprints from the FS
    # listing (no data read). A partition participates in the data
    # diff only if its (name, size) file set changed.
    import os

    def manifest(root: str) -> dict[str, frozenset]:
        parts: dict[str, frozenset] = {}
        for d in os.listdir(root):
            if not d.startswith("o_orderstatus="):
                continue
            files = frozenset(
                (f, os.path.getsize(os.path.join(root, d, f)))
                for f in os.listdir(os.path.join(root, d))
                if f.endswith(".parquet")
            )
            parts[d.split("=", 1)[1]] = files
        return parts

    m1, m2 = manifest(f"{_DIFF_TMP}/v1"), manifest(f"{_DIFF_TMP}/v2")
    touched = sorted(
        p
        for p in set(m1) | set(m2)
        if m1.get(p) != m2.get(p)
    )
    if not touched:
        # empty-input contract: no rewritten partitions -> empty
        # change feed (reading a partitionless parquet dir would
        # fail schema inference)
        return spark.createDataFrame(
            [],
            "o_orderkey bigint, change_type string, "
            "price_pre double, price_post double",
        )
    # this batch touches every status at these SFs, but the pruning
    # filter is load-bearing at scale and the plan-quality test pins
    # it lands in PartitionFilters
    r1 = (
        spark.read.option("basePath", f"{_DIFF_TMP}/v1")
        .parquet(f"{_DIFF_TMP}/v1")
        .where(F.col("o_orderstatus").isin(touched))
        .select("o_orderkey", F.col("o_totalprice").alias("price_pre"))
    )
    r2 = (
        spark.read.option("basePath", f"{_DIFF_TMP}/v2")
        .parquet(f"{_DIFF_TMP}/v2")
        .where(F.col("o_orderstatus").isin(touched))
        .select("o_orderkey", F.col("o_totalprice").alias("price_post"))
    )
    diff = (
        r1.join(r2, "o_orderkey", "full_outer")
        .withColumn(
            "change_type",
            F.when(F.col("price_pre").isNull(), F.lit("insert"))
            .when(F.col("price_post").isNull(), F.lit("delete"))
            .when(
                F.col("price_pre") != F.col("price_post"), F.lit("update")
            ),
        )
        .where(F.col("change_type").isNotNull())
        .select("o_orderkey", "change_type", "price_pre", "price_post")
        .orderBy("o_orderkey")
    )
    return diff


SNAPSHOT_DIFF_SQL = """
WITH v1 AS (
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price_pre
    FROM orders WHERE o_orderkey < 3000
),
v2 AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey >= 1000 AND o_orderkey < 2000
                THEN CAST(o_totalprice AS DOUBLE) + 50000.0
                ELSE CAST(o_totalprice AS DOUBLE) END AS price_post
    FROM orders
    WHERE (o_orderkey < 3000
           AND NOT (o_orderkey < 1000 AND o_orderkey % 7 = 0))
       OR (o_orderkey >= 3000 AND o_orderkey < 3500)
)
SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
       CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
            WHEN v2.o_orderkey IS NULL THEN 'delete'
            WHEN price_pre <> price_post THEN 'update' END AS change_type,
       price_pre, price_post
FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
WHERE CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
           WHEN v2.o_orderkey IS NULL THEN 'delete'
           WHEN price_pre <> price_post THEN 'update' END IS NOT NULL
ORDER BY o_orderkey
"""


def agg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T23: algebraic incremental view maintenance of a monthly
    revenue rollup over lineitem. The materialized state holds
    PARTIAL aggregates (sum, count — mergeable monoids, the
    Tungsten partial-agg contract surfaced as a table); a new data
    slice contributes its own partials, and the refresh is
    merge = union → groupBy → SUM of partials. History is NEVER
    rescanned: refresh cost is O(new slice + |rollup|), not
    O(table) — the difference between a 100 TB backfill and a
    per-batch maintenance job.

    The contract splits lineitem by ship date: base = months before
    1998-06, delta = 1998-06 onward (the synthetic tail). Base
    partials persist to parquet (the materialized view), the delta's
    partials merge in, and the query returns the refreshed rollup
    with avg derived FROM the merged partials (sum/count — derived
    metrics must come from partials, never averaged averages).
    The oracle recomputes the whole rollup from scratch; equality IS
    the IVM correctness statement.

    Money stays EXACT DECIMAL through both aggregation stages (the
    functions.exact contract): a double revenue sum at sf1 reaches
    ~5e9 where the two-stage partial merge reorders more additions
    than the oracle's single pass, and the accumulated ulp error
    crossed a 2-dp rounding boundary (sf1 harness caught it —
    rows matched, two cells off by 0.01). Decimal partials make the
    merge bit-exact at every scale; the cast to double happens once,
    on the exact total.
    """
    from etl_npl_pipeline_spark.functions.exact import money, rate

    one = F.lit(1).cast("decimal(4,2)")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
        (money("l_extendedprice") * (one - rate("l_discount"))).alias(
            "rev"
        ),
    )
    shutil.rmtree(_IVM_TMP, ignore_errors=True)

    def partials(df: DataFrame) -> DataFrame:
        # p_sum stays decimal in the persisted state — parquet
        # round-trips the exact type, so the merge adds decimals
        return df.groupBy("ship_month").agg(
            F.sum("rev").alias("p_sum"), F.count(F.lit(1)).alias("p_n")
        )

    partials(li.where(F.col("ship_month") < "1998-06")).write.parquet(
        f"{_IVM_TMP}/state"
    )
    state = spark.read.parquet(f"{_IVM_TMP}/state")
    delta = partials(li.where(F.col("ship_month") >= "1998-06"))
    merged = (
        state.unionByName(delta)
        .groupBy("ship_month")
        .agg(F.sum("p_sum").alias("s"), F.sum("p_n").alias("n_items"))
        .select(
            "ship_month",
            F.col("s").cast("double").alias("revenue"),
            "n_items",
            F.round(
                F.col("s").cast("double") / F.col("n_items"), 6
            ).alias("avg_rev"),
        )
        .orderBy("ship_month")
    )
    return merged


_SQL_DISC = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)

AGG_INCREMENTAL_SQL = f"""
SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       CAST(SUM({_SQL_DISC}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items,
       ROUND(CAST(SUM({_SQL_DISC}) AS DOUBLE) / COUNT(*), 6) AS avg_rev
FROM lineitem
GROUP BY ship_month ORDER BY ship_month
"""


_STREAM_IVM_TMP = "/root/repo/.tmp/stream_agg_incremental"


def stream_agg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST12: STREAMING incremental view maintenance — the streaming
    twin of ``agg_incremental``. Events arrive as four micro-batches
    (the input is re-sharded into four files, maxFilesPerTrigger=1);
    each batch writes ONLY its own partial aggregates (sum, count
    per event_type) to a batch-id-versioned delta dir, and the
    refreshed rollup is the monoid merge of all deltas. History is
    never rescanned; a replayed batch_id overwrites its own dir
    (foreachBatch is at-least-once — idempotence comes from the
    deterministic dir name, the stream_upsert_mor doctrine), so the
    final state is exactly-once and batch-packing-independent:
    sum/count are associative-commutative, which is precisely why
    the oracle can replay the WHOLE rollup as one batch aggregate.
    """
    import os

    ev_batch = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.col("value").cast("double").alias("value")
    )
    shutil.rmtree(_STREAM_IVM_TMP, ignore_errors=True)
    # re-shard into 4 files so the file stream delivers 4 real
    # micro-batches (one parquet in sf_dir = one batch otherwise)
    for i in range(4):
        ev_batch.where(F.col("event_id") % 4 == i).coalesce(1).write.parquet(
            f"{_STREAM_IVM_TMP}/in/s={i}"
        )
    stream = (
        spark.readStream.schema("event_id bigint, event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(f"{_STREAM_IVM_TMP}/in")
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.groupBy("event_type").agg(
            F.sum("value").alias("p_sum"), F.count(F.lit(1)).alias("p_n")
        ).write.mode("overwrite").parquet(
            f"{_STREAM_IVM_TMP}/deltas/b={batch_id}"
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{_STREAM_IVM_TMP}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = len(
        [d for d in os.listdir(f"{_STREAM_IVM_TMP}/deltas") if d.startswith("b=")]
    )
    state = spark.read.option(
        "basePath", f"{_STREAM_IVM_TMP}/deltas"
    ).parquet(f"{_STREAM_IVM_TMP}/deltas")
    return (
        state.groupBy("event_type")
        .agg(F.sum("p_sum").alias("s"), F.sum("p_n").alias("n_events"))
        .select(
            "event_type",
            F.round(F.col("s"), 4).alias("total_value"),
            "n_events",
            F.lit(n_batches).alias("n_batches"),
        )
        .orderBy("event_type")
    )


STREAM_AGG_INCREMENTAL_SQL = """
SELECT event_type,
       ROUND(SUM(CAST(value AS DOUBLE)), 4) AS total_value,
       COUNT(*) AS n_events,
       4 AS n_batches
FROM events
GROUP BY event_type ORDER BY event_type
"""
