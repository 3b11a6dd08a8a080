"""Data profiling & distribution queries (SURVEY §2.3 A15-A17) —
the validation/QA surface of an ETL engine (the reference's
"data cleaning and validation" stage, README: Transform).

- exact percentiles: Spark's `percentile` uses the same linear
  interpolation as DuckDB's `quantile_cont` (verified bit-identical
  on this data), so the oracle holds without rounding.
- column profiling: one aggregation pass computes null counts,
  ranges, and distincts for every profiled column — never one scan
  per column.
- hopping windows: the batch twin of a sliding streaming window;
  window starts are emitted as epoch seconds so both engines
  compare on exact integers.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_npl_pipeline_spark.sources.tables import load_table


# --- A15: exact percentiles ---------------------------------------

def events_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.percentile("value", F.lit(0.5)).alias("p50"),
            F.percentile("value", F.lit(0.95)).alias("p95"),
            F.percentile("value", F.lit(0.99)).alias("p99"),
        )
        .orderBy("event_type")
    )


EVENTS_QUANTILES_SQL = """
SELECT event_type,
       quantile_cont(CAST(value AS DOUBLE), 0.5) AS p50,
       quantile_cont(CAST(value AS DOUBLE), 0.95) AS p95,
       quantile_cont(CAST(value AS DOUBLE), 0.99) AS p99
FROM events GROUP BY event_type ORDER BY event_type
"""


# --- A16: column profiling ----------------------------------------

def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile of the orders table: one row per profiled column with
    count/nulls/distinct/min/max (stringified so the frame is
    uniform).

    Shape: one pruned scan per column, each a
    ``groupBy(col).count()`` partial-agg followed by a tiny final
    agg over the distinct values, unioned. The tempting "one pass,
    N count_distincts" formulation compiles to an Expand that
    multiplies every input row x(N+1) before aggregating — measured
    30x slower at sf0.1 and strictly worse at scale (the expand
    shuffles N+1 copies of the table; this shape shuffles only each
    column's distinct values, and parquet pruning means total bytes
    read are identical)."""
    orders = load_table(spark, sf_dir, "orders")
    # (column, engine-stable string type): doubles stringify through
    # decimal(18,2) — Spark's double->string flips to scientific
    # notation at 1e7 ("9.999999999E7") where DuckDB stays plain;
    # decimal->string is plain in both engines
    cols = [
        ("o_orderkey", "string"),
        ("o_custkey", "string"),
        ("o_totalprice", "decimal(18,2)"),
        ("o_orderstatus", "string"),
    ]

    def prof(c: str, t: str) -> DataFrame:
        by_val = orders.groupBy(c).agg(F.count(F.lit(1)).alias("cnt"))
        return by_val.agg(
            F.sum("cnt").alias("n"),
            F.sum(
                F.when(F.col(c).isNull(), F.col("cnt")).otherwise(0)
            ).alias("nulls"),
            F.count(F.when(F.col(c).isNotNull(), 1)).alias("n_distinct"),
            F.min(c).cast(t).cast("string").alias("min_val"),
            F.max(c).cast(t).cast("string").alias("max_val"),
        ).select(
            F.lit(c).alias("col_name"),
            "n", "nulls", "n_distinct", "min_val", "max_val",
        )

    out = prof(*cols[0])
    for c, t in cols[1:]:
        out = out.unionAll(prof(c, t))
    return out.orderBy("col_name")


PROFILE_ORDERS_SQL = """
SELECT 'o_orderkey' AS col_name, COUNT(*) AS n,
       CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls,
       COUNT(DISTINCT o_orderkey) AS n_distinct,
       CAST(MIN(o_orderkey) AS VARCHAR) AS min_val,
       CAST(MAX(o_orderkey) AS VARCHAR) AS max_val FROM orders
UNION ALL
SELECT 'o_custkey', COUNT(*),
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT o_custkey),
       CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_totalprice', COUNT(*),
       CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT o_totalprice),
       CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
       CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*),
       CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT o_orderstatus),
       CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
FROM orders
ORDER BY col_name
"""


# --- A17: hopping (sliding) window --------------------------------

def events_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes: each event lands in
    exactly two windows. Start emitted as epoch seconds (exact int
    compare across engines)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").cast("long").alias("win_start"),
            "event_type",
            "n",
        )
        .orderBy("win_start", "event_type")
    )


EVENTS_HOPPING_WINDOW_SQL = """
WITH windows AS (
    SELECT event_type,
           unnest([CAST(floor(epoch(ts)/1800)*1800 AS BIGINT),
                   CAST(floor(epoch(ts)/1800)*1800 - 1800 AS BIGINT)]) AS win_start
    FROM events
)
SELECT win_start, event_type, COUNT(*) AS n
FROM windows GROUP BY 1, 2 ORDER BY 1, 2
"""


# --- A19b: native session window ----------------------------------

def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in session_window (5-minute gap) — the
    engine-native twin of the manual lag-based sessionize. Oracle
    reconstructs sessions with a cumulative gap-flag sum and
    compares per-user session counts and exact total duration in
    microseconds."""
    ev = load_table(spark, sf_dir, "events")
    sessions = ev.groupBy(
        F.session_window("ts", "5 minutes").alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            # session_window end = last event + gap; subtract the
            # constant gap per session to get exact event spans
            (
                F.sum(
                    F.col("w.end").cast("decimal(20,6)")
                    - F.col("w.start").cast("decimal(20,6)")
                )
                - F.count(F.lit(1)).cast("decimal(20,6)") * F.lit(300)
            )
            .cast("double")
            .alias("total_span_sec"),
        )
        .orderBy("user_id")
    )


EVENTS_SESSION_WINDOW_SQL = """
WITH marked AS (
    -- Spark's session end (last + gap) is EXCLUSIVE: an event at
    -- exactly prev+gap starts a new session, hence >= not >
    SELECT user_id, epoch(ts) AS sec,
           CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER (
                    PARTITION BY user_id ORDER BY epoch(ts), event_id
                ) >= 300.0 THEN 1 ELSE 0 END AS new_session
    FROM events
), sessioned AS (
    SELECT user_id, sec,
           SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY sec
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS sid
    FROM marked
), spans AS (
    SELECT user_id, sid, COUNT(*) AS n_events,
           CAST(MAX(sec) - MIN(sec) AS DECIMAL(20,6)) AS span
    FROM sessioned GROUP BY user_id, sid
)
SELECT user_id, COUNT(*) AS n_sessions, CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(SUM(span) AS DOUBLE) AS total_span_sec
FROM spans GROUP BY user_id ORDER BY user_id
"""


# --- A18: as-of join ----------------------------------------------

def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event, attach the value of the user's
    latest click at-or-before the purchase (backward as-of join),
    then aggregate per user. Oracle: DuckDB's native ASOF JOIN —
    the composed union+window operator must reproduce it exactly."""
    from etl_npl_pipeline_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        purchases, clicks, on="user_id", left_time="ts", right_time="ts",
        value_cols=["value"],
    )
    return (
        joined.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.count("value_asof").alias("n_matched"),
            F.sum(F.col("value_asof").cast("decimal(18,2)"))
            .cast("double")
            .alias("click_value_sum"),
        )
        .orderBy("user_id")
    )


EVENTS_ASOF_JOIN_SQL = """
WITH purchases AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), clicks AS (
    SELECT user_id, ts, value FROM events WHERE event_type = 'click'
), joined AS (
    SELECT p.user_id, c.value AS value_asof
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
)
SELECT user_id, COUNT(*) AS n_purchases,
       COUNT(value_asof) AS n_matched,
       CAST(SUM(CAST(value_asof AS DECIMAL(18,2))) AS DOUBLE) AS click_value_sum
FROM joined GROUP BY user_id ORDER BY user_id
"""


# --- A38: sketch profiling (approximate, the 100 TB path) ----------

def profile_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based profile per event_type: HyperLogLog++ distinct
    users and quantile-sketch medians. At 100 TB exact countDistinct
    shuffles every key and exact percentiles sort every group —
    sketches are mergeable map-side summaries with fixed memory, the
    only viable profile at that scale.

    Oracle contract (r7, upgraded from rows-only): the raw sketch
    outputs are engine-specific, so the query emits the accuracy
    ASSERTION instead — one exact-side pass in the SAME aggregation
    computes exact distincts and exact p45/p55 bracket quantiles,
    and the output carries ``users_ok`` (|HLL − exact| within
    max(5%, ±2)) and ``p50_ok`` (sketch median inside the exact
    p45–p55 bracket) booleans plus the exact row count. DuckDB
    replays (event_type, n, true, true) — any sketch drifting out
    of bound breaks the hash match. All-null groups assert true
    (no defined quantile to violate)."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("au"),
        F.count_distinct("user_id").alias("eu"),
        F.approx_percentile("value", 0.5, 10_000).alias("ap50"),
        # ONE exact-percentile aggregate for both brackets: each
        # percentile() call buffers every group value independently
        # (TypedImperativeAggregate), so the array form halves the
        # exact-side buffer build + serialization (r13)
        F.expr("percentile(value, array(0.45D, 0.55D))").alias("pb"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "event_type", "au", "eu", "ap50", "n",
        F.col("pb").getItem(0).alias("p45"),
        F.col("pb").getItem(1).alias("p55"),
    )
    users_ok = F.abs(F.col("au") - F.col("eu")) <= F.greatest(
        F.ceil(F.col("eu") * 0.05), F.lit(2)
    )
    p50_ok = F.col("ap50").between(F.col("p45"), F.col("p55"))
    return agg.select(
        "event_type",
        "n",
        F.coalesce(users_ok, F.lit(True)).alias("users_ok"),
        F.coalesce(p50_ok, F.lit(True)).alias("p50_ok"),
    ).orderBy("event_type")


PROFILE_SKETCHES_SQL = """
SELECT event_type, COUNT(*) AS n,
       true AS users_ok, true AS p50_ok
FROM events GROUP BY event_type ORDER BY event_type
"""


# --- A39: declarative data-quality suite ---------------------------

def dq_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-rule quality suite over orders (nulls, key uniqueness,
    range, domain, FK into customer) — one aggregation pass + one
    broadcast ref join (operators/quality.py), stacked to a
    (rule, n_violations) report."""
    from etl_npl_pipeline_spark.operators import quality as Q

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    rules = [
        Q.not_null("o_custkey"),
        Q.unique("o_orderkey"),
        Q.in_range("o_totalprice", 0, 10_000_000),
        Q.in_set("o_orderstatus", ["F", "O", "P"]),
        Q.ref("o_custkey", cust, "c_custkey"),
    ]
    return Q.run_checks(orders, rules)


DQ_ORDERS_SQL = """
WITH agg AS (
    SELECT
        CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn,
        COUNT(*) - COUNT(DISTINCT o_orderkey) AS uq,
        CAST(SUM(CASE WHEN o_totalprice IS NULL
                  OR o_totalprice NOT BETWEEN 0 AND 10000000
                 THEN 1 ELSE 0 END) AS BIGINT) AS rg,
        CAST(SUM(CASE WHEN o_orderstatus IS NULL
                  OR o_orderstatus NOT IN ('F', 'O', 'P')
                 THEN 1 ELSE 0 END) AS BIGINT) AS st,
        CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS rf
    FROM orders LEFT JOIN (SELECT DISTINCT c_custkey FROM customer)
        ON o_custkey = c_custkey
)
SELECT 'not_null_o_custkey' AS rule, nn AS n_violations FROM agg
UNION ALL SELECT 'unique_o_orderkey', uq FROM agg
UNION ALL SELECT 'range_o_totalprice', rg FROM agg
UNION ALL SELECT 'set_o_orderstatus', st FROM agg
UNION ALL SELECT 'ref_o_custkey', rf FROM agg
ORDER BY rule
"""


# --- A40: anomaly detection (z-score outliers) ---------------------

def events_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Values more than 3 population standard deviations from their
    event_type's mean. Mean/stddev come from ONE grouped pass
    (decimal-exact sums so both engines derive identical moments:
    var = E[x²] - E[x]², computed in double from exact sums), then a
    broadcast join back — no window over the full log needed."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    v = F.col("value").cast("decimal(12,2)")
    stats = (
        ev.groupBy("event_type")
        .agg(
            (F.sum(v).cast("double") / F.count(F.lit(1))).alias("mu"),
            F.sum((v * v).cast("decimal(24,4)")).cast("double").alias("sq"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .withColumn(
            "sigma",
            F.sqrt(F.col("sq") / F.col("cnt") - F.col("mu") * F.col("mu")),
        )
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .where(F.abs(F.col("value") - F.col("mu")) > 3 * F.col("sigma"))
        .select(
            "event_id",
            "event_type",
            "value",
            F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 4).alias("z"),
        )
        .orderBy("event_id")
    )


EVENTS_ANOMALIES_SQL = """
WITH stats AS (
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS mu,
           -- DECIMAL(19,2) operands force DuckDB onto the INT128
           -- multiply path ((12,2)x(12,2) rides INT64 and overflows
           -- at |value| ~ 1e8); product cast matches Spark's (24,4)
           CAST(SUM(CAST(CAST(value AS DECIMAL(19,2))
                         * CAST(value AS DECIMAL(19,2)) AS DECIMAL(24,4)))
                AS DOUBLE) AS sq,
           COUNT(*) AS cnt
    FROM events GROUP BY 1
), st2 AS (
    SELECT event_type, mu, sqrt(sq / cnt - mu * mu) AS sigma FROM stats
)
SELECT event_id, e.event_type AS event_type, value,
       ROUND((value - mu) / sigma, 4) AS z
FROM events e JOIN st2 ON e.event_type = st2.event_type
WHERE ABS(value - mu) > 3 * sigma
ORDER BY event_id
"""


# --- A46: per-window top-k event types ----------------------------

def events_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A46: trending-items analytics — top-3 event types per 15-min
    tumbling window by count (ties broken by event_type so the cut
    is deterministic). Window starts emitted as epoch seconds for
    exact integer compare across engines.

    Scale shape: one (window, type) shuffle agg with map-side
    partials, then a rank window PARTITIONED BY win_start — window
    count grows with time span, so partitions stay small and
    parallel; no global sort (final orderBy is presentation on an
    already-small result)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").cast("long").alias("win_start"),
            "event_type",
            "n",
        )
    )
    rk = Window.partitionBy("win_start").orderBy(
        F.col("n").desc(), F.col("event_type")
    )
    return (
        counts.withColumn("rk", F.row_number().over(rk))
        .where(F.col("rk") <= 3)
        .orderBy("win_start", "rk")
    )


EVENTS_WINDOWED_TOPK_SQL = """
WITH counts AS (
    SELECT CAST(floor(epoch(ts)/900)*900 AS BIGINT) AS win_start,
           event_type, COUNT(*) AS n
    FROM events GROUP BY 1, 2
), ranked AS (
    SELECT win_start, event_type, n,
           ROW_NUMBER() OVER (PARTITION BY win_start
                              ORDER BY n DESC, event_type) AS rk
    FROM counts
)
SELECT win_start, event_type, n, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= 3 ORDER BY win_start, rk
"""


# --- A47: hourly error-rate SLA report ----------------------------

def events_sla_breach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A47: the pipeline-operations view of the event stream —
    hourly total/error counts, error rate in basis points (exact
    integer arithmetic: 10000*errors/total floor-divided, so the
    compare is engine-exact with no float rounding contract), and
    the SLA breach flag at a 5% threshold. What a data-platform
    on-call actually pages on.

    Scale shape: ONE (hour) shuffle agg with map-side partials and
    conditional sums — no join, no second pass; output is bounded
    by the time span."""
    ev = load_table(spark, sf_dir, "events")
    hour = (F.floor(F.col("ts").cast("long") / 3600) * 3600).cast("long")
    return (
        ev.select(
            hour.alias("hour_start"),
            (F.col("event_type") == "error").cast("long").alias("is_err"),
        )
        .groupBy("hour_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("is_err").alias("n_errors"),
        )
        .select(
            "hour_start",
            "n_events",
            "n_errors",
            F.floor(F.lit(10000) * F.col("n_errors") / F.col("n_events"))
            .alias("err_bps"),
            (
                F.lit(10000) * F.col("n_errors")
                > F.lit(500) * F.col("n_events")
            ).cast("int").alias("sla_breach"),
        )
        .orderBy("hour_start")
    )


EVENTS_SLA_BREACH_SQL = """
WITH h AS (
    SELECT CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS hour_start,
           CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
    FROM events
)
SELECT hour_start,
       COUNT(*) AS n_events,
       CAST(SUM(is_err) AS BIGINT) AS n_errors,
       CAST(FLOOR(10000.0 * SUM(is_err) / COUNT(*)) AS BIGINT) AS err_bps,
       CAST(10000 * SUM(is_err) > 500 * COUNT(*) AS INT) AS sla_breach
FROM h GROUP BY hour_start ORDER BY hour_start
"""


# --- A48: CEP sequence-pattern matching over sessions -------------

CEP_GAP_SEC = 300.0
# view, then only views/clicks, then purchase — the conversion
# pattern with no intervening error/signup
CEP_PATTERN = "v[vc]*p"


def events_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A48: complex-event-processing pattern match (the
    MATCH_RECOGNIZE / Flink-CEP capability re-expressed in
    DataFrame algebra): per user session, does the ordered
    event-type sequence contain ``view (view|click)* purchase``?

    Shape: sessions and sequences come from ONE shuffle on user_id —
    the gap-flag window assigns session ids, and the per-(user,
    session) aggregation needs no second exchange because
    HashPartitioning(user) already clusters (user, session)
    (partitioning-is-subset-of-grouping; plan-pinned). The sequence
    is an array_sort(collect_list(struct)) per session — O(session
    length), bounded by the gap rule, never O(user history) — then
    one regexp over the compact type-initial string (event types map
    injectively to their first letters). Per-user rollup of matched
    sessions is a tiny second aggregate on the same clustering.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts").cast("double").alias("sec"),
        F.substring("event_type", 1, 1).alias("ch"),
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    sess = ev.withColumn(
        "new_session",
        F.when(
            F.col("sec") - F.lag("sec").over(w) > CEP_GAP_SEC, F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    seqs = (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("sec", "event_id", "ch")
                        )
                    ),
                    lambda s: s.getField("ch"),
                ),
            ).alias("seq")
        )
    )
    return (
        seqs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(
                F.col("seq").rlike(CEP_PATTERN).cast("int")
            ).alias("n_matched"),
        )
        .orderBy("user_id")
    )


EVENTS_CEP_PATTERN_SQL = f"""
WITH ev AS (
    SELECT user_id, event_id,
           CAST(epoch(ts) AS DOUBLE) AS sec,
           substr(event_type, 1, 1) AS ch
    FROM events
),
marked AS (
    SELECT *,
           CASE WHEN sec - LAG(sec) OVER w > {CEP_GAP_SEC} THEN 1
                ELSE 0 END AS new_session
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
),
sess AS (
    SELECT *,
           SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY sec, event_id
               ROWS UNBOUNDED PRECEDING
           ) AS session_id
    FROM marked
),
seqs AS (
    SELECT user_id, session_id,
           string_agg(ch, '' ORDER BY sec, event_id) AS seq
    FROM sess GROUP BY user_id, session_id
)
SELECT user_id,
       COUNT(*) AS n_sessions,
       CAST(SUM(CASE WHEN regexp_matches(seq, '{CEP_PATTERN}')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
FROM seqs GROUP BY user_id ORDER BY user_id
"""


# --- A49: Markov transition model over event sequences ------------

def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A49: first-order Markov transition matrix of user event
    streams — P(next event type | current), the behavioral-model
    featurizer (and the generator behind synthetic-session tools).
    Transitions follow each user's (ts, event_id)-ordered stream
    regardless of session boundaries (documented choice; the CEP
    operator owns session semantics).

    One shuffle on user_id for the lead window; the transition count
    is a |types|^2-group aggregate (25 here) with map-side partials,
    and the row-normalization runs as a window over that tiny
    aggregate — no join, no second data-sized exchange.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts").cast("double").alias("sec"),
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    pairs = ev.withColumn(
        "next_type", F.lead("event_type").over(w)
    ).where(F.col("next_type").isNotNull())
    counts = pairs.groupBy(
        F.col("event_type").alias("et_from"),
        F.col("next_type").alias("et_to"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return counts.select(
        "et_from",
        "et_to",
        "n",
        F.round(
            F.col("n")
            / F.sum("n").over(Window.partitionBy("et_from")),
            6,
        ).alias("p"),
    ).orderBy("et_from", "et_to")


EVENTS_MARKOV_TRANSITIONS_SQL = """
WITH ev AS (
    SELECT user_id, event_id, CAST(epoch(ts) AS DOUBLE) AS sec,
           event_type
    FROM events
),
pairs AS (
    SELECT event_type AS et_from,
           LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY sec, event_id
           ) AS et_to
    FROM ev
),
counts AS (
    SELECT et_from, et_to, COUNT(*) AS n
    FROM pairs WHERE et_to IS NOT NULL GROUP BY et_from, et_to
)
SELECT et_from, et_to, n,
       ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY et_from), 6) AS p
FROM counts ORDER BY et_from, et_to
"""


# --- A50: A/B experiment readout ----------------------------------

def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A50: two-variant experiment readout — the experimentation-
    platform primitive. Deterministic assignment (variant =
    user_id % 2 — hash-stable, the data_split doctrine: never
    rand()), per-user conversion = "did the user purchase at all",
    then the two-proportion z statistic on the variant split.

    Conversion = "purchase value total > 600.005" (the .005 offset
    sits between the 2-decimal value grid points, so the float cut
    can never straddle an engine-rounding boundary); "ever
    purchased" would be degenerate here (every user buys -> pooled
    rate 1 -> zero variance). Shape: one user-level aggregate
    (single shuffle on user_id, map-side partials), then a 2-row
    variant rollup; the z-score attaches via a scalar struct
    subquery over the 2x2 integer table — no join node. try_divide
    mirrors DuckDB's x/0.0 -> NULL, so a degenerate split reads as
    NULL rather than an ANSI abort.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.when(
            F.col("event_type") == "purchase", F.col("value").cast("double")
        ).otherwise(F.lit(0.0)).alias("pv"),
    )
    users = ev.groupBy("user_id").agg(
        (F.round(F.sum("pv"), 6) > 600.005).cast("int").alias("converted")
    )
    var = (
        users.groupBy((F.col("user_id") % 2).alias("variant"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("converted").alias("n_conv"),
        )
    )
    # pooled two-proportion z: all inputs are the 2x2 integer table,
    # assembled driver-free via a scalar struct subquery
    tot = var.agg(
        F.sum("n_users").alias("n"),
        F.sum("n_conv").alias("c"),
        F.sum(F.when(F.col("variant") == 0, F.col("n_conv"))).alias("c0"),
        F.sum(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n0"),
        F.sum(F.when(F.col("variant") == 1, F.col("n_conv"))).alias("c1"),
        F.sum(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n1"),
    ).select(F.struct("n", "c", "c0", "n0", "c1", "n1").alias("s"))
    t = tot.scalar()
    p0 = t.getField("c0") / t.getField("n0")
    p1 = t.getField("c1") / t.getField("n1")
    pp = t.getField("c") / t.getField("n")
    z = F.try_divide(
        p1 - p0,
        F.sqrt(
            pp * (1.0 - pp)
            * (1.0 / t.getField("n0") + 1.0 / t.getField("n1"))
        ),
    )
    return (
        var.select(
            "variant",
            "n_users",
            "n_conv",
            F.round(F.col("n_conv") / F.col("n_users"), 6).alias(
                "conv_rate"
            ),
            F.round(z, 6).alias("z_score"),
        )
        .orderBy("variant")
    )


EVENTS_AB_TEST_SQL = """
WITH users AS (
    SELECT user_id,
           CASE WHEN ROUND(SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(value AS DOUBLE) ELSE 0.0 END), 6)
                     > 600.005
                THEN 1 ELSE 0 END AS converted
    FROM events GROUP BY user_id
),
var AS (
    SELECT user_id % 2 AS variant,
           COUNT(*) AS n_users,
           CAST(SUM(converted) AS BIGINT) AS n_conv
    FROM users GROUP BY user_id % 2
),
tot AS (
    SELECT SUM(n_users) AS n, SUM(n_conv) AS c,
           SUM(CASE WHEN variant = 0 THEN n_conv END) AS c0,
           SUM(CASE WHEN variant = 0 THEN n_users END) AS n0,
           SUM(CASE WHEN variant = 1 THEN n_conv END) AS c1,
           SUM(CASE WHEN variant = 1 THEN n_users END) AS n1
    FROM var
)
SELECT variant, n_users, n_conv,
       ROUND(CAST(n_conv AS DOUBLE) / n_users, 6) AS conv_rate,
       ROUND((CAST(c1 AS DOUBLE)/n1 - CAST(c0 AS DOUBLE)/n0)
             / sqrt((CAST(c AS DOUBLE)/n) * (1.0 - CAST(c AS DOUBLE)/n)
                    * (1.0/n0 + 1.0/n1)), 6) AS z_score
FROM var CROSS JOIN tot ORDER BY variant
"""


# --- A51: customer cohort LTV matrix ------------------------------

def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A51: cohort lifetime-value matrix — customers grouped by
    first-order quarter, revenue tracked by quarter offset since
    acquisition (the BI retention/LTV view every warehouse serves).

    Shape: the acquisition quarter is a min-over-window on ONE
    o_custkey shuffle; the (cohort, offset) rollup reuses no row
    data beyond (custkey, quarter, price) and aggregates to
    |quarters|^2 cells with map-side partials. Revenue sums as
    EXACT DECIMAL (functions.exact.money — the agg_incremental
    contract: decimal partials are order-independent, so the
    partial-merge order can never flip the 2-dp boundary vs the
    oracle's single-pass sum); the cast to double happens once, on
    the exact total. Active-customer counts are exact distinct per
    cell.
    """
    from pyspark.sql import Window

    from etl_npl_pipeline_spark.functions.exact import money

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        money("o_totalprice").alias("price"),
        (F.year("o_orderdate") * 4
         + (F.quarter("o_orderdate") - 1)).alias("qn"),
    )
    w = Window.partitionBy("o_custkey")
    coh = o.withColumn("cohort_qn", F.min("qn").over(w))
    return (
        coh.groupBy(
            "cohort_qn",
            (F.col("qn") - F.col("cohort_qn")).alias("q_offset"),
        )
        .agg(
            F.countDistinct("o_custkey").alias("n_active"),
            F.round(F.sum("price").cast("double"), 2).alias("revenue"),
        )
        .select(
            F.concat(
                F.floor(F.col("cohort_qn") / 4).cast("int").cast("string"),
                F.lit("Q"),
                ((F.col("cohort_qn") % 4) + 1).cast("string"),
            ).alias("cohort"),
            "q_offset",
            "n_active",
            "revenue",
        )
        .orderBy("cohort", "q_offset")
    )


Q_COHORT_LTV_SQL = """
WITH o AS (
    SELECT o_custkey,
           CAST(o_totalprice AS DECIMAL(12,2)) AS price,
           year(o_orderdate) * 4 + (quarter(o_orderdate) - 1) AS qn
    FROM orders
),
coh AS (
    SELECT *, MIN(qn) OVER (PARTITION BY o_custkey) AS cohort_qn
    FROM o
)
SELECT CAST(CAST(FLOOR(cohort_qn / 4) AS INT) AS VARCHAR) || 'Q'
           || CAST((cohort_qn % 4) + 1 AS VARCHAR) AS cohort,
       qn - cohort_qn AS q_offset,
       COUNT(DISTINCT o_custkey) AS n_active,
       ROUND(CAST(SUM(price) AS DOUBLE), 2) AS revenue
FROM coh
GROUP BY cohort_qn, qn - cohort_qn
ORDER BY cohort, q_offset
"""


# --- A52: multi-touch attribution ----------------------------------

ATTR_LOOKBACK_HOURS = 72
ATTR_TOUCH_TYPES = ("click", "signup", "view")


def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A52 (r12): multi-touch conversion attribution — PATH-BASED
    (the GA-style model): every touch (view/click/signup) belongs to
    exactly one conversion path — the NEXT purchase by the same user
    in (ts, event_id) order — and is credited iff it falls inside
    that conversion's ATTR_LOOKBACK_HOURS window. Per path, the
    three standard models marketing warehouses serve side by side:
    first-touch, last-touch (with revenue), and linear.

    Path assignment WITHOUT a band join: grp = reverse cumulative
    purchase count per user (SUM(is_purchase) ordered by (ts,
    event_id) DESC) — a purchase and exactly the touches that
    precede it back to the previous purchase share one grp value, so
    conversions⋈touches is a 1:1-group EQUI-join on (user_id, grp).
    The lookback-window formulation ("every conversion looks back
    72h") joins each touch to EVERY conversion in its future window
    — Θ(touches × conversions-per-window) per user, quadratic in a
    hot user's (bot) activity. This shape is linear in events no
    matter how the keys skew: each touch row joins at most once.

    Determinism contract: touch order is (ts, event_id) — event_id
    breaks timestamp ties identically on both engines. Linear credit
    is EXACT INTEGER arithmetic: each conversion distributes
    1,000,000 ppm as floor(1e6 * touches_in_channel / n_touches)
    per channel (a double division whose operands are exact integers
    far from any representable-boundary hazard — quotients are
    rationals with denominator n, never within 1e-4 of an integer
    unless exact), so SUM(ppm) is order-independent. Revenue sums as
    exact decimal money. Conversions with NO credited touch keep
    their mass in the '(none)' row — credit is conserved:
    SUM(linear_ppm) + floor loss accounts for exactly 1e6 per
    conversion (pinned in tests).

    Scale shape: ONE user_id exchange serves the grp window, the
    conversions⋈touches equi-join, and the per-path windows
    (first/last) — the sessionize/funnel shape, a single keyed
    shuffle, skew-linear by construction.
    """
    from pyspark.sql import Window

    from etl_npl_pipeline_spark.functions.exact import money

    ev = load_table(spark, sf_dir, "events")
    is_conv = (F.col("event_type") == "purchase").cast("long")
    wg = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    e2 = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.sum(is_conv).over(wg).alias("grp"),
    )
    conv = e2.where(F.col("event_type") == "purchase").select(
        "user_id",
        "grp",
        F.col("event_id").alias("conv_id"),
        F.col("ts").alias("cts"),
        money("value").alias("rev"),
    )
    touch = e2.where(F.col("event_type").isin(*ATTR_TOUCH_TYPES)).select(
        F.col("user_id").alias("t_user"),
        F.col("grp").alias("t_grp"),
        F.col("ts").alias("tts"),
        F.col("event_id").alias("tid"),
        F.col("event_type").alias("channel"),
    )
    j = conv.join(
        touch,
        (conv.user_id == touch.t_user)
        & (conv.grp == touch.t_grp)
        & (
            F.col("tts")
            >= F.col("cts") - F.expr(f"INTERVAL {ATTR_LOOKBACK_HOURS} HOURS")
        ),
        "left",
    ).select("conv_id", "cts", "rev", "tts", "tid", "channel")

    wa = Window.partitionBy("conv_id").orderBy(
        F.asc("tts"), F.asc("tid")
    )
    wd = Window.partitionBy("conv_id").orderBy(
        F.desc("tts"), F.desc("tid")
    )
    ranked = j.select(
        "conv_id",
        "rev",
        "channel",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    firsts = (
        ranked.where(F.col("rn_a") == 1)
        .groupBy(F.coalesce("channel", F.lit("(none)")).alias("channel"))
        .agg(F.count(F.lit(1)).alias("first_touch"))
    )
    lasts = (
        ranked.where(F.col("rn_d") == 1)
        .groupBy(F.coalesce("channel", F.lit("(none)")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("last_touch"),
            F.round(F.sum("rev").cast("double"), 2).alias("last_touch_rev"),
        )
    )
    per_cc = (
        j.where(F.col("channel").isNotNull())
        .groupBy("conv_id", "channel")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_c = per_cc.groupBy("conv_id").agg(F.sum("cnt").alias("n"))
    linear = (
        per_cc.join(per_c, "conv_id")
        .select(
            "channel",
            F.floor(
                F.lit(1000000) * F.col("cnt").cast("double") / F.col("n")
            ).alias("ppm"),
        )
        .groupBy("channel")
        .agg(F.sum("ppm").alias("linear_ppm"))
    )
    untouched = (
        j.groupBy("conv_id")
        .agg(F.max("channel").alias("any_ch"))
        .where(F.col("any_ch").isNull())
        .agg(
            (F.count(F.lit(1)) * F.lit(1000000)).alias("linear_ppm")
        )
        .select(F.lit("(none)").alias("channel"), "linear_ppm")
        .where(F.col("linear_ppm") > 0)
    )
    linear = linear.unionByName(untouched)
    return (
        firsts.join(lasts, "channel", "full")
        .join(linear, "channel", "full")
        .select(
            "channel",
            F.coalesce("first_touch", F.lit(0)).alias("first_touch"),
            F.coalesce("last_touch", F.lit(0)).alias("last_touch"),
            F.coalesce("linear_ppm", F.lit(0)).alias("linear_ppm"),
            F.coalesce("last_touch_rev", F.lit(0.0)).alias("last_touch_rev"),
        )
        .orderBy("channel")
    )


EVENTS_ATTRIBUTION_SQL = f"""
WITH e2 AS (
    SELECT user_id, ts, event_id, event_type, value,
           SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id
                     ORDER BY ts DESC, event_id DESC
                     ROWS UNBOUNDED PRECEDING) AS grp
    FROM events
),
conv AS (
    SELECT user_id, grp, event_id AS conv_id, ts AS cts,
           CAST(value AS DECIMAL(12,2)) AS rev
    FROM e2 WHERE event_type = 'purchase'
),
touch AS (
    SELECT user_id, grp, ts AS tts, event_id AS tid,
           event_type AS channel
    FROM e2 WHERE event_type IN ('click', 'signup', 'view')
),
j AS (
    SELECT c.conv_id, c.rev, t.tts, t.tid, t.channel
    FROM conv c LEFT JOIN touch t
      ON t.user_id = c.user_id
     AND t.grp = c.grp
     AND t.tts >= c.cts - INTERVAL {ATTR_LOOKBACK_HOURS} HOURS
),
ranked AS (
    SELECT conv_id, rev, channel,
           ROW_NUMBER() OVER (
               PARTITION BY conv_id ORDER BY tts ASC, tid ASC
           ) AS rn_a,
           ROW_NUMBER() OVER (
               PARTITION BY conv_id ORDER BY tts DESC, tid DESC
           ) AS rn_d
    FROM j
),
firsts AS (
    SELECT COALESCE(channel, '(none)') AS channel,
           COUNT(*) AS first_touch
    FROM ranked WHERE rn_a = 1 GROUP BY 1
),
lasts AS (
    SELECT COALESCE(channel, '(none)') AS channel,
           COUNT(*) AS last_touch,
           ROUND(CAST(SUM(rev) AS DOUBLE), 2) AS last_touch_rev
    FROM ranked WHERE rn_d = 1 GROUP BY 1
),
per_cc AS (
    SELECT conv_id, channel, COUNT(*) AS cnt
    FROM j WHERE channel IS NOT NULL GROUP BY 1, 2
),
per_c AS (SELECT conv_id, SUM(cnt) AS n FROM per_cc GROUP BY 1),
linear AS (
    SELECT channel,
           SUM(FLOOR(1000000 * CAST(cnt AS DOUBLE) / n)) AS linear_ppm
    FROM per_cc JOIN per_c USING (conv_id) GROUP BY channel
    UNION ALL
    SELECT '(none)' AS channel, COUNT(*) * 1000000 AS linear_ppm
    FROM (
        SELECT conv_id FROM j GROUP BY conv_id
        HAVING MAX(channel) IS NULL
    )
    HAVING COUNT(*) > 0
)
SELECT COALESCE(f.channel, l.channel, ln.channel) AS channel,
       COALESCE(f.first_touch, 0) AS first_touch,
       COALESCE(l.last_touch, 0) AS last_touch,
       CAST(COALESCE(ln.linear_ppm, 0) AS BIGINT) AS linear_ppm,
       COALESCE(l.last_touch_rev, 0.0) AS last_touch_rev
FROM firsts f
FULL JOIN lasts l ON l.channel = f.channel
FULL JOIN linear ln ON ln.channel = COALESCE(f.channel, l.channel)
ORDER BY channel
"""


# --- A53: OHLC time-bucket downsampling -----------------------------

def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A53 (r12): hourly OHLC bars per event_type — the
    continuous-aggregate / downsampling shape time-series stores
    (metrics rollups, candlestick feeds) serve: open = value at the
    first event in the bucket, close = at the last, high/low =
    max/min, n = volume. First/last are tie-broken by (ts, event_id)
    — fully deterministic on both engines; value high/low/sums need
    no rounding (2-dp doubles compare exactly, and open/close are
    single picked values, not aggregates).

    Shape: ONE (event_type, bucket) exchange; open/close come from
    row_number windows over the same partitioning the aggregate
    uses, so Catalyst reuses the exchange (window + partial agg on
    one shuffle). Downsampling 100 TB of raw gauges to hourly bars
    is exactly this plan, scan-bound with O(types x buckets) output.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", "ts").alias("bucket"),
        "ts",
        "event_id",
        "value",
    )
    w = Window.partitionBy("event_type", "bucket")
    ranked = ev.select(
        "*",
        F.row_number()
        .over(w.orderBy(F.asc("ts"), F.asc("event_id")))
        .alias("rn_a"),
        F.row_number()
        .over(w.orderBy(F.desc("ts"), F.desc("event_id")))
        .alias("rn_d"),
    )
    return (
        ranked.groupBy("event_type", "bucket")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "event_type",
            F.col("bucket").cast("long").alias("bucket_epoch"),
            "open",
            "high",
            "low",
            "close",
            "n",
        )
        .orderBy("event_type", "bucket_epoch")
    )


EVENTS_OHLC_BARS_SQL = """
WITH e AS (
    SELECT event_type, date_trunc('hour', ts) AS bucket, ts, event_id, value
    FROM events
),
ranked AS (
    SELECT *,
           ROW_NUMBER() OVER (
               PARTITION BY event_type, bucket ORDER BY ts ASC, event_id ASC
           ) AS rn_a,
           ROW_NUMBER() OVER (
               PARTITION BY event_type, bucket ORDER BY ts DESC, event_id DESC
           ) AS rn_d
    FROM e
)
SELECT event_type,
       CAST(epoch(bucket) AS BIGINT) AS bucket_epoch,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       COUNT(*) AS n
FROM ranked GROUP BY event_type, bucket
ORDER BY event_type, bucket_epoch
"""


# --- A54: top user journeys (path analysis) ------------------------

PATH_LEN = 5    # events per user prefix
PATH_TOPK = 20  # journeys reported


def events_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A54 (r13): top user JOURNEYS — the sankey/path report every
    product-analytics engine ships (which event sequences do users
    actually follow?): each user's first PATH_LEN events (by ts,
    event_id tie-break) concatenate into a path string; paths are
    counted across users and the PATH_TOPK most common are reported
    (count desc, path asc — fully deterministic).

    Scale shape: the per-user prefix is ONE window over the
    (user_id)-partitioned events — rows beyond rank PATH_LEN drop
    before any aggregation, so path construction carries <= 5 rows
    per user regardless of user activity (bot users cannot skew the
    reduce); path counting is a groupBy on the path string with
    map-side partials, and the final top-k is a tiny sort. At
    100 TB: one shuffle on user_id (already the events layout for
    every sessionize op), one on the bounded path table.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prefix = ev.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= PATH_LEN
    )
    paths = (
        prefix.groupBy("user_id")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    wr = Window.orderBy(F.col("n_users").desc(), F.col("path").asc())
    return (
        paths.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= PATH_TOPK)
        .select("rank", "path", "n_users")
        .orderBy("rank")
    )


EVENTS_PATH_ANALYSIS_SQL = f"""
WITH ranked AS (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS rn
    FROM events
),
paths AS (
    SELECT user_id,
           string_agg(event_type, '>' ORDER BY rn) AS path
    FROM ranked WHERE rn <= {PATH_LEN}
    GROUP BY user_id
),
counted AS (
    SELECT path, COUNT(*) AS n_users FROM paths GROUP BY path
)
SELECT * FROM (
    SELECT ROW_NUMBER() OVER (
               ORDER BY n_users DESC, path ASC) AS rank,
           path, n_users
    FROM counted
)
WHERE rank <= {PATH_TOPK} ORDER BY rank
"""
