"""Per-operator showcase queries — each §2.2 SURVEY entry gets a
query that exercises the operator on the synthetic tables with a
DuckDB-checkable result.

The input columns are sometimes *constructed* (e.g. building a
``Qx/YYYY`` string from a date before reformatting it) so the
operator's actual transformation path runs; the oracle computes the
expected result independently, not via the same code.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_npl_pipeline_spark.functions import (
    parse_number,
    pct_to_ratio,
    quarter_of,
    reformat_quarter,
    strip_revision_suffix,
)
from etl_npl_pipeline_spark.operators import (
    agg_by_quarter,
    ffill,
    melt,
    pivot_wide,
    segment,
)
from etl_npl_pipeline_spark.sources.tables import load_table

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


# --- T1: reformat_quarter ------------------------------------------

def fn_quarter_reformat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build ``Qn/YYYY`` strings from o_orderdate, run them through
    reformat_quarter, count per normalized quarter."""
    orders = load_table(spark, sf_dir, "orders")
    raw = F.concat(
        F.lit("Q"),
        F.quarter("o_orderdate").cast("string"),
        F.lit("/"),
        F.year("o_orderdate").cast("string"),
    )
    return (
        orders.select(reformat_quarter(raw).alias("quarter_std"))
        .groupBy("quarter_std")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("quarter_std")
    )


FN_QUARTER_REFORMAT_SQL = """
SELECT (YEAR(o_orderdate) || '-Q' || QUARTER(o_orderdate)) AS quarter_std,
       COUNT(*) AS n
FROM orders GROUP BY 1 ORDER BY 1
"""


# --- T2: quarter_of ------------------------------------------------

def fn_quarter_of_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(quarter_of("o_orderdate").alias("quarter"))
        .groupBy("quarter")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("quarter")
    )


FN_QUARTER_OF_DATE_SQL = """
SELECT (YEAR(o_orderdate) || '-Q' || QUARTER(o_orderdate)) AS quarter,
       COUNT(*) AS n
FROM orders GROUP BY 1 ORDER BY 1
"""


# --- T3: strip_revision_suffix -------------------------------------

def fn_strip_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append revision markers to o_orderpriority, strip them back,
    verify the distribution is unchanged."""
    orders = load_table(spark, sf_dir, "orders")
    suffixed = F.concat(
        F.col("o_orderpriority"),
        F.element_at(
            F.array(F.lit(" r"), F.lit(" p"), F.lit(" r1"), F.lit(" p1")),
            (F.col("o_orderkey") % 4 + 1).cast("int"),
        ),
    )
    return (
        orders.select(strip_revision_suffix(suffixed).alias("priority"))
        .groupBy("priority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("priority")
    )


FN_STRIP_SUFFIX_SQL = """
SELECT o_orderpriority AS priority, COUNT(*) AS n
FROM orders GROUP BY 1 ORDER BY 1
"""


# --- T4: parse_number / pct_to_ratio -------------------------------

def fn_parse_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse comma-grouped numbers built from o_orderkey and convert
    o_totalprice percent-points to ratios; aggregate both."""
    orders = load_table(spark, sf_dir, "orders")
    comma_str = F.concat(F.col("o_orderkey").cast("string"), F.lit(",500"))
    return orders.agg(
        # integer-valued doubles sum exactly in any order
        F.sum(parse_number(comma_str)).alias("parsed_sum"),
        # recover the exact 4-dp value, then exact decimal sum
        F.sum(pct_to_ratio(F.col("o_totalprice")).cast("decimal(18,4)"))
        .cast("double")
        .alias("ratio_sum"),
    )


FN_PARSE_NUMBER_SQL = """
SELECT SUM(CAST(o_orderkey * 1000 + 500 AS DOUBLE)) AS parsed_sum,
       CAST(SUM(CAST(o_totalprice / 100.0 AS DECIMAL(18,4))) AS DOUBLE) AS ratio_sum
FROM orders
"""


# --- T5: ffill -----------------------------------------------------

def op_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null out 'error' event values, forward-fill per user along
    time, then aggregate — exercises the window last(ignorenulls)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "v",
        F.when(F.col("event_type") == "error", F.lit(None).cast("double")).otherwise(
            F.col("value")
        ),
    )
    filled = ffill(ev, ["v"], order_by="ts", partition_by=["user_id"])
    return (
        filled.groupBy("user_id")
        .agg(
            F.sum(F.coalesce(F.col("v"), F.lit(0.0)).cast("decimal(18,2)"))
            .cast("double")
            .alias("v_sum")
        )
        .orderBy("user_id")
    )


OP_FFILL_SQL = """
WITH nulled AS (
    SELECT user_id, ts,
           CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
    FROM events
), filled AS (
    SELECT user_id,
           LAST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS v
    FROM nulled
)
SELECT user_id,
       CAST(SUM(CAST(COALESCE(v, 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS v_sum
FROM filled GROUP BY user_id ORDER BY user_id
"""


# --- T6: melt ------------------------------------------------------

def op_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    long = melt(
        li,
        id_vars=["l_orderkey"],
        value_vars=["l_quantity", "l_discount", "l_tax"],
        var_name="metric",
        value_name="val",
    )
    return (
        long.groupBy("metric")
        .agg(
            F.sum(F.col("val").cast("decimal(18,2)")).cast("double").alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("metric")
    )


OP_MELT_SQL = """
SELECT metric, CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS total,
       COUNT(*) AS n FROM (
    SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem
    UNION ALL SELECT 'l_discount', l_discount FROM lineitem
    UNION ALL SELECT 'l_tax', l_tax FROM lineitem
) GROUP BY metric ORDER BY metric
"""


def op_unpivot_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same reshape as op_melt through Spark's native DataFrame
    ``unpivot`` (ids/values/variable/value) instead of the stack()
    SQL generator — identical semantics and plan shape, so it
    shares op_melt's oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_orderkey"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="val",
    )
    return (
        long.groupBy("metric")
        .agg(
            F.sum(F.col("val").cast("decimal(18,2)")).cast("double").alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("metric")
    )


OP_UNPIVOT_NATIVE_SQL = OP_MELT_SQL


def events_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type median via Spark's native median() (exact
    percentile, linear interpolation between middle values) —
    DuckDB's median interpolates identically, so the comparison is
    value-exact."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.median("value").alias("med"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


EVENTS_MEDIAN_SQL = """
SELECT event_type, median(CAST(value AS DOUBLE)) AS med, COUNT(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


# --- T7: pivot_wide ------------------------------------------------

def op_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events long → wide: one column per event_type with avg value.
    Pivot values passed explicitly — no discovery pass."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("value").cast("decimal(18,2)").alias("vdec")
    )
    wide = pivot_wide(
        ev,
        index=["user_id"],
        key="event_type",
        value="vdec",
        values=EVENT_TYPES,
        agg="sum",
    )
    cols = [F.col("user_id")] + [
        F.col(t).cast("double").alias(t) for t in EVENT_TYPES
    ]
    return wide.select(*cols).orderBy("user_id")


OP_PIVOT_SQL = """
SELECT user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'click') AS DOUBLE) AS click,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'error') AS DOUBLE) AS error,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'signup') AS DOUBLE) AS signup,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'view') AS DOUBLE) AS view
FROM events GROUP BY user_id ORDER BY user_id
"""


# --- T9: agg_by_quarter --------------------------------------------

def op_quarter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        quarter_of("o_orderdate").alias("quarter"), "o_totalprice"
    )
    return agg_by_quarter(
        orders, "quarter", ["o_totalprice"], agg="avg", exact_scale=2
    ).orderBy("quarter")


OP_QUARTER_AGG_SQL = """
SELECT (YEAR(o_orderdate) || '-Q' || QUARTER(o_orderdate)) AS quarter,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           / COUNT(o_totalprice) AS o_totalprice
FROM orders GROUP BY 1 ORDER BY 1
"""


# --- T10: filter pushdown (contains / !=) --------------------------

def op_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-contains + inequality filters, like the reference's
    ``str.contains`` (src:186) and ``query("!=")`` (src:426); both
    push into the parquet scan."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.where(
            F.col("p_name").contains("widget") & (F.col("p_brand") != "Brand#13")
        )
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col("p_retailprice").cast("decimal(18,2)")).cast("double")
                / F.count("p_retailprice")
            ).alias("avg_price"),
        )
        .orderBy("p_type")
    )


OP_FILTER_PUSHDOWN_SQL = """
SELECT p_type, COUNT(*) AS n,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
           / COUNT(p_retailprice) AS avg_price
FROM part
WHERE p_name LIKE '%widget%' AND p_brand != 'Brand#13'
GROUP BY p_type ORDER BY p_type
"""


# --- T11: segment --------------------------------------------------

def op_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split customers into contains-matched segments (ref: the
    category dict split, src:184) and count each — reassembled into
    one frame with a segment tag column."""
    cust = load_table(spark, sf_dir, "customer")
    segs = segment(cust, "c_mktsegment", ["AUTO", "BUILD", "HOUSE"], contains=True)
    tagged = [
        df.select(F.lit(name).alias("seg"), "c_acctbal") for name, df in segs.items()
    ]
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return (
        out.groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("balance"),
        )
        .orderBy("seg")
    )


OP_SEGMENT_SQL = """
SELECT seg, COUNT(*) AS n,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS balance FROM (
    SELECT 'AUTO' AS seg, c_acctbal FROM customer WHERE c_mktsegment LIKE '%AUTO%'
    UNION ALL
    SELECT 'BUILD', c_acctbal FROM customer WHERE c_mktsegment LIKE '%BUILD%'
    UNION ALL
    SELECT 'HOUSE', c_acctbal FROM customer WHERE c_mktsegment LIKE '%HOUSE%'
) GROUP BY seg ORDER BY seg
"""


# --- T16: rolling window average -----------------------------------

def op_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-quarter rolling average of order totals — the smoothing
    pass a macro series gets before modeling (time-series analog of
    the reference's quarterly means). Decimal sums keep the rolling
    numerator exact."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        quarter_of("o_orderdate").alias("quarter"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    q = orders.groupBy("quarter").agg(
        F.sum("p").alias("tot_dec"), F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("quarter").rowsBetween(-3, 0)
    return q.select(
        "quarter",
        (F.sum("tot_dec").over(w).cast("double") / F.sum("n").over(w)).alias(
            "rolling_avg"
        ),
    ).orderBy("quarter")


OP_ROLLING_AVG_SQL = """
WITH q AS (
    SELECT (YEAR(o_orderdate) || '-Q' || QUARTER(o_orderdate)) AS quarter,
           SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS tot_dec,
           COUNT(*) AS n
    FROM orders GROUP BY 1
)
SELECT quarter,
       CAST(SUM(tot_dec) OVER w AS DOUBLE) / SUM(n) OVER w AS rolling_avg
FROM q
WINDOW w AS (ORDER BY quarter ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
ORDER BY quarter
"""


# --- T17: YoY growth (the reference's GDP-growth semantics) --------

def op_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth of quarterly revenue: (v - lag(v,4)) /
    lag(v,4), the exact semantics of the reference's GDP Growth
    (%YoY) series (src:363-410)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        quarter_of("o_orderdate").alias("quarter"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    q = orders.groupBy("quarter").agg(
        F.sum("p").cast("double").alias("rev")
    )
    w = Window.orderBy("quarter")
    prev = F.lag("rev", 4).over(w)
    return q.select(
        "quarter",
        "rev",
        ((F.col("rev") - prev) / prev).alias("yoy_growth"),
    ).orderBy("quarter")


OP_YOY_GROWTH_SQL = """
WITH q AS (
    SELECT (YEAR(o_orderdate) || '-Q' || QUARTER(o_orderdate)) AS quarter,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
    FROM orders GROUP BY 1
)
SELECT quarter, rev,
       (rev - LAG(rev, 4) OVER (ORDER BY quarter))
           / LAG(rev, 4) OVER (ORDER BY quarter) AS yoy_growth
FROM q ORDER BY quarter
"""


# --- S4: JSON flatten ----------------------------------------------

def src_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the events.props JSON string column and aggregate a
    field from it (pd.json_normalize parity, ref src:218)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type", F.from_json("props", "k INT").getField("k").alias("k")
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.sum("k").alias("k_sum"),
            (F.sum("k").cast("double") / F.count("k")).alias("k_avg"),
        )
        .orderBy("event_type")
    )


SRC_JSON_PROPS_SQL = """
SELECT event_type,
       CAST(SUM(CAST(props->>'$.k' AS INT)) AS BIGINT) AS k_sum,
       CAST(SUM(CAST(props->>'$.k' AS INT)) AS DOUBLE)
           / COUNT(CAST(props->>'$.k' AS INT)) AS k_avg
FROM events GROUP BY event_type ORDER BY event_type
"""


def src_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same JSON-props aggregation as src_json_props but through
    Spark 4's VARIANT type (parse_json + variant_get) instead of a
    fixed from_json schema — the semi-structured path for payloads
    whose shape isn't known at plan time. Shredding/pushdown happens
    engine-side; the plan stays schema-free until variant_get."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.variant_get(F.parse_json(F.col("props")), "$.k", "int").alias("k"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.sum("k").alias("k_sum"),
            (F.sum("k").cast("double") / F.count("k")).alias("k_avg"),
        )
        .orderBy("event_type")
    )


SRC_JSON_VARIANT_SQL = SRC_JSON_PROPS_SQL


# --- A7: sessionize ------------------------------------------------

def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts after >300 s of
    user inactivity. Pure window plan: one shuffle on user_id."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts").cast("double").alias("sec")
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    marked = ev.withColumn(
        "new_session",
        F.when(
            F.col("sec") - F.lag("sec").over(w) > 300.0, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    return (
        marked.groupBy("user_id")
        .agg(
            (F.sum("new_session") + 1).alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


EVENTS_SESSIONIZE_SQL = """
WITH marked AS (
    SELECT user_id,
           CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER (
                    PARTITION BY user_id ORDER BY epoch(ts), event_id
                ) > 300.0 THEN 1 ELSE 0 END AS new_session
    FROM events
)
SELECT user_id, CAST(SUM(new_session) + 1 AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM marked GROUP BY user_id ORDER BY user_id
"""


# --- A8: tumbling-window agg (streaming parity, batch form) --------

def events_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling window per event_type — the batch twin of the
    streaming windowed_counts (same grouping Structured Streaming
    runs incrementally with a watermark)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        # hour as epoch seconds: bigint on both engines — raw
        # timestamp columns round-trip at different arrow precisions
        # (ns vs us) and hash-mismatch even when values are equal.
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).cast("long").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("value_sum"),
        )
        .orderBy("hour", "event_type")
    )


EVENTS_WINDOW_AGG_SQL = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""
