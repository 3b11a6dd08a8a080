"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` maps every implemented SURVEY.md §2 operator to a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the
DuckDB-equivalent ANSI SQL for each (omitted → rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_npl_pipeline_spark.plans import (
    extras,
    llmdata,
    npl,
    profiling,
    reference_ops as rops,
    tpch,
    tpch_extra,
    tpch_more,
    tpch_rest,
)

QueryFn = Callable[[SparkSession, str], DataFrame]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return tpch.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, QueryFn]:
    return {
        "q1_pricing_summary": tpch.q1_pricing_summary,
        "q3_shipping_priority": tpch.q3_shipping_priority,
        "q5_local_supplier": tpch.q5_local_supplier,
        "q6_forecast_revenue": tpch.q6_forecast_revenue,
        "q10_returned_items": tpch.q10_returned_items,
        "q18_large_orders": tpch.q18_large_orders,
        "q4_order_priority": tpch_extra.q4_order_priority,
        "q12_priority_shipping": tpch_extra.q12_priority_shipping,
        "q14_promo_revenue": tpch_extra.q14_promo_revenue,
        "q19_disjunctive": tpch_extra.q19_disjunctive,
        "q_rollup_region": tpch_extra.q_rollup_region,
        "q_cube_status_priority": tpch_extra.q_cube_status_priority,
        "q7_nation_volume": tpch_more.q7_nation_volume,
        "q8_market_share": tpch_more.q8_market_share,
        "q9_product_profit": tpch_more.q9_product_profit,
        "q13_order_distribution": tpch_more.q13_order_distribution,
        "q15_top_supplier": tpch_more.q15_top_supplier,
        "q17_small_quantity": tpch_more.q17_small_quantity,
        "q22_global_sales": tpch_more.q22_global_sales,
        "q2_min_cost_supplier": tpch_rest.q2_min_cost_supplier,
        "q11_important_parts": tpch_rest.q11_important_parts,
        "q16_part_supplier_counts": tpch_rest.q16_part_supplier_counts,
        "q20_excess_shippers": tpch_rest.q20_excess_shippers,
        "q21_waiting_suppliers": tpch_rest.q21_waiting_suppliers,
        "q_top_parts_per_brand": tpch_extra.q_top_parts_per_brand,
        # reference-parity pipeline (SURVEY §2.2 T8/T12/T13/T15)
        "npl_by_segment": npl.npl_by_segment,
        "npl_assemble": npl.npl_assemble,
        "npl_quarterly": npl.npl_quarterly,
        # per-operator showcases (SURVEY §2.2)
        "fn_quarter_reformat": rops.fn_quarter_reformat,
        "fn_quarter_of_date": rops.fn_quarter_of_date,
        "fn_strip_suffix": rops.fn_strip_suffix,
        "fn_parse_number": rops.fn_parse_number,
        "op_ffill": rops.op_ffill,
        "op_melt": rops.op_melt,
        "op_pivot": rops.op_pivot,
        "op_quarter_agg": rops.op_quarter_agg,
        "op_rolling_avg": rops.op_rolling_avg,
        "op_yoy_growth": rops.op_yoy_growth,
        "op_filter_pushdown": rops.op_filter_pushdown,
        "op_segment": rops.op_segment,
        "src_json_props": rops.src_json_props,
        "events_sessionize": rops.events_sessionize,
        "events_window_agg": rops.events_window_agg,
        # LLM-data-pipeline ops (SURVEY §2.4)
        "text_lang_id": llmdata.text_lang_id,
        "text_quality": llmdata.text_quality,
        "text_token_count": llmdata.text_token_count,
        "text_fingerprint": llmdata.text_fingerprint,
        "dedup_exact": llmdata.dedup_exact,
        "dedup_ngram_jaccard": llmdata.dedup_ngram_jaccard,
        "dedup_components": llmdata.dedup_components,
        "dedup_chunks": llmdata.dedup_chunks,
        "dedup_survivors": llmdata.dedup_survivors,
        "dedup_minhash": llmdata.dedup_minhash,
        "dedup_simhash": llmdata.dedup_simhash,
        "dedup_embedding": llmdata.dedup_embedding,
        "ann_topk": llmdata.ann_topk,
        "ann_lsh": llmdata.ann_lsh,
        "ann_ivf": llmdata.ann_ivf,
        "text_scrub": llmdata.text_scrub,
        "text_commonness": llmdata.text_commonness,
        "data_split": llmdata.data_split,
        # streaming / multimodal / sources (SURVEY §2.1, §2.4 L12, §2.5)
        "stream_events_window": extras.stream_events_window,
        "stream_sessionize": extras.stream_sessionize_q,
        "stream_dedup_events": extras.stream_dedup_events,
        "events_quantiles": profiling.events_quantiles,
        "profile_orders": profiling.profile_orders,
        "events_hopping_window": profiling.events_hopping_window,
        "events_asof_join": profiling.events_asof_join,
        "events_session_window": profiling.events_session_window,
        "stream_static_join": extras.stream_static_join,
        "stream_stream_join": extras.stream_stream_join,
        "events_range_join": extras.events_range_join,
        "events_gapfill": extras.events_gapfill,
        "mm_decode_meta": extras.mm_decode_meta,
        "mm_frame_sample": extras.mm_frame_sample,
        "src_csv_roundtrip": extras.src_csv_roundtrip,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": tpch.Q1_SQL,
        "q3_shipping_priority": tpch.Q3_SQL,
        "q5_local_supplier": tpch.Q5_SQL,
        "q6_forecast_revenue": tpch.Q6_SQL,
        "q10_returned_items": tpch.Q10_SQL,
        "q18_large_orders": tpch.Q18_SQL,
        "q4_order_priority": tpch_extra.Q4_SQL,
        "q12_priority_shipping": tpch_extra.Q12_SQL,
        "q14_promo_revenue": tpch_extra.Q14_SQL,
        "q19_disjunctive": tpch_extra.Q19_SQL,
        "q_rollup_region": tpch_extra.Q_ROLLUP_SQL,
        "q_cube_status_priority": tpch_extra.Q_CUBE_SQL,
        "q7_nation_volume": tpch_more.Q7_SQL,
        "q8_market_share": tpch_more.Q8_SQL,
        "q9_product_profit": tpch_more.Q9_SQL,
        "q13_order_distribution": tpch_more.Q13_SQL,
        "q15_top_supplier": tpch_more.Q15_SQL,
        "q17_small_quantity": tpch_more.Q17_SQL,
        "q22_global_sales": tpch_more.Q22_SQL,
        "q2_min_cost_supplier": tpch_rest.Q2_SQL,
        "q11_important_parts": tpch_rest.Q11_SQL,
        "q16_part_supplier_counts": tpch_rest.Q16_SQL,
        "q20_excess_shippers": tpch_rest.Q20_SQL,
        "q21_waiting_suppliers": tpch_rest.Q21_SQL,
        "q_top_parts_per_brand": tpch_extra.Q_TOP_PARTS_SQL,
        "npl_by_segment": npl.NPL_BY_SEGMENT_SQL,
        "npl_assemble": npl.NPL_ASSEMBLE_SQL,
        "npl_quarterly": npl.NPL_QUARTERLY_SQL,
        "fn_quarter_reformat": rops.FN_QUARTER_REFORMAT_SQL,
        "fn_quarter_of_date": rops.FN_QUARTER_OF_DATE_SQL,
        "fn_strip_suffix": rops.FN_STRIP_SUFFIX_SQL,
        "fn_parse_number": rops.FN_PARSE_NUMBER_SQL,
        "op_ffill": rops.OP_FFILL_SQL,
        "op_melt": rops.OP_MELT_SQL,
        "op_pivot": rops.OP_PIVOT_SQL,
        "op_quarter_agg": rops.OP_QUARTER_AGG_SQL,
        "op_rolling_avg": rops.OP_ROLLING_AVG_SQL,
        "op_yoy_growth": rops.OP_YOY_GROWTH_SQL,
        "op_filter_pushdown": rops.OP_FILTER_PUSHDOWN_SQL,
        "op_segment": rops.OP_SEGMENT_SQL,
        "src_json_props": rops.SRC_JSON_PROPS_SQL,
        "events_sessionize": rops.EVENTS_SESSIONIZE_SQL,
        "events_window_agg": rops.EVENTS_WINDOW_AGG_SQL,
        "text_lang_id": llmdata.TEXT_LANG_ID_SQL,
        "text_quality": llmdata.TEXT_QUALITY_SQL,
        "text_token_count": llmdata.TEXT_TOKEN_COUNT_SQL,
        "text_fingerprint": llmdata.TEXT_FINGERPRINT_SQL,
        "dedup_exact": llmdata.DEDUP_EXACT_SQL,
        "dedup_ngram_jaccard": llmdata.DEDUP_NGRAM_JACCARD_SQL,
        "dedup_components": llmdata.DEDUP_COMPONENTS_SQL,
        "dedup_chunks": llmdata.DEDUP_CHUNKS_SQL,
        "dedup_survivors": llmdata.DEDUP_SURVIVORS_SQL,
        "dedup_embedding": llmdata.DEDUP_EMBEDDING_SQL,
        "ann_topk": llmdata.ANN_TOPK_SQL,
        "text_scrub": llmdata.TEXT_SCRUB_SQL,
        "text_commonness": llmdata.TEXT_COMMONNESS_SQL,
        "data_split": llmdata.DATA_SPLIT_SQL,
        "stream_events_window": extras.STREAM_EVENTS_WINDOW_SQL,
        "stream_sessionize": extras.STREAM_SESSIONIZE_SQL,
        "stream_dedup_events": extras.STREAM_DEDUP_EVENTS_SQL,
        "events_quantiles": profiling.EVENTS_QUANTILES_SQL,
        "profile_orders": profiling.PROFILE_ORDERS_SQL,
        "events_hopping_window": profiling.EVENTS_HOPPING_WINDOW_SQL,
        "events_asof_join": profiling.EVENTS_ASOF_JOIN_SQL,
        "events_session_window": profiling.EVENTS_SESSION_WINDOW_SQL,
        "stream_static_join": extras.STREAM_STATIC_JOIN_SQL,
        "stream_stream_join": extras.STREAM_STREAM_JOIN_SQL,
        "events_range_join": extras.EVENTS_RANGE_JOIN_SQL,
        "events_gapfill": extras.EVENTS_GAPFILL_SQL,
        "mm_decode_meta": extras.MM_DECODE_META_SQL,
        "mm_frame_sample": extras.MM_FRAME_SAMPLE_SQL,
        "src_csv_roundtrip": extras.SRC_CSV_ROUNDTRIP_SQL,
        # dedup_minhash / dedup_simhash / ann_lsh are xxhash64-based
        # (engine-specific hashes) → rows-only driver check.
    }
