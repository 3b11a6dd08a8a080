from etl_npl_pipeline_spark.functions.cleaning import (  # noqa: F401
    parse_number,
    pct_to_ratio,
    quarter_of,
    reformat_quarter,
    shock_flag,
    strip_revision_suffix,
)
