from etl_npl_pipeline_spark.operators.reshape import (  # noqa: F401
    ffill,
    melt,
    pivot_wide,
)
from etl_npl_pipeline_spark.operators.relational import (  # noqa: F401
    agg_by_quarter,
    merge_chain,
    segment,
)
