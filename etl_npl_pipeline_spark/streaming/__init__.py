from etl_npl_pipeline_spark.streaming.events import (  # noqa: F401
    run_stream_to_memory,
    stream_sessionize,
    stream_windowed_counts,
)
