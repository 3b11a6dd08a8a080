"""PySpark-native analytics engine with the capabilities of
jiratarij/ETL-NPL-Pipeline, extended with large-scale
training-data-pipeline operators (dedup, similarity search,
multimodal plumbing, text analysis).

Everything is expressed Spark-first: DataFrame/SQL plans optimized
by Catalyst, Arrow-batched pandas UDFs only where JVM builtins
cannot express the semantics, Structured Streaming for streams.
"""

__version__ = "0.1.0"

from etl_npl_pipeline_spark.session import get_spark  # noqa: F401
