"""SparkSession factory tuned for both local testing and the
100 TB / 1000-executor target.

Local tests run ``local[*]`` single-JVM; the same conf keys are the
ones that matter on a real cluster (AQE, shuffle partitioning,
Arrow batching). Nothing here is machine-specific.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the local[32] test rig; on a cluster these are
# overridden by spark-submit conf. AQE coalesces small shuffle
# partitions at runtime, so a higher static number is safe at scale.
_LOCAL_SHUFFLE_PARTITIONS = "32"


def get_spark(app_name: str = "etl-npl-pipeline-spark") -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate conf.

    - AQE on: runtime coalescing, skew-join splitting, dynamic
      join-strategy switches — essential at 100 TB where static
      planning misguesses.
    - Arrow on: every pandas_udf / mapInPandas transfer is
      columnar-batched instead of pickled rows.
    - Broadcast threshold raised: dimension tables (region, nation,
      supplier, part at typical scale) should never shuffle-join.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    master = f"local[{cpus}]" if cpus else "local[*]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", _LOCAL_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet carries TIMESTAMP(NANOS), which the vectorized
        # reader rejects; read as long and convert in the catalog.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
