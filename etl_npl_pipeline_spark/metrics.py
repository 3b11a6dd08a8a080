"""Physical execution metrics capture — the host-independent half of
the scale doctrine.

Wall-time gates wobble with the host (the r6→r7 drift adjudication
measured ±40% suite-context swings on identical code); the BYTES a
plan shuffles, scans and spills do not. This module reads Spark's
AppStatusStore (the same store the UI serves) after an action and
reports per-run deltas, so bench and the sf1 scale harness can pin
"shuffle bytes grow at most linearly with data" — a gate no amount
of host noise can fake.

Mechanics: snapshot the set of completed stage IDs, run the action,
then sum metrics over ONLY the stages that appeared since. Keying by
stage ID (not cumulative totals) makes the delta immune to the
store's retained-stage eviction and to anything an earlier query
left behind. Driver-side cost is O(stages) on a bounded in-memory
store — no listener callbacks, no extra conf.
"""

from __future__ import annotations

import time
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

#: StageData getters summed into the report, in output order.
_FIELDS = (
    ("shuffle_write_bytes", "shuffleWriteBytes"),
    ("shuffle_write_records", "shuffleWriteRecords"),
    ("shuffle_read_bytes", "shuffleReadBytes"),
    ("input_bytes", "inputBytes"),
    ("output_bytes", "outputBytes"),
    ("memory_spill_bytes", "memoryBytesSpilled"),
    ("disk_spill_bytes", "diskBytesSpilled"),
    ("executor_run_ms", "executorRunTime"),
    ("num_tasks", "numTasks"),
)


def _stage_list(spark: SparkSession):
    store = spark._jsc.sc().statusStore()
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    return store.stageList(
        jvm.java.util.ArrayList(),  # all statuses
        False,
        False,
        gw.new_array(gw.jvm.double, 0),  # no task-metric quantiles
        jvm.java.util.ArrayList(),
    )


def _snapshot(spark: SparkSession) -> dict[int, Any]:
    sl = _stage_list(spark)
    return {sl.apply(i).stageId(): sl.apply(i) for i in range(sl.size())}


def run_with_metrics(
    spark: SparkSession,
    df: DataFrame | Callable[[], None],
) -> dict[str, int | float]:
    """Execute ``df`` (noop write — full plan, nothing collected) or
    a zero-arg action, and return the physical metrics of exactly the
    stages that ran for it, plus wall seconds and stage count."""
    before = set(_snapshot(spark))
    t0 = time.time()
    if isinstance(df, DataFrame):
        df.write.format("noop").mode("overwrite").save()
    else:
        df()
    wall = time.time() - t0
    after = _snapshot(spark)
    new = [s for sid, s in after.items() if sid not in before]
    out: dict[str, int | float] = {k: 0 for k, _ in _FIELDS}
    for s in new:
        for key, getter in _FIELDS:
            out[key] += getattr(s, getter)()
    out["stages"] = len(new)
    out["wall_sec"] = round(wall, 3)
    return out
