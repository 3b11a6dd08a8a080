"""Structured Streaming over the events table.

The stream source is the events parquet read incrementally
(``readStream``); tests and the driver run with
``trigger(availableNow=True)`` so the stream drains the backlog and
stops — semantically the production shape (watermark + windowed
state) with a bounded run.

- ``stream_windowed_counts``: event-time tumbling window + watermark.
  With availableNow over a bounded input it produces exactly the
  batch tumbling-window aggregation (events_window_agg), which is
  what the oracle checks.
- ``stream_sessionize``: custom stateful operator via
  ``applyInPandasWithState`` — gap-based sessions per user with a
  processing-timeout flush. The per-group state is a pandas-side
  dict; Arrow batches move the data.

Scale notes: watermarks bound state; the window agg shuffles on
(window, event_type) with partial aggregation; the stateful op
shuffles once on user_id. Nanos timestamps are normalized to
micros exactly as the batch catalog does.
"""

from __future__ import annotations

import os
import uuid

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from etl_npl_pipeline_spark.functions.exact import MONEY

_RAW_SCHEMA_TMPL = (
    "event_id BIGINT, ts {ts_type}, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over events.parquet normalized to micros TIMESTAMP
    (same normalization as sources.tables.load_table)."""
    # Self-sufficient under ANY SparkSession (see sources.tables.load_table):
    # a nanos physical type needs nanosAsLong even with an explicit
    # BIGINT schema, and window boundaries assume a UTC session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # The events ts physical type differs across testdata generations
    # (TIMESTAMP(NANOS) → bigint under nanosAsLong vs timestamp[us] →
    # TIMESTAMP_NTZ); probe it with a metadata-only batch read so the
    # explicit stream schema matches the files.
    probe = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = dict(probe.dtypes)["ts"]
    # the streaming file source wants a directory; select just the
    # events file out of the shared sf_dir with a glob filter
    raw = (
        spark.readStream.schema(_RAW_SCHEMA_TMPL.format(ts_type=ts_type))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if ts_type == "bigint":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window counts/sums per event_type with a
    10-minute watermark (streaming twin of events_window_agg)."""
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(MONEY)).cast("double").alias("value_sum"),
        )
        .select(
            F.col("window.start").alias("hour"),
            "event_type",
            "n",
            "value_sum",
        )
    )
    return run_stream_to_memory(
        agg, output_mode="complete", label="stream_events_window"
    )


_SESSION_STATE = StructType(
    [StructField("last_sec", LongType()), StructField("n_sessions", IntegerType())]
)
_SESSION_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_sessions", IntegerType()),
        StructField("n_events", IntegerType()),
    ]
)
GAP_SECONDS = 300


def _session_fn(key, pdfs, state: GroupState):
    """Per-user session counter: a new session starts after a gap of
    more than GAP_SECONDS between consecutive events."""
    if state.hasTimedOut:
        (last_sec, n_sessions) = state.get
        state.remove()
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [0]}
        )
        return
    rows = pd.concat(list(pdfs))
    secs = rows["sec"].sort_values().to_numpy()
    if state.exists:
        last_sec, n_sessions = state.get
    else:
        last_sec, n_sessions = None, 0
    n_events = len(secs)
    for s in secs:
        if last_sec is None or s - last_sec > GAP_SECONDS * 1_000_000:
            n_sessions += 1
        last_sec = int(s)
    state.update((last_sec, n_sessions))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
    )


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user gap-based session counts (streaming twin of
    events_sessionize)."""
    ev = events_stream(spark, sf_dir).select(
        "user_id", (F.col("ts").cast("double") * 1_000_000).cast("long").alias("sec")
    )
    # NoTimeout: the availableNow drain ends the stream after the
    # backlog — idle-group timeout flushes (ProcessingTimeTimeout)
    # are for continuously running streams and stall this trigger.
    sessions = ev.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=_SESSION_OUT,
        stateStructType=_SESSION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # 8 state partitions (the drain default since r4): each partition
    # is a parallel applyInPandasWithState Python worker, and the
    # extra parallelism outweighs the per-partition state-commit cost
    # (measured: 1.5 s at 8 vs 2.2 s at 4, sf0.1 — and the same
    # sweep moved stream_user_totals 1.8 s -> 1.4 s steady-state).
    return run_stream_to_memory(
        sessions, output_mode="update", label="stream_sessionize"
    )


_TWS_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("cents", LongType()),
    ]
)


try:
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor
except ImportError:  # pragma: no cover - pre-4.0 pyspark
    StatefulProcessor = object  # type: ignore[assignment,misc]


class _UserTotalsProcessor(StatefulProcessor):
    """StatefulProcessor for transformWithStateInPandas (the Spark 4
    arbitrary-state API, successor of applyInPandasWithState):
    per-user running (event count, value cents) in a ValueState.

    Exactness contract: cents are computed JVM-side (decimal cast)
    BEFORE the stateful op, so the processor only adds int64 —
    order- and batch-boundary-independent, hence oracle-checkable.
    """

    def init(self, handle) -> None:
        self._state = handle.getValueState(
            "totals", "n BIGINT, cents BIGINT"
        )

    def handleInputRows(self, key, rows, timerValues):
        n, cents = (0, 0)
        if self._state.exists():
            n, cents = self._state.get()
        for pdf in rows:
            n += len(pdf)
            cents += int(pdf["cents"].sum())
        self._state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "cents": [cents]}
        )

    def close(self) -> None:
        pass


def _tws_available() -> bool:
    """transformWithStateInPandas needs protobuf for its state-server
    protocol; absent in some containers (including this one)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _user_totals_fn(key, pdfs, state: GroupState):
    """applyInPandasWithState twin of _UserTotalsProcessor — same
    int64-cents accumulation, same output schema."""
    if state.hasTimedOut:  # pragma: no cover - NoTimeout below
        state.remove()
        return
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int(pdf["cents"].sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "cents": [cents]}
    )


def stream_user_totals(
    spark: SparkSession, sf_dir: str, api: str = "auto"
) -> DataFrame:
    """Running per-user totals (event count + exact value cents) as
    a custom stateful streaming operator, drained with availableNow
    and folded to final rows (update-mode sinks may emit a user once
    per micro-batch; max() of monotonic counters takes the final
    state).

    ``api``: 'tws' = Spark 4 transformWithStateInPandas
    (StatefulProcessor + ValueState — needs protobuf in the python
    env), 'applyInPandasWithState' = the 3.4-era API, 'auto' = tws
    when available, else fallback. Both paths produce identical
    output (the exactness contract lives in the JVM-side cents
    cast, not the state API).
    """
    if api == "auto":
        api = "tws" if _tws_available() else "applyInPandasWithState"
    ev = events_stream(spark, sf_dir).select(
        "user_id",
        (F.col("value").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    if api == "tws":
        out = ev.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_UserTotalsProcessor(),
            outputStructType=_TWS_OUT,
            outputMode="Update",
            timeMode="None",
        )
    else:
        out = ev.groupBy("user_id").applyInPandasWithState(
            _user_totals_fn,
            outputStructType=_TWS_OUT,
            stateStructType="n BIGINT, cents BIGINT",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    mem = run_stream_to_memory(
        out, output_mode="update", label="stream_user_totals"
    )
    # Update mode emits one row per user per micro-batch; keep the
    # LAST emitted state per user. n_events grows monotonically, so
    # max over struct(n_events, cents) picks both fields from that
    # same final-state row — independent max(cents) would silently
    # return a stale intermediate if any event value were negative.
    return (
        mem.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "cents")).alias("s"))
        .select(
            "user_id",
            F.col("s.n_events").alias("n_events"),
            F.col("s.cents").alias("cents"),
        )
        .orderBy("user_id")
    )


# StreamingQueryProgress summaries of every drain this process ran,
# keyed by the caller's label (unlabeled drains key by the memory
# sink's generated name). bench.py publishes this to
# bench_detail.json["streaming_progress"]; tests gate state bounds
# on it. Each entry: batches, input_rows, duration_ms, and the MAX
# stateOperators numRowsTotal across batches — the number that must
# stay bounded for the watermark-eviction story to be real.
DRAIN_PROGRESS: dict[str, dict] = {}


# recentProgress is a ring buffer capped by
# spark.sql.streaming.numRecentProgressUpdates (default 100); a drain
# longer than the cap would silently under-count batches and could
# miss the true state_rows_max peak. The drain harnesses raise the
# cap to this value for the query's lifetime, and _progress_summary
# records a truncation flag if a drain ever hits it anyway.
PROGRESS_BUFFER = 10_000


from contextlib import contextmanager


@contextmanager
def drain_confs(spark: SparkSession, state_partitions: int = 8):
    """Scoped session confs for a ONE-SHOT availableNow drain — the
    discipline run_stream_to_memory/run_stream_to_dir apply inline,
    factored out so foreachBatch-style drains (ST15/ST16/ST17) get
    the same treatment:

    - whole-stage codegen OFF: a bounded drain runs each micro-batch
      plan ONCE, so janino compilation never amortizes and dominates
      the drain wall-clock (measured at sf0.1: ~1.25 s interpreted
      vs 1.5-3.4 s compiled, identical results). Long-lived
      production streams keep codegen on — the pin is scoped to the
      drain and restored after.
    - shuffle partitions pinned small: stateful queries open/commit
      one state-store partition per shuffle partition per batch, and
      even stateless foreachBatch aggregations plan their exchanges
      at query start from this conf. On a real cluster size it to
      ingest parallelism instead.
    """
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_cg = spark.conf.get("spark.sql.codegen.wholeStage")
    try:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(state_partitions)
        )
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set("spark.sql.codegen.wholeStage", prev_cg)


def _progress_summary(q, output_mode: str) -> dict:
    import json as _json

    progress = list(q.recentProgress)
    summary = {
        "output_mode": output_mode,
        "batches": 0,
        "input_rows": 0,
        "duration_ms": 0,
        "state_rows_max": 0,
        "state_rows_last": 0,
    }
    if len(progress) >= PROGRESS_BUFFER:  # pragma: no cover - guard
        summary["progress_truncated"] = True
    for p in progress:
        d = _json.loads(p.json) if hasattr(p, "json") else p
        summary["batches"] += 1
        summary["input_rows"] += int(d.get("numInputRows") or 0)
        summary["duration_ms"] += int(
            (d.get("durationMs") or {}).get("triggerExecution") or 0
        )
        state_total = sum(
            int(op.get("numRowsTotal") or 0)
            for op in (d.get("stateOperators") or [])
        )
        summary["state_rows_max"] = max(summary["state_rows_max"], state_total)
        summary["state_rows_last"] = state_total
    # drain throughput: rows ingested per second of trigger
    # execution — the streaming tier's per-round perf number
    # (whole-drain wall time also includes plan/setup; this is the
    # steady ingest rate a capacity plan would use)
    if summary["duration_ms"] > 0:
        summary["rows_per_sec"] = round(
            summary["input_rows"] / (summary["duration_ms"] / 1000.0), 1
        )
    return summary


def run_stream_to_memory(
    sdf: DataFrame,
    output_mode: str = "append",
    state_partitions: int = 8,
    label: str | None = None,
) -> DataFrame:
    """Drain a streaming frame with availableNow into a memory sink
    and return the materialized result as a batch DataFrame.

    Every drain records a StreamingQueryProgress summary in
    DRAIN_PROGRESS[label] (batches, input rows, trigger time, max/
    final state rows) — streaming state growth is observable and
    gateable instead of asserted.

    Engine constraint (pinned in tests/test_streaming_pre_epoch.py):
    Spark's watermark initializes at epoch 0 and only advances, so
    in APPEND/UPDATE mode every event with event time before
    1970-01-01 UTC is dropped as late in its first micro-batch —
    the batch twins process such rows fine, and complete mode keeps
    them (late filtering is disabled there). Pre-epoch event time is
    therefore outside the watermarked-streaming contract; remap or
    batch-process historical archives that old.

    Stateful streaming queries pin their state-store partition count
    to ``spark.sql.shuffle.partitions`` at query start; each state
    partition pays a fixed open/commit cost per micro-batch, so a
    drain-style run with the batch default (32) spends more time in
    HDFSBackedStateStore bookkeeping than in the operator. Pin a
    smaller count for the stream only and restore the session conf
    after the drain. On a real cluster with a long-lived stream,
    size this to match ingest parallelism instead.
    """
    spark = sdf.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_cg = spark.conf.get("spark.sql.codegen.wholeStage")
    prev_pb = spark.conf.get("spark.sql.streaming.numRecentProgressUpdates")
    name = f"mem_{uuid.uuid4().hex[:12]}"
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        spark.conf.set(
            "spark.sql.streaming.numRecentProgressUpdates",
            str(PROGRESS_BUFFER),
        )
        # A bounded drain runs each micro-batch plan ONCE — janino
        # whole-stage compilation never amortizes and dominates the
        # wall-clock (measured at sf0.1: ~1.25 s interpreted vs
        # 1.5-3.4 s compiled for the stateful drains, identical
        # results). Long-lived production streams should keep codegen:
        # this pin is scoped to the drain harness and restored after.
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        DRAIN_PROGRESS[label or name] = _progress_summary(q, output_mode)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set(
            "spark.sql.streaming.numRecentProgressUpdates", prev_pb
        )
        spark.conf.set("spark.sql.codegen.wholeStage", prev_cg)
    return spark.table(name)


def run_stream_to_dir(
    sdf: DataFrame,
    out_root: str,
    checkpoint: str,
    output_mode: str = "update",
    state_partitions: int = 8,
    label: str | None = None,
    fail_at_batch: int | None = None,
) -> None:
    """Durable drain: foreachBatch writes each micro-batch's rows to
    ``{out_root}/batch_id=N`` with per-batch overwrite, checkpointed
    at ``checkpoint`` so a killed drain RESUMES from the last
    committed batch instead of restarting.

    This is the recoverable twin of run_stream_to_memory (whose
    memory sink dies with the query). Exactly-once effect under
    at-least-once foreachBatch: a replayed batch_id overwrites its
    own directory, so duplicates cannot accumulate; reading
    ``out_root`` back yields every batch's emission exactly once,
    with ``batch_id`` recovered as a partition column.

    ``fail_at_batch`` injects a crash BEFORE that micro-batch
    commits — the test hook tests/test_stream_recovery.py uses to
    prove the recovery contract: restart from the same checkpoint,
    and stateful operators resume from the state store with no row
    lost or double-counted.
    """
    spark = sdf.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_cg = spark.conf.get("spark.sql.codegen.wholeStage")
    prev_pb = spark.conf.get("spark.sql.streaming.numRecentProgressUpdates")

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if fail_at_batch is not None and batch_id == fail_at_batch:
            raise RuntimeError(
                f"injected failure before batch {batch_id} commit"
            )
        batch_df.write.mode("overwrite").parquet(
            f"{out_root.rstrip('/')}/batch_id={batch_id}"
        )

    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        spark.conf.set(
            "spark.sql.streaming.numRecentProgressUpdates",
            str(PROGRESS_BUFFER),
        )
        q = (
            sdf.writeStream.foreachBatch(_sink)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            DRAIN_PROGRESS[label or f"dir_{os.path.basename(out_root)}"] = (
                _progress_summary(q, "foreachBatch")
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set(
            "spark.sql.streaming.numRecentProgressUpdates", prev_pb
        )
        spark.conf.set("spark.sql.codegen.wholeStage", prev_cg)


# Version stride reserved per stream epoch: every (re)started stream
# checkpoint claims a fresh block of EPOCH_STRIDE delta versions above
# everything already in the table, so stream deltas can never land on
# (or under) versions written by batch mor_upsert or by an earlier
# stream run.
EPOCH_STRIDE = 1_000_000


def stream_upsert_mor(
    sdf: DataFrame,
    path: str,
    fmt: str = "parquet",
    state_partitions: int = 4,
    fail_at_batch: int | None = None,
) -> None:
    """ST7: continuous upsert sink — drain a stream into a
    merge-on-read table via ``foreachBatch`` (the CDC-ingest /
    streaming-MERGE pattern; reference's append-only CSV loads have
    no counterpart, this is the streaming twin of sinks.mor_upsert).

    Each micro-batch lands as one delta version under
    ``{path}/_deltas/v=N`` — an O(batch) append that never reads or
    rewrites the base; ``sinks.mor_read`` reconciles (latest version
    per key wins, tombstones honored) and ``sinks.mor_compact``
    amortizes read cost, both unchanged from the batch path.

    Versioning — three interleaving hazards, each handled:

    * **Batch/stream collision**: versions are namespaced by a stream
      EPOCH. On first start, the checkpoint allocates
      ``epoch = (max existing version // EPOCH_STRIDE + 1) * stride``
      and persists it in ``_mor_epoch.json`` INSIDE the checkpoint
      directory, so the manifest shares the checkpoint's lifetime —
      stream batch N lands at ``epoch + N + 1``, strictly above every
      batch-written or prior-stream delta, never overwriting history.
      Batch ``mor_upsert`` keeps allocating ``max+1`` and therefore
      also stays clear of the epoch in use.
    * **Same-checkpoint replay** (foreachBatch is at-least-once): a
      replayed batch_id maps to the same version; the epoch manifest
      records which batch_ids this checkpoint wrote, so the replay is
      recognized as OURS and overwritten idempotently. A version
      directory that exists but is NOT in the manifest means a
      foreign writer raced the stream — the sink raises instead of
      destroying someone else's delta.
    * **Fresh-checkpoint re-run** (repack into different batches): a
      new checkpoint = a new, higher epoch. Old-epoch deltas stay
      live but every key they carry is re-upserted at strictly higher
      versions, so reconciliation shadows them completely — no stale
      higher-version delta can win, whatever the new batch packing.

    Concurrent writers (a live stream plus simultaneous batch
    upserts) still need external coordination, as on any
    single-writer table format without a transaction log.

    Scale: each batch write distributes across executors like any
    parquet write; the state-partition pin only matters when the
    upstream has stateful ops (same rationale as
    run_stream_to_memory). The epoch manifest is one tiny
    driver-side JSON per checkpoint, touched once per micro-batch.
    """
    import json
    import os

    from etl_npl_pipeline_spark.sinks import _mor_versions

    spark = sdf.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_pb = spark.conf.get("spark.sql.streaming.numRecentProgressUpdates")
    root = path.rstrip("/")
    checkpoint = f"{root}/_checkpoint"

    ddir = f"{root}/_deltas"
    os.makedirs(ddir, exist_ok=True)
    os.makedirs(checkpoint, exist_ok=True)
    manifest_path = f"{checkpoint}/_mor_epoch.json"
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            manifest = json.load(fh)
    else:
        existing = _mor_versions(path)
        top = existing[-1] if existing else 0
        epoch = (top // EPOCH_STRIDE + 1) * EPOCH_STRIDE
        manifest = {"epoch": epoch, "written": []}
        with open(manifest_path, "w") as fh:
            json.dump(manifest, fh)
    epoch = manifest["epoch"]

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if fail_at_batch is not None and batch_id == fail_at_batch:
            # recovery test hook: die BEFORE this batch commits —
            # the restart must resume here from the checkpoint
            raise RuntimeError(
                f"injected failure before batch {batch_id} commit"
            )
        v = epoch + batch_id + 1
        target = f"{ddir}/v={v}"
        if os.path.exists(target) and batch_id not in manifest["written"]:
            raise RuntimeError(
                f"mor delta v={v} exists but was not written by this "
                f"stream checkpoint — concurrent writer on {root}"
            )
        batch_df.write.mode("overwrite").format(fmt).save(target)
        if batch_id not in manifest["written"]:
            manifest["written"].append(batch_id)
            with open(manifest_path, "w") as fh:
                json.dump(manifest, fh)

    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        spark.conf.set(
            "spark.sql.streaming.numRecentProgressUpdates",
            str(PROGRESS_BUFFER),
        )
        q = (
            sdf.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # foreachBatch drains bypass run_stream_to_memory — record
        # progress here so ST7 is observable like the other streams
        DRAIN_PROGRESS["stream_upsert_read"] = _progress_summary(
            q, "foreachBatch"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set(
            "spark.sql.streaming.numRecentProgressUpdates", prev_pb
        )


def stream_refresh_index(
    sdf: DataFrame,
    index_dir: str,
    checkpoint: str,
    fail_at_batch: int | None = None,
) -> None:
    """ST-L59 composition (r9, VERDICT r8 #5): drain a vector stream
    into a persisted ANN index — each micro-batch is appended via
    ``refresh_ann_index`` (frozen quantizers, O(|batch|), staged
    segments + atomic manifest commit), the daily-crawl →
    searchable-index loop of a training-data platform.

    Exactly-once under foreachBatch's at-least-once contract: the
    batch_key is CONTENT-derived — md5 over the batch's sorted
    vec_ids — so a same-checkpoint replay of a batch_id (or a
    duplicate file delivery) is recognized in the manifest lineage
    and no-ops, the ST7 epoch discipline keyed by content instead of
    a version counter because index vectors have no last-writer-wins
    reconciliation to absorb a double append. Limitation, same as
    ST7's fresh-checkpoint rule: re-streaming the SAME data under a
    checkpoint that packs it into different batches produces new
    content keys and would double-append — a repack requires an
    index rebuild (the manifest lineage makes the condition visible:
    appended rows exceed the source count).

    Empty micro-batches are skipped (no segment dirs, no version
    bump). ``fail_at_batch`` injects a crash BEFORE that batch's
    refresh for recovery tests: the restart resumes from the
    checkpoint and the manifest shows each content key exactly once.
    """
    from etl_npl_pipeline_spark.operators.ann_index import refresh_ann_index

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if fail_at_batch is not None and batch_id == fail_at_batch:
            raise RuntimeError(
                f"injected failure before batch {batch_id} refresh"
            )
        if batch_df.isEmpty():
            return
        key = batch_df.agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.array_sort(
                        F.collect_list(F.col("vec_id").cast("string"))
                    ),
                )
            ).alias("k")
        ).collect()[0]["k"]
        refresh_ann_index(
            batch_df.sparkSession,
            index_dir,
            batch_df,
            batch_key=f"content:{key}",
        )

    q = (
        sdf.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    DRAIN_PROGRESS["stream_index_refresh"] = _progress_summary(
        q, "foreachBatch"
    )
