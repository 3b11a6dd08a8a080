"""Merge-on-read upsert (sinks.mor_*): O(batch) writes, read-time
reconcile, compaction — the write-cheap complement of the
copy-on-write merge_upsert.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_npl_pipeline_spark import sinks


def _state(df):
    return {(r.k): (r.val) for r in df.collect()}


def test_mor_upsert_reconciles_latest_per_key(spark, tmp_path):
    path = str(tmp_path / "mor")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "val"]
    )
    sinks.mor_init(base, path)

    # v1: update k=2, insert k=4
    v = sinks.mor_upsert(
        spark.createDataFrame([(2, "B"), (4, "d")], ["k", "val"]), path
    )
    assert v == 1
    got = _state(sinks.mor_read(spark, path, ["k"]))
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}

    # v2: delete k=1 (tombstone), update k=4 again — latest wins
    v = sinks.mor_upsert(
        spark.createDataFrame(
            [(1, "a", True), (4, "D", False)], ["k", "val", "_deleted"]
        ),
        path,
    )
    assert v == 2
    got = _state(sinks.mor_read(spark, path, ["k"]))
    assert got == {2: "B", 3: "c", 4: "D"}


def test_mor_compact_folds_deltas(spark, tmp_path):
    path = str(tmp_path / "mor2")
    sinks.mor_init(
        spark.createDataFrame([(1, "a"), (2, "b")], ["k", "val"]), path
    )
    sinks.mor_upsert(
        spark.createDataFrame([(2, "B"), (5, "e")], ["k", "val"]), path
    )
    before = _state(sinks.mor_read(spark, path, ["k"]))

    sinks.mor_compact(spark, path, ["k"])
    assert sinks._mor_versions(path) == []  # deltas cleared
    after = _state(sinks.mor_read(spark, path, ["k"]))
    assert after == before == {1: "a", 2: "B", 5: "e"}

    # post-compaction upserts restart at v1 and still reconcile
    sinks.mor_upsert(
        spark.createDataFrame([(1, "A")], ["k", "val"]), path
    )
    assert _state(sinks.mor_read(spark, path, ["k"]))[1] == "A"


def test_mor_read_is_a_plan_not_a_collect(spark, tmp_path):
    """The reconcile is one lazy plan (window over union) — no
    driver-side row handling."""
    path = str(tmp_path / "mor3")
    sinks.mor_init(
        spark.createDataFrame([(1, "a")], ["k", "val"]), path
    )
    sinks.mor_upsert(
        spark.createDataFrame([(1, "A")], ["k", "val"]), path
    )
    df = sinks.mor_read(spark, path, ["k"])
    # composable: further transformations plan lazily on top
    out = df.where(F.col("k") == 1).select("val")
    assert [r.val for r in out.collect()] == ["A"]


def test_mor_time_travel(spark, tmp_path):
    """as_of_version reproduces each historical state exactly: the
    snapshot a past training run read stays reconstructible until
    compaction folds the history."""
    import pyspark.sql.functions as F

    from etl_npl_pipeline_spark import sinks

    tbl = str(tmp_path / "tt")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    sinks.mor_init(base, tbl)
    sinks.mor_upsert(
        spark.createDataFrame([(2, "b2")], "k long, v string"), tbl
    )  # v=1
    sinks.mor_upsert(
        spark.createDataFrame(
            [(3, None, True), (4, "d", False)],
            "k long, v string, _deleted boolean",
        ),
        tbl,
    )  # v=2: delete k=3, insert k=4

    def snap(as_of=None):
        return {
            (r["k"], r["v"])
            for r in sinks.mor_read(
                spark, tbl, key_cols=["k"], as_of_version=as_of
            ).collect()
        }

    assert snap(0) == {(1, "a"), (2, "b"), (3, "c")}
    assert snap(1) == {(1, "a"), (2, "b2"), (3, "c")}
    assert snap(2) == {(1, "a"), (2, "b2"), (4, "d")}
    assert snap() == snap(2)  # default = latest
