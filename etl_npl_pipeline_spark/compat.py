"""pandas-on-Spark compatibility layer.

The reference implementation is a pandas script (read → clean →
melt/pivot → ffill → merge → groupby; src/ETL-NPL-Pipeline.py
throughout). Users migrating from it can keep pandas idioms via
``pyspark.pandas`` while the execution distributes — this module
shows the reference's core flow written that way, and the test
suite pins its results equal to the native DataFrame operators in
``operators/reshape.py``.

Caveats that matter at scale (why the native operators exist):
- The default index requires a global ordering; configure
  ``compute.default_index_type = 'distributed'`` (done here) or
  every operation pays a window over the whole dataset.
- ``sort_index()``/positional ``iloc`` force global sorts — avoid.
- pandas-on-Spark is a porting bridge, not the destination: the
  native operators express the same transforms as pure Catalyst
  plans (no index machinery at all), which is why the engine's own
  queries never route through this module.
- Timestamps ride pandas' datetime64[ns] internally, so the
  representable range is 1677-09-21..2262-04-11 — dates outside it
  fail in the Arrow->pandas conversion (exactly as they would in
  the reference's own pandas engine). The native operators use
  Catalyst timestamps and have no such range limit (pinned by the
  far-dates adversarial build: op_quarter_agg/npl_quarterly pass,
  this module is the documented exclusion).
"""

from __future__ import annotations

import pyspark.pandas as ps


def quarterly_avg_pandas_style(sf_dir: str) -> ps.DataFrame:
    """The reference's groupby-quarter-mean shape in pandas idioms:
    read parquet, derive quarter labels with string ops on
    ``.dt`` accessors, groupby().agg — distributed end to end."""
    ps.set_option("compute.default_index_type", "distributed")
    orders = ps.read_parquet(f"{sf_dir}/orders.parquet")
    orders = orders.assign(
        quarter=orders.o_orderdate.dt.year.astype(str)
        + "-Q"
        + orders.o_orderdate.dt.quarter.astype(str)
    )
    out = (
        orders.groupby("quarter", as_index=False)
        .agg(n=("o_orderkey", "count"))
        .sort_values("quarter")
    )
    return out


def melt_pivot_roundtrip_pandas_style(sf_dir: str) -> ps.DataFrame:
    """melt → pivot_table round trip (the reference's wide↔long
    reshapes, src:160-163) via pandas-on-Spark."""
    ps.set_option("compute.default_index_type", "distributed")
    nation = ps.read_parquet(f"{sf_dir}/nation.parquet")
    wide = nation[["n_nationkey", "n_regionkey"]].head(10)
    long = wide.melt(
        id_vars=["n_nationkey"], value_vars=["n_regionkey"],
        var_name="metric", value_name="val",
    )
    back = long.pivot_table(
        index=["n_nationkey"], columns="metric", values="val", aggfunc="max"
    ).reset_index()
    return back.sort_values("n_nationkey")
