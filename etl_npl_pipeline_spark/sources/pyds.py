"""Custom Python Data Source (Spark 4 DataSource API) for the REST
observations feed — the distributed upgrade of sources.rest.

sources.rest.fetch_observations runs its month-chunk pagination loop
on the driver (reference parity: src/ETL-NPL-Pipeline.py:295-323).
This source hands the SAME chunking to Spark as InputPartitions, so
each month is fetched ON AN EXECUTOR and a year-long backfill runs
12-wide instead of serially on the driver — the scale path for API
backfills promised in rest.py's docstring, expressed through the
engine's own source API (predicate-free scan; pruning happens
downstream in Catalyst).

Transport: options are strings (the DataSource contract), so a
callable fetcher cannot be injected. The ``synthetic`` transport
generates deterministic observations (seeded by series_code +
period) with no I/O; the ``http`` transport does a REAL socket GET
(stdlib urllib, auth header, month-ranged params — parity with the
reference's requests.get ingest, src/ETL-NPL-Pipeline.py:100,307)
against the ``url`` option and walks the
``result.series[0].observations`` envelope. Each month partition
fetches ON ITS EXECUTOR, so a year-long backfill runs 12 sockets
wide.

Usage:
    spark.dataSource.register(RestObservationsDataSource)
    df = (spark.read.format("rest_observations")
          .option("series_code", "NPL")
          .option("start", "2024-01-01").option("end", "2024-07-01")
          .load())
"""

from __future__ import annotations

import hashlib
from datetime import date, timedelta

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from etl_npl_pipeline_spark.sources.rest import month_chunks

_SCHEMA = "series_code string, period string, value double"


class _MonthPartition(InputPartition):
    def __init__(self, lo: str, hi: str):
        self.lo = lo
        self.hi = hi


def _synthetic_value(series_code: str, period: str) -> float:
    """Deterministic observation value: stable across runs,
    executors, and engines (md5 of the key, scaled)."""
    h = hashlib.md5(f"{series_code}:{period}".encode()).hexdigest()
    return int(h[:8], 16) % 1_000_000 / 100.0


def _fetch_month(
    transport: str,
    series_code: str,
    lo: date,
    hi: date,
    url: str | None = None,
    api_key: str | None = None,
):
    if transport == "synthetic":
        cur = lo
        while cur <= hi:
            period = cur.isoformat()
            yield (series_code, period, _synthetic_value(series_code, period))
            cur += timedelta(days=1)
    elif transport == "http":
        # Real socket GET on the executor that owns this partition.
        # One request per month chunk (the reference's API-limit
        # workaround, src:295-323); the envelope walk matches
        # result.series[0].observations.
        import json as _json
        import urllib.parse
        import urllib.request

        if not url:
            raise ValueError("http transport requires the 'url' option")
        qs = urllib.parse.urlencode(
            {
                "series_code": series_code,
                "start_period": lo.isoformat(),
                "end_period": hi.isoformat(),
            }
        )
        headers = {}
        if api_key:
            headers["Authorization"] = f"Bearer {api_key}"
        req = urllib.request.Request(f"{url}?{qs}", headers=headers)
        with urllib.request.urlopen(req, timeout=30) as resp:
            payload = _json.loads(resp.read().decode("utf-8"))
        for obs in payload["result"]["series"][0]["observations"]:
            # real gateways serve missing observations as JSON null;
            # the reader schema is nullable — propagate, don't crash
            v = obs["value"]
            yield (series_code, obs["period"], None if v is None else float(v))
    else:
        raise ValueError(
            f"unknown transport {transport!r}: expected 'synthetic' or 'http'"
        )


class _Reader(DataSourceReader):
    def __init__(self, options: dict):
        self.series_code = options.get("series_code", "NPL")
        self.start = date.fromisoformat(options["start"])
        self.end = date.fromisoformat(options["end"])
        self.transport = options.get("transport", "synthetic")
        self.url = options.get("url")
        self.api_key = options.get("api_key")

    def partitions(self):
        return [
            _MonthPartition(lo.isoformat(), hi.isoformat())
            for lo, hi in month_chunks(self.start, self.end)
        ]

    def read(self, partition: _MonthPartition):
        yield from _fetch_month(
            self.transport,
            self.series_code,
            date.fromisoformat(partition.lo),
            date.fromisoformat(partition.hi),
            url=self.url,
            api_key=self.api_key,
        )


class RestObservationsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rest_observations"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> _Reader:
        return _Reader(self.options)
