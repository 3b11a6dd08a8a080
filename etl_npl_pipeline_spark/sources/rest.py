"""REST/JSON extraction — reference parity for the BOT API pulls
(observations_bot src:78, interest_bot src:271, flowrate_extract
src:200 in src/ETL-NPL-Pipeline.py).

The transport is injectable (``fetcher``): tests and offline runs
pass a stub; production passes a requests-backed callable. The
month-chunked pagination loop mirrors the reference's API-limit
workaround (src:295-323). Fetched JSON lands in Spark via
``json_normalize``-equivalent flattening (flatten_structs).

Extraction runs on the driver (API calls are not a distributed
workload); the moment data becomes a DataFrame everything downstream
is distributed. For very large API backfills, parallelize by
chunking the date range into a DataFrame and fetching per-partition
with mapInPandas — same fetcher signature.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Sequence
from datetime import date, timedelta

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

Fetcher = Callable[[str, dict], str]
"""(url, params) -> response body (JSON text)."""


def http_fetcher(
    headers: dict[str, str] | None = None,
    timeout: float = 30.0,
    retries: int = 2,
    backoff_s: float = 0.1,
) -> Fetcher:
    """A real-socket Fetcher (stdlib urllib GET with query params and
    auth headers — parity with the reference's requests.get calls,
    src/ETL-NPL-Pipeline.py:100,307). Pass the result to
    fetch_observations to run the month-chunk pagination loop over
    live HTTP; tests point it at sources.http_fixture's loopback
    server so the socket path is exercised without leaving the
    host.

    Fault contract (a real gateway flakes): transient failures —
    5xx statuses, connection resets, timeouts — retry up to
    ``retries`` times with deterministic exponential backoff
    (``backoff_s * 2**attempt``); client errors (4xx) raise
    immediately (retrying a 401 is pointless and hides a config
    bug). Exhausted retries re-raise the last error for the caller's
    quarantine policy (fetch_observations)."""
    import time as _time
    import urllib.error
    import urllib.parse
    import urllib.request

    def fetch(url: str, params: dict) -> str:
        qs = urllib.parse.urlencode(params)
        last: Exception | None = None
        for attempt in range(retries + 1):
            if attempt:
                _time.sleep(backoff_s * (2 ** (attempt - 1)))
            try:
                req = urllib.request.Request(
                    f"{url}?{qs}", headers=headers or {}
                )
                with urllib.request.urlopen(req, timeout=timeout) as resp:
                    return resp.read().decode("utf-8")
            except urllib.error.HTTPError as exc:
                if exc.code < 500:
                    raise  # client error: not transient
                last = exc
            except (urllib.error.URLError, ConnectionError, TimeoutError) as exc:
                last = exc
        raise last  # type: ignore[misc]

    return fetch


def month_chunks(start: date, end: date) -> list[tuple[date, date]]:
    """[start, end) split into calendar-month windows (ref's
    month-by-month loop, src:295)."""
    out = []
    cur = start
    while cur < end:
        if cur.month == 12:
            nxt = date(cur.year + 1, 1, 1)
        else:
            nxt = date(cur.year, cur.month + 1, 1)
        out.append((cur, min(nxt - timedelta(days=1), end)))
        cur = nxt
    return out


def fetch_observations(
    spark: SparkSession,
    fetcher: Fetcher,
    url: str,
    series_code: str,
    start: date,
    end: date,
    record_path: Sequence[str] = ("result", "series", 0, "observations"),
    dead_letters: list[dict] | None = None,
    parse_retries: int = 1,
    empty_schema: str | None = None,
) -> DataFrame:
    """Fetch a series month-by-month and return one DataFrame.

    ``empty_schema``: a gateway legitimately serves ZERO
    observations for a window (a series that starts later, a
    range moved by upstream corrections). With a declared schema
    the empty feed returns the empty relation in that schema;
    without one (None) it raises — createDataFrame([]) cannot
    infer a schema, and callers who never declared one are better
    served by a loud error than a columnless frame.

    ``record_path`` walks the JSON envelope to the record list
    (ref: data_dict['result']['series'][0]['observations']).

    ``dead_letters``: the quarantine convention for a feed that
    stays broken after the fetcher's own retries. When a list is
    passed, a month whose fetch raises or whose body fails to parse
    (truncated page, malformed envelope) appends a dead-letter
    record ``{series_code, start_period, end_period, error}`` and
    the load CONTINUES — the caller decides whether partial data
    plus the dead-letter manifest is acceptable (same shape as the
    corrupt-JSONL quarantine, sources/files.py). Default (None):
    raise, a partial series silently succeeding is worse than a
    failed load.
    """
    records: list[dict] = []
    for lo, hi in month_chunks(start, end):
        params = {
            "series_code": series_code,
            "start_period": lo.isoformat(),
            "end_period": hi.isoformat(),
        }
        month_records = None
        last_exc: Exception | None = None
        # a truncated/malformed page arrives with HTTP 200, so the
        # transport-level retry in http_fetcher never sees it — the
        # fetch+parse pair retries as a unit here
        for _ in range(parse_retries + 1):
            try:
                node = json.loads(fetcher(url, params))
                for step in record_path:
                    node = node[step]
                month_records = list(node)
                break
            except Exception as exc:
                last_exc = exc
        if month_records is None:
            if dead_letters is None:
                raise last_exc  # type: ignore[misc]
            dead_letters.append(
                {**params, "error": f"{type(last_exc).__name__}: {last_exc}"}
            )
            continue
        records.extend(month_records)
    if not records:
        if empty_schema is not None:
            return spark.createDataFrame([], empty_schema)
        raise ValueError(f"no records for {series_code} in [{start}, {end})")
    return spark.createDataFrame(records)


def flatten_structs(df: DataFrame, sep: str = "_") -> DataFrame:
    """Recursively flatten struct columns (pd.json_normalize parity):
    ``a: struct<b,c>`` → columns ``a_b, a_c``."""
    from pyspark.sql.types import StructType

    while True:
        struct_cols = [
            f.name for f in df.schema.fields if isinstance(f.dataType, StructType)
        ]
        if not struct_cols:
            return df
        cols = []
        for f in df.schema.fields:
            if f.name in struct_cols:
                for sub in f.dataType.fields:  # type: ignore[union-attr]
                    cols.append(
                        F.col(f"`{f.name}`.`{sub.name}`").alias(
                            f"{f.name}{sep}{sub.name}"
                        )
                    )
            else:
                cols.append(F.col(f"`{f.name}`"))
        df = df.select(*cols)
