"""Live-socket REST ingest: both transports (driver-side
fetch_observations + executor-side Python Data Source ``http``
transport) against the loopback HTTP fixture, plus the auth and
error contracts a real gateway client needs."""

from __future__ import annotations

import urllib.error
import urllib.request
from datetime import date

import pytest

from etl_npl_pipeline_spark.sources.http_fixture import serve_observations
from etl_npl_pipeline_spark.sources.pyds import (
    RestObservationsDataSource,
    _synthetic_value,
)
from etl_npl_pipeline_spark.sources.rest import fetch_observations, http_fetcher


def test_driver_side_pagination_over_real_socket(spark):
    with serve_observations() as base:
        df = fetch_observations(
            spark,
            http_fetcher(),
            f"{base}/obs",
            "NPL",
            date(2024, 1, 1),
            date(2024, 3, 1),
        )
        rows = {r["period"]: r["value"] for r in df.collect()}
    # 2024 is a leap year: Jan 31 + Feb 29 days, end-exclusive
    assert len(rows) == 60
    assert rows["2024-02-29"] == _synthetic_value("NPL", "2024-02-29")


def test_executor_side_http_transport(spark):
    try:
        spark.dataSource.register(RestObservationsDataSource)
    except Exception:
        pass
    with serve_observations(api_key="k1") as base:
        df = (
            spark.read.format("rest_observations")
            .option("series_code", "RATE")
            .option("start", "2024-05-01")
            .option("end", "2024-07-01")
            .option("transport", "http")
            .option("url", f"{base}/obs")
            .option("api_key", "k1")
            .load()
        )
        rows = {r["period"]: r["value"] for r in df.collect()}
    assert len(rows) == 61  # May 31 + Jun 30
    assert rows["2024-06-15"] == _synthetic_value("RATE", "2024-06-15")


def test_auth_required_when_server_has_key(spark):
    with serve_observations(api_key="secret") as base:
        fetch = http_fetcher()  # no Authorization header
        with pytest.raises(urllib.error.HTTPError) as exc:
            fetch(
                f"{base}/obs",
                {
                    "series_code": "NPL",
                    "start_period": "2024-01-01",
                    "end_period": "2024-01-31",
                },
            )
        assert exc.value.code == 401
        # correct bearer token passes
        ok = http_fetcher({"Authorization": "Bearer secret"})
        body = ok(
            f"{base}/obs",
            {
                "series_code": "NPL",
                "start_period": "2024-01-01",
                "end_period": "2024-01-31",
            },
        )
        assert '"observations"' in body


def test_missing_params_get_400(spark):
    with serve_observations() as base:
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(f"{base}/obs?series_code=NPL", timeout=10)
        assert exc.value.code == 400


def test_http_transport_requires_url():
    from etl_npl_pipeline_spark.sources.pyds import _fetch_month

    with pytest.raises(ValueError, match="url"):
        list(_fetch_month("http", "NPL", date(2024, 1, 1), date(2024, 1, 2)))
    with pytest.raises(ValueError, match="unknown transport"):
        list(_fetch_month("ftp", "NPL", date(2024, 1, 1), date(2024, 1, 2)))


def test_retries_recover_transient_500s(spark):
    """First 2 attempts of every request 500; the retrying fetcher
    must land the complete series anyway."""
    with serve_observations(fail_first=2) as base:
        df = fetch_observations(
            spark,
            http_fetcher(retries=2, backoff_s=0.01),
            f"{base}/obs",
            "NPL",
            date(2024, 1, 1),
            date(2024, 3, 1),
        )
        rows = {r["period"]: r["value"] for r in df.collect()}
    assert len(rows) == 60
    assert rows["2024-01-07"] == _synthetic_value("NPL", "2024-01-07")


def test_4xx_never_retries(spark):
    """A client error is a config bug, not a flake — surface it on
    the first attempt (retrying a 401 only hides it)."""
    with serve_observations(api_key="secret") as base:
        with pytest.raises(urllib.error.HTTPError) as exc:
            http_fetcher(retries=5, backoff_s=0.01)(
                f"{base}/obs",
                {
                    "series_code": "NPL",
                    "start_period": "2024-01-01",
                    "end_period": "2024-01-31",
                },
            )
        assert exc.value.code == 401


def test_exhausted_retries_raise_without_quarantine(spark):
    """Default policy: a month broken beyond the retry budget fails
    the load — partial data must be opt-in."""
    with serve_observations(fail_first=99) as base:
        with pytest.raises(urllib.error.HTTPError):
            fetch_observations(
                spark,
                http_fetcher(retries=1, backoff_s=0.01),
                f"{base}/obs",
                "NPL",
                date(2024, 1, 1),
                date(2024, 2, 1),
            )


def test_truncated_pages_dead_letter_and_load_continues(spark):
    """Quarantine policy: truncated JSON pages arrive with HTTP 200,
    so only the month-level fetch+parse retry (parse_retries) can
    recover them. Permanently broken → dead-letter manifest records
    each month and the load continues; transiently broken → the
    parse retry refetches and the series lands complete."""
    # permanently-broken feed, quarantine on: all months dead-letter,
    # loader raises only because NOTHING landed
    with serve_observations(fail_first=99, failure_mode="truncate") as base:
        dead: list[dict] = []
        with pytest.raises(ValueError, match="no records"):
            fetch_observations(
                spark,
                http_fetcher(retries=0, backoff_s=0.01),
                f"{base}/obs",
                "NPL",
                date(2024, 1, 1),
                date(2024, 3, 1),
                dead_letters=dead,
            )
        assert len(dead) == 2  # both months quarantined, not raised
        assert all("start_period" in d and "error" in d for d in dead)

    # transiently-broken feed: retries clear the truncation, the
    # quarantine stays empty and the series lands complete
    with serve_observations(fail_first=1, failure_mode="truncate") as base:
        dead = []
        df = fetch_observations(
            spark,
            http_fetcher(retries=1, backoff_s=0.01),
            f"{base}/obs",
            "NPL",
            date(2024, 1, 1),
            date(2024, 3, 1),
            dead_letters=dead,
        )
        assert df.count() == 60 and dead == []
