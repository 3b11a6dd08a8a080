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
