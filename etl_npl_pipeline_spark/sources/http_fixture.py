"""Loopback HTTP fixture for the REST observations feed — a REAL
socket server (stdlib ``http.server``) that serves the same
deterministic envelope the BOT-style gateway would (parity:
src/ETL-NPL-Pipeline.py:100,307 — ``requests.get`` against an HTTPS
endpoint with auth headers, month-ranged params, and a
``result.series[0].observations`` JSON envelope).

The observation values are the md5-derived synthetic feed
(pyds._synthetic_value), so a DuckDB oracle can replay the exact
bytes the server emits — the live-transport query stays
hash-checkable end to end.

Threading: ``ThreadingHTTPServer`` so the Python Data Source's month
partitions can fetch concurrently (local[32] runs 6+ partition reads
at once against this fixture).
"""

from __future__ import annotations

import json
import threading
from contextlib import contextmanager
from datetime import date, timedelta
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from etl_npl_pipeline_spark.sources.pyds import _synthetic_value


def _observations(series_code: str, start_period: str, end_period: str):
    lo = date.fromisoformat(start_period)
    hi = date.fromisoformat(end_period)
    cur = lo
    out = []
    while cur <= hi:
        period = cur.isoformat()
        out.append(
            {"period": period, "value": _synthetic_value(series_code, period)}
        )
        cur += timedelta(days=1)
    return out


class _Handler(BaseHTTPRequestHandler):
    # set on the server instance by serve_observations
    api_key: str | None = None

    def log_message(self, fmt, *args):  # keep test stderr quiet
        pass

    def do_GET(self):  # noqa: N802 - BaseHTTPRequestHandler contract
        # flake injection: the first `fail_first` requests for each
        # distinct query string fail (500 or a truncated JSON page) —
        # deterministic, so a retrying client always lands complete
        fail_first = getattr(self.server, "fail_first", 0)
        if fail_first:
            with self.server.attempt_lock:
                seen = self.server.attempts.get(self.path, 0)
                self.server.attempts[self.path] = seen + 1
            if seen < fail_first:
                if getattr(self.server, "failure_mode", "500") == "truncate":
                    body = b'{"result": {"series": [{"obser'
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self.send_response(500)
                    self.end_headers()
                    self.wfile.write(b'{"error": "transient"}')
                return
        key = getattr(self.server, "api_key", None)
        if key is not None:
            auth = self.headers.get("Authorization", "")
            if auth != f"Bearer {key}":
                self.send_response(401)
                self.end_headers()
                self.wfile.write(b'{"error": "unauthorized"}')
                return
        q = parse_qs(urlparse(self.path).query)
        try:
            obs = _observations(
                q["series_code"][0], q["start_period"][0], q["end_period"][0]
            )
        except (KeyError, ValueError) as exc:
            self.send_response(400)
            self.end_headers()
            self.wfile.write(json.dumps({"error": str(exc)}).encode())
            return
        body = json.dumps(
            {"result": {"series": [{"observations": obs}]}}
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@contextmanager
def serve_observations(
    api_key: str | None = None,
    fail_first: int = 0,
    failure_mode: str = "500",
):
    """Start the loopback server on an ephemeral port; yield its base
    URL (``http://127.0.0.1:PORT``). The server dies with the
    context — callers must materialize anything fetched through it
    BEFORE leaving the block (e.g. ``df.localCheckpoint()``).

    ``fail_first`` > 0 makes the server fail the first N attempts of
    EVERY distinct request (``failure_mode``: '500' = status 500,
    'truncate' = a cut-off JSON page) before serving it correctly —
    the flaky-gateway harness for the retry/dead-letter contract."""
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.api_key = api_key
    srv.fail_first = fail_first
    srv.failure_mode = failure_mode
    srv.attempts = {}
    srv.attempt_lock = threading.Lock()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()
        srv.server_close()
        t.join(timeout=5)
