"""HTTP control-plane tests: the reference's CLI↔scheduler surface
(api/start, api/stop, api/update, api/status) driven over real sockets."""

from __future__ import annotations

import http.server
import json
import threading
import urllib.error
import urllib.request

import pytest

from syscol_spark.config import CollectorConfig
from syscol_spark.streaming.control import CollectorManager
from syscol_spark.streaming.http_control import ControlServer


@pytest.fixture(scope="module")
def metrics_stub():
    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            self.send_response(200)
            self.end_headers()
            self.wfile.write(json.dumps({"slave/cpus_total": 2.0}).encode())

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv.server_address[1]
    srv.shutdown()


def _get(base: str, path: str) -> tuple[int, dict]:
    try:
        with urllib.request.urlopen(base + path) as resp:  # noqa: S310
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_control_lifecycle(spark, metrics_stub, tmp_path):
    props = tmp_path / "p.properties"
    props.write_text("bootstrap.servers=b:9092\n")
    ctl = ControlServer(CollectorManager(spark, CollectorConfig()))
    base = ctl.start()
    try:
        code, health = _get(base, "/health")
        assert (code, health) == (200, {"ok": True})

        # F4 gate over HTTP: start before configuring fails cleanly
        code, out = _get(base, "/api/start")
        assert code == 400 and "cannot start" in out["error"]

        # C5 update via the reference's query-param names
        code, out = _get(
            base,
            "/api/update?topic=t-http&producer.properties="
            + str(props)
            + f"&hosts=127.0.0.1&port={metrics_stub}&interval=0.5&bogus=1",
        )
        assert code == 200
        assert "topic" in out["updated"] and out["ignored"] == ["bogus"]
        assert out["config"]["topic"] == "t-http"

        code, out = _get(base, "/api/start")
        assert code == 200 and out["started"]

        code, out = _get(base, "/api/status")
        assert code == 200 and out["active"] is True

        # double start over HTTP → clean 400
        code, out = _get(base, "/api/start")
        assert code == 400 and "already started" in out["error"]

        code, out = _get(base, "/api/stop")
        assert code == 200 and out["stopped"]
        code, out = _get(base, "/api/status")
        assert out["active"] is False

        code, out = _get(base, "/api/nope")
        assert code == 404
    finally:
        ctl.shutdown()
