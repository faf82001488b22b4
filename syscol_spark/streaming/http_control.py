"""HTTP control plane (C2/C5/C6/C7 parity).

The reference scheduler exposes GET endpoints the CLI calls over HTTP
(/root/reference/syscol/http_server.go:56-100; client api.go:45-70):

    /api/start   — gated by CanStart (F4)
    /api/stop    — kill the pipeline
    /api/update  — mutate config via query params (takes effect on next
                   start — same contract as the reference, C5)
    /api/status  — registry/status dump
    /health      — liveness

Same endpoints here, served by a stdlib ThreadingHTTPServer wrapping a
CollectorManager. Responses are JSON (the reference returns text/JSON mixes;
JSON-only is the documented delta). The artifact-server endpoint
(/resource/..., C10) is intentionally absent — Spark ships its own artifacts.
"""

from __future__ import annotations

import http.server
import json
import threading
from urllib.parse import parse_qs, urlparse

from syscol_spark.streaming.control import CollectorManager

# /api/update accepts the reference's query-param names (cli.go:140-164)
_UPDATE_PARAM_MAP = {
    "producer.properties": "producer_properties",
    "topic": "topic",
    "transform": "transform",
    "schema.registry.url": "schema_registry_url",
    "hosts": "hosts",
    "port": "port",
    "namespace": "namespace",
    "interval": "reporting_interval_secs",
}


class ControlServer:
    """HTTP facade over a CollectorManager. start()/shutdown() manage the
    server thread; the Spark pipeline lifecycle is driven by requests."""

    def __init__(self, manager: CollectorManager, host: str = "127.0.0.1", port: int = 0):
        self.manager = manager
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _reply(self, code: int, payload: dict) -> None:
                body = json.dumps(payload, default=str).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802
                url = urlparse(self.path)
                try:
                    if url.path == "/health":
                        self._reply(200, {"ok": True})
                    elif url.path == "/api/start":
                        q = manager.start()
                        self._reply(200, {"started": True, "query_id": str(q.id)})
                    elif url.path == "/api/stop":
                        manager.stop()
                        self._reply(200, {"stopped": True})
                    elif url.path == "/api/update":
                        params = {k: v[0] for k, v in parse_qs(url.query).items()}
                        updates = {}
                        for ref_key, field in _UPDATE_PARAM_MAP.items():
                            if ref_key in params:
                                val: object = params[ref_key]
                                if field == "hosts":
                                    val = [h for h in str(val).split(",") if h]
                                elif field == "port":
                                    val = int(val)
                                elif field == "reporting_interval_secs":
                                    val = float(val)
                                updates[field] = val
                        unknown = sorted(set(params) - set(_UPDATE_PARAM_MAP))
                        manager.update(**updates)
                        self._reply(200, {"updated": sorted(updates), "ignored": unknown,
                                          "config": json.loads(manager.config.to_json())})
                    elif url.path == "/api/status":
                        self._reply(200, manager.status())
                    else:
                        self._reply(404, {"error": f"no such endpoint: {url.path}"})
                except Exception as e:  # noqa: BLE001 — surface as 4xx, keep serving
                    self._reply(400, {"error": str(e)})

        self._server = http.server.ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def address(self) -> str:
        h, p = self._server.server_address[:2]
        return f"http://{h}:{p}"

    def start(self) -> str:
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self.address

    def shutdown(self) -> None:
        self.manager.stop()
        self._server.shutdown()
