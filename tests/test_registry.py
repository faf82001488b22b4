"""Schema-registry client read/write surface (§2.9) against an in-process
stub registry — verifies the same three-level caching contract as the
reference client (go-kafka-avro/schema_registry.go:100-113,230):
subject→schema→id, id→schema, subject→schema→version; latest never cached."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from syscol_spark.functions.confluent import ConfluentRegistryClient

SCHEMA_V1 = {"type": "record", "name": "T", "fields": [{"name": "a", "type": "long"}]}
SCHEMA_V2 = {
    "type": "record",
    "name": "T",
    "fields": [{"name": "a", "type": "long"}, {"name": "b", "type": ["null", "string"]}],
}


class _StubRegistry:
    """Minimal Confluent-registry semantics: subjects hold an ordered list of
    versions; ids are global; every HTTP hit is counted per route."""

    def __init__(self) -> None:
        self.subjects: dict[str, list[tuple[int, str]]] = {}  # subject -> [(id, schema)]
        self.by_id: dict[int, str] = {}
        self.next_id = 1
        self.hits: dict[str, int] = {}

    def count(self, route: str) -> None:
        self.hits[route] = self.hits.get(route, 0) + 1

    def register(self, subject: str, schema: str) -> int:
        versions = self.subjects.setdefault(subject, [])
        for sid, s in versions:
            if s == schema:
                return sid
        sid = self.next_id
        self.next_id += 1
        versions.append((sid, schema))
        self.by_id[sid] = schema
        return sid


def _handler(reg: _StubRegistry):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # silence
            pass

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            parts = self.path.strip("/").split("/")
            if parts[0] == "schemas" and parts[1] == "ids":
                reg.count("get_by_id")
                sid = int(parts[2])
                if sid not in reg.by_id:
                    return self._json(404, {"error_code": 40403, "message": "not found"})
                return self._json(200, {"schema": reg.by_id[sid]})
            if parts[0] == "subjects" and len(parts) == 4 and parts[2] == "versions":
                subject, v = parts[1], parts[3]
                versions = reg.subjects.get(subject, [])
                if not versions:
                    return self._json(404, {"error_code": 40401, "message": "subject not found"})
                if v == "latest":
                    reg.count("get_latest")
                    idx = len(versions)
                else:
                    reg.count("get_by_version")
                    idx = int(v)
                    if not 1 <= idx <= len(versions):
                        return self._json(404, {"error_code": 40402, "message": "version not found"})
                sid, schema = versions[idx - 1]
                return self._json(
                    200, {"subject": subject, "version": idx, "id": sid, "schema": schema}
                )
            return self._json(404, {"error_code": 404, "message": "bad route"})

        def do_POST(self):
            body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            parts = self.path.strip("/").split("/")
            schema = body["schema"]
            if parts[0] == "subjects" and len(parts) == 3 and parts[2] == "versions":
                reg.count("register")
                return self._json(200, {"id": reg.register(parts[1], schema)})
            if parts[0] == "subjects" and len(parts) == 2:  # check-is-registered
                reg.count("get_version")
                for i, (sid, s) in enumerate(reg.subjects.get(parts[1], []), start=1):
                    if json.loads(s) == json.loads(schema):
                        return self._json(
                            200, {"subject": parts[1], "version": i, "id": sid, "schema": s}
                        )
                return self._json(404, {"error_code": 40403, "message": "schema not found"})
            return self._json(404, {"error_code": 404, "message": "bad route"})

    return Handler


@pytest.fixture()
def stub_registry():
    reg = _StubRegistry()
    server = HTTPServer(("127.0.0.1", 0), _handler(reg))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        yield reg, f"http://127.0.0.1:{server.server_port}"
    finally:
        server.shutdown()
        server.server_close()


def test_register_caches_id_and_schema(stub_registry):
    reg, url = stub_registry
    c = ConfluentRegistryClient(url)
    sid = c.register("t-value", SCHEMA_V1)
    assert c.register("t-value", SCHEMA_V1) == sid
    assert reg.hits.get("register") == 1  # second call served from cache
    # register warms the id cache: no GET for one's own registration
    assert c.get_by_id(sid) == json.dumps(SCHEMA_V1)
    assert reg.hits.get("get_by_id") is None


def test_register_distinguishes_schemas_within_subject(stub_registry):
    reg, url = stub_registry
    c = ConfluentRegistryClient(url)
    id1 = c.register("t-value", SCHEMA_V1)
    id2 = c.register("t-value", SCHEMA_V2)
    assert id1 != id2  # schema-level cache key, not subject-level
    assert reg.hits.get("register") == 2


def test_get_by_id_cached(stub_registry):
    reg, url = stub_registry
    c = ConfluentRegistryClient(url)
    sid = reg.register("t-value", json.dumps(SCHEMA_V1))
    s1 = c.get_by_id(sid)
    s2 = c.get_by_id(sid)
    assert json.loads(s1) == SCHEMA_V1 and s1 == s2
    assert reg.hits.get("get_by_id") == 1


def test_get_latest_never_cached_and_tracks_evolution(stub_registry):
    reg, url = stub_registry
    c = ConfluentRegistryClient(url)
    id1 = reg.register("t-value", json.dumps(SCHEMA_V1))
    m1 = c.get_latest("t-value")
    assert (m1.id, m1.version) == (id1, 1)
    id2 = reg.register("t-value", json.dumps(SCHEMA_V2))
    m2 = c.get_latest("t-value")  # picks up the NEW version — no stale cache
    assert (m2.id, m2.version) == (id2, 2)
    assert json.loads(m2.schema) == SCHEMA_V2
    assert reg.hits.get("get_latest") == 2


def test_get_by_version(stub_registry):
    reg, url = stub_registry
    c = ConfluentRegistryClient(url)
    id1 = reg.register("t-value", json.dumps(SCHEMA_V1))
    reg.register("t-value", json.dumps(SCHEMA_V2))
    m = c.get_by_version("t-value", 1)
    assert (m.id, m.version) == (id1, 1)
    assert json.loads(m.schema) == SCHEMA_V1


def test_get_version_cached(stub_registry):
    reg, url = stub_registry
    c = ConfluentRegistryClient(url)
    reg.register("t-value", json.dumps(SCHEMA_V1))
    reg.register("t-value", json.dumps(SCHEMA_V2))
    assert c.get_version("t-value", SCHEMA_V2) == 2
    assert c.get_version("t-value", SCHEMA_V2) == 2
    assert reg.hits.get("get_version") == 1  # second from version cache
    # canonicalized key: field order must not miss the cache
    reordered = json.loads(json.dumps(SCHEMA_V2))
    reordered["fields"] = list(reordered["fields"])
    assert c.get_version("t-value", {k: reordered[k] for k in sorted(reordered)}) == 2
    assert reg.hits.get("get_version") == 1


def test_errors_surface(stub_registry):
    _, url = stub_registry
    c = ConfluentRegistryClient(url)
    import urllib.error

    with pytest.raises(urllib.error.HTTPError):
        c.get_latest("missing-subject")
    with pytest.raises(urllib.error.HTTPError):
        c.get_by_id(999)
