"""Stdlib HTTP adapter for :class:`DataLakeService`.

The reference serves its API with FastAPI + uvicorn
(``src/api/main.py:36-51,392-399``); neither is in this environment, so
the transport is ``http.server.ThreadingHTTPServer`` — dependency-free
and sufficient for a driver-side control plane. Route table mirrors the
reference paths exactly (plus engine-named aliases, since the three
database personas are all the one lake here):

    GET  /                           GET  /health
    GET  /api/v1/status              GET  /api/v1/config
    GET  /api/v1/query/postgres      (alias /api/v1/query/table)
    GET  /api/v1/query/mongodb       (alias /api/v1/query/collection)
    GET  /api/v1/query/influxdb      (alias /api/v1/query/timeseries)
    POST /api/v1/etl/run             POST /api/v1/data/upload
    GET  /api/v1/databases/health    GET  /api/v1/metadata/tables
    GET  /api/v1/metadata/collections GET /api/v1/metadata/measurements
    GET  /api/v1/stats/etl

Error envelope matches FastAPI's: ``{"detail": ...}`` with 400/404/500.
Spark job submission is thread-safe, so the threading server is fine;
each request runs one bounded driver-side action (see service module
scale notes).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from .service import DataLakeService


class ApiError(Exception):
    def __init__(self, status: int, detail: str):
        super().__init__(detail)
        self.status = status
        self.detail = detail


def _q(params: dict, name: str, default=None, required: bool = False):
    vals = params.get(name)
    if not vals:
        if required:
            raise ApiError(400, f"missing required query parameter {name!r}")
        return default
    return vals[0]


def _json_filter(raw: str | None) -> dict | None:
    if raw is None:
        return None
    try:
        doc = json.loads(raw)
    except json.JSONDecodeError as exc:
        raise ApiError(400, f"filter is not valid JSON: {exc}") from exc
    if not isinstance(doc, dict):
        raise ApiError(400, "filter must be a JSON object")
    return doc


class _Handler(BaseHTTPRequestHandler):
    service: DataLakeService  # set by make_server

    # -- plumbing -------------------------------------------------------

    def log_message(self, *args):  # silence default stderr access log
        pass

    def _send(self, status: int, payload: dict) -> None:
        body = json.dumps(payload).encode("utf-8")
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        raw = self.rfile.read(n) if n else b""
        if not raw:
            raise ApiError(400, "empty request body")
        try:
            doc = json.loads(raw)
        except json.JSONDecodeError as exc:
            raise ApiError(400, f"request body is not valid JSON: {exc}") from exc
        if not isinstance(doc, dict):
            raise ApiError(400, "request body must be a JSON object")
        return doc

    def _dispatch(self, fn) -> None:
        try:
            self._send(200, fn())
        except ApiError as exc:
            self._send(exc.status, {"detail": exc.detail})
        except KeyError as exc:
            self._send(404, {"detail": str(exc.args[0] if exc.args else exc)})
        except Exception as exc:  # parity: FastAPI 500 + detail (main.py:176)
            self._send(500, {"detail": f"{type(exc).__name__}: {exc}"})

    # -- routes ---------------------------------------------------------

    def do_GET(self) -> None:
        url = urlparse(self.path)
        p, svc = parse_qs(url.query), self.service
        routes = {
            "/": svc.root,
            "/health": svc.health,
            "/api/v1/status": svc.status,
            "/api/v1/config": svc.config,
            "/api/v1/databases/health": svc.databases_health,
            "/api/v1/metadata/tables": svc.metadata_tables,
            "/api/v1/metadata/collections": svc.metadata_collections,
            "/api/v1/metadata/measurements": svc.metadata_measurements,
            "/api/v1/stats/etl": svc.etl_stats,
        }
        if url.path in routes:
            return self._dispatch(routes[url.path])
        if url.path == "/api/v1/lake/history":
            return self._dispatch(lambda: svc.lake_history(_q(p, "path", required=True)))
        if url.path == "/api/v1/lake/query":
            v = _q(p, "version")
            return self._dispatch(
                lambda: svc.lake_query(
                    path=_q(p, "path", required=True),
                    version=int(v) if v is not None else None,
                    limit=int(_q(p, "limit", 100)),
                    where=_q(p, "where"),
                )
            )
        if url.path in ("/api/v1/query/postgres", "/api/v1/query/table"):
            return self._dispatch(
                lambda: svc.query_table(
                    table=_q(p, "table", required=True),
                    limit=int(_q(p, "limit", 100)),
                    where=_q(p, "where"),
                )
            )
        if url.path in ("/api/v1/query/mongodb", "/api/v1/query/collection"):
            return self._dispatch(
                lambda: svc.query_collection(
                    collection=_q(p, "collection", required=True),
                    limit=int(_q(p, "limit", 100)),
                    filter=_json_filter(_q(p, "filter")),
                )
            )
        if url.path in ("/api/v1/query/influxdb", "/api/v1/query/timeseries"):
            fields = _q(p, "fields")
            return self._dispatch(
                lambda: svc.query_measurement(
                    measurement=_q(p, "measurement", required=True),
                    start=_q(p, "start", "-1h"),
                    stop=_q(p, "stop", "now()"),
                    fields=fields.split(",") if fields else None,
                )
            )
        self._send(404, {"detail": f"no route for GET {url.path}"})

    def do_POST(self) -> None:
        url = urlparse(self.path)
        svc = self.service
        if url.path == "/api/v1/etl/run":
            return self._dispatch(lambda: svc.run_etl(self._body()))
        if url.path == "/api/v1/data/upload":

            def _upload():
                b = self._body()
                for k in ("data", "target_type", "target_config"):
                    if k not in b:
                        raise ApiError(400, f"missing required field {k!r}")
                return svc.upload(b["data"], b["target_type"], b["target_config"])

            return self._dispatch(_upload)
        self._send(404, {"detail": f"no route for POST {url.path}"})


def make_server(service: DataLakeService, host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
    """Bind (port=0 → ephemeral) without starting; call
    ``serve_forever`` or use :func:`serve_background`."""
    handler = type("BoundHandler", (_Handler,), {"service": service})
    return ThreadingHTTPServer((host, port), handler)


def serve_background(service: DataLakeService, host: str = "127.0.0.1", port: int = 0):
    """Start in a daemon thread; returns (server, base_url). Tests and
    notebook drivers use this; ``server.shutdown()`` stops it."""
    server = make_server(service, host, port)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, f"http://{server.server_address[0]}:{server.server_address[1]}"
