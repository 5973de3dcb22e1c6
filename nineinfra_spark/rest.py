"""REST SQL gateway (the reference's Kyuubi REST frontend role).

The platform pins ``kyuubi.frontend.protocols=REST,THRIFT_BINARY``
(``api/v1alpha1/ninecluster_metadata.go:22-27``) — THRIFT_BINARY is
served by ``gateway.py`` (HiveServer2 in-JVM); this module provides
the REST half: a thin HTTP endpoint that accepts SQL text and returns
JSON rows, the shape BI tools and job submitters hit on Kyuubi's
port 10099.

Design constraints, mirrored from the gateway tier's reality:

- The server is a daemon thread in the driver process; Spark sessions
  are thread-safe for concurrent ``sql()`` calls (each request plans
  on the shared session, like Kyuubi's USER-share engine mode).
- Result fetch is a bounded ``limit(n).collect()`` — a gateway FETCHES
  a window of rows to the client by definition; the cap (default
  1000, per-request override) keeps a careless ``SELECT * FROM fact``
  from materializing 100 TB on the driver. Unbounded extraction is a
  WRITE (``INSERT INTO``/``CREATE TABLE AS``) through the same SQL
  surface, exactly as on the real platform.

Endpoints:

- ``GET  /api/v1/ping``    → ``{"status": "ok"}`` liveness (always
  open — a load balancer probes it without credentials)
- ``POST /api/v1/sql``     → body ``{"sql": "...", "limit": 100}``;
  responds ``{"columns": [...], "rows": [[...]], "rowCount": N,
  "truncated": bool}``. Errors → HTTP 400 with ``{"error": ...}``.
  With ``{"explain": true, "explainMode": "formatted"}`` the query is
  only PLANNED — the response carries ``{"columns", "plan"}`` and no
  data moves (modes: simple/extended/codegen/cost/formatted).

Session isolation: a request carrying an ``X-Session-Id`` header runs
on a dedicated ``spark.newSession()`` keyed by that id — own temp
views and SQL conf, SHARED SparkContext, catalog tables and cached
data. That is Kyuubi's CONNECTION-share engine semantic; requests
without the header keep the USER-share semantic (the one shared
session, temp views visible to every headerless client and to the
in-JVM thrift frontend). Catalog DDL from any session goes through
the single metastore and is serialized there.

Authentication: pass ``auth`` (any ``(username, password) -> bool``,
typically :class:`nineinfra_spark.auth.UserStore` — the reference's
salted-MD5 users-table scheme, ``internal/controller/kyuubi.go:55-64``)
to require HTTP Basic credentials on ``/api/v1/sql``; missing or
invalid credentials → 401 with ``WWW-Authenticate``. With ``auth=None``
the frontend is open, matching the reference's non-JDBC auth mode
(``kyuubi.go:66-69`` omits ``kyuubi.authentication`` entirely).
"""

from __future__ import annotations

import base64
import binascii
import json
import threading
from collections import OrderedDict
from collections.abc import Callable
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

DEFAULT_FETCH_LIMIT = 1000
#: Server-side ceiling on the per-request ``limit`` override — the cap
#: exists to stop careless driver materialization, so the client must
#: not be able to raise it past this.
MAX_FETCH_LIMIT = 10_000

#: Cap on live ``X-Session-Id`` sessions per gateway. The header is
#: client-controlled, so an unbounded registry lets one client cycling
#: random ids grow driver memory without limit; past the cap the
#: least-recently-USED id is evicted (its temp views and conf are
#: dropped — a returning client gets a fresh clone, the same contract
#: as a gateway-side idle-session timeout).
MAX_SESSIONS = 64


def _json_default(v):
    # datetimes, Decimals, bytearrays → strings; keeps the wire format
    # engine-agnostic (clients parse values, not pickles)
    return str(v)


class _Handler(BaseHTTPRequestHandler):
    spark: SparkSession  # injected by start_rest_gateway
    auth: Callable[[str, str], bool] | None  # None → open frontend
    # per-gateway session registry: X-Session-Id → newSession() clone
    # (class attrs are injected per-gateway by start_rest_gateway)
    sessions: dict[str, SparkSession]
    sessions_lock: threading.Lock

    def log_message(self, *args) -> None:  # silence per-request stderr noise
        pass

    def _session(self) -> SparkSession:
        """The SparkSession this request runs on: the shared session,
        or (with ``X-Session-Id``) a per-id ``newSession()`` clone —
        own temp views/conf, shared context+catalog."""
        sid = self.headers.get("X-Session-Id")
        if not sid:
            return self.spark
        with self.sessions_lock:
            sess = self.sessions.get(sid)
            if sess is None:
                sess = self.spark.newSession()
                self.sessions[sid] = sess
                while len(self.sessions) > MAX_SESSIONS:
                    self.sessions.popitem(last=False)  # LRU eviction
            else:
                self.sessions.move_to_end(sid)
        return sess

    def _reply(self, code: int, payload: dict) -> None:
        body = json.dumps(payload, default=_json_default).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self) -> None:  # noqa: N802 — http.server API
        if self.path == "/api/v1/ping":
            self._reply(200, {"status": "ok"})
        else:
            self._reply(404, {"error": f"unknown path {self.path}"})

    def _authorized(self) -> bool:
        """HTTP Basic check against the injected validator. The
        username/password split and charset follow RFC 7617; any parse
        failure is simply 'not authorized' (no 500s on garbage)."""
        if self.auth is None:
            return True
        header = self.headers.get("Authorization", "")
        if not header.startswith("Basic "):
            return False
        try:
            decoded = base64.b64decode(header[6:], validate=True).decode("utf-8")
            username, _, password = decoded.partition(":")
        except (binascii.Error, UnicodeDecodeError):
            return False
        return bool(self.auth(username, password))

    def do_POST(self) -> None:  # noqa: N802 — http.server API
        if self.path != "/api/v1/sql":
            self._reply(404, {"error": f"unknown path {self.path}"})
            return
        if not self._authorized():
            self.send_response(401)
            self.send_header("WWW-Authenticate", 'Basic realm="nineinfra"')
            body = json.dumps({"error": "unauthorized"}).encode()
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        try:
            length = int(self.headers.get("Content-Length", "0"))
            req = json.loads(self.rfile.read(length) or b"{}")
            if not isinstance(req, dict):
                raise TypeError(f"body must be a JSON object, got {type(req).__name__}")
            sql = req["sql"]
            limit = int(req.get("limit", DEFAULT_FETCH_LIMIT))
            if limit < 0 or limit > MAX_FETCH_LIMIT:
                raise ValueError(f"limit must be in [0, {MAX_FETCH_LIMIT}], got {limit}")
            explain = bool(req.get("explain", False))
            explain_mode = str(req.get("explainMode", "formatted"))
            if explain_mode not in (
                "simple", "extended", "codegen", "cost", "formatted",
            ):
                raise ValueError(f"unknown explainMode {explain_mode!r}")
        except (KeyError, TypeError, ValueError, json.JSONDecodeError) as exc:
            self._reply(400, {"error": f"bad request: {exc}"})
            return
        try:
            df = self._session().sql(sql)
            if explain:
                # plan-only mode: nothing executes, nothing fetches —
                # the gateway answers "what would this cost" questions
                # without touching the data (Kyuubi operation
                # EXECUTE_STATEMENT with EXPLAIN, minus the round trip)
                qe = df._jdf.queryExecution()  # noqa: SLF001
                self._reply(
                    200,
                    {
                        "columns": df.columns,
                        "plan": qe.explainString(
                            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(  # noqa: SLF001, E501
                                explain_mode
                            )
                        ),
                    },
                )
                return
            # fetch limit+1 to report truncation without a count() pass
            rows = df.limit(limit + 1).collect()
            truncated = len(rows) > limit
            rows = rows[:limit]
            self._reply(
                200,
                {
                    "columns": df.columns,
                    "rows": [list(r) for r in rows],
                    "rowCount": len(rows),
                    "truncated": truncated,
                },
            )
        except Exception as exc:  # engine errors → structured 400, not a 500 stack
            self._reply(400, {"error": str(exc)[:4000]})


class RestGateway:
    """Handle for a running REST endpoint (returned by
    :func:`start_rest_gateway`; ``Engine.close`` calls :meth:`stop`)."""

    def __init__(self, server: ThreadingHTTPServer, thread: threading.Thread):
        self._server = server
        self._thread = thread

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=10)


def start_rest_gateway(
    spark: SparkSession,
    port: int = 0,
    auth: Callable[[str, str], bool] | None = None,
) -> RestGateway:
    """Serve the REST SQL frontend on ``port`` (0 = OS-assigned; read
    the bound port from the returned handle). Binds immediately; the
    accept loop runs on a daemon thread. ``auth``: optional
    ``(username, password) -> bool`` validator enforcing HTTP Basic on
    ``/api/v1/sql`` (see module docstring)."""
    handler = type(
        "BoundHandler",
        (_Handler,),
        {
            "spark": spark,
            "auth": auth,
            "sessions": OrderedDict(),
            "sessions_lock": threading.Lock(),
        },
    )
    server = ThreadingHTTPServer(("127.0.0.1", port), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return RestGateway(server, thread)
