"""HTTP API surface mirroring the reference server's ``/api`` routes.

Reference parity (see src/server/rm_server/web/controllers/rad_mapper.clj
and web/handler.clj routes): GET /api/health, POST /api/process-rm,
GET /api/graph-get, POST /api/graph-put, POST /api/datalog-query,
POST /api/llm-match, GET /api/llm-extract, plus the exerciser code-save
endpoints (POST /api/save-code, GET /api/fetch-code — exerciser_saves.clj).

The reference serves these from Pathom3 resolvers over Datahike behind
reitit/ring; here each route is a thin stdlib ``http.server`` handler that
delegates to the SAME engine entry points the language uses — Interp for
process-rm, the $get/$put catalog for graph-get/put, the datalog planner
for datalog-query, operators.llm for the LLM routes — so the HTTP surface
adds no second code path. Spark work happens on the shared SparkSession
passed at construction (driver-side; the server is control plane, the
cluster is data plane — an RM program POSTed to process-rm can still fan
out to every executor through the normal query/express compilation).

Stdlib-only by design: the container has no Flask/FastAPI, and a
ThreadingHTTPServer is plenty for a control-plane endpoint.
"""

from __future__ import annotations

import json
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from .lang.interp import Interp, RMError
from .operators import llm as llm_ops
from .sources import readers


def _rm_literal(x) -> str:
    """Render an EDN-resolved qform element as RM query-triple source."""
    if isinstance(x, str):
        if x.startswith("?") or x.startswith(":"):
            return x  # qvar / attribute keyword
        return "'" + x.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if isinstance(x, bool):
        return "true" if x else "false"
    return repr(x)


def qforms_to_rm(qforms_edn: str) -> str:
    """Translate an EDN qforms string (the reference's datalog-query wire
    format, e.g. "[[?e :schema/name ?n]]") into RM query{} source."""
    from .sources import edn

    forms = edn.loads(qforms_edn)
    if not isinstance(forms, list) or not forms:
        raise ValueError("qforms must be a non-empty EDN vector of triples")
    clauses = []
    for f in forms:
        if not isinstance(f, list) or not (2 <= len(f) <= 4):
            raise ValueError(f"bad qform clause: {f!r}")
        clauses.append("[" + " ".join(_rm_literal(x) for x in f) + "]")
    return "query{" + " ".join(clauses) + "}"


class RMServer:
    """Threaded HTTP server over the engine. Usage:

        srv = RMServer(spark)          # spark optional: language-only mode
        srv.start()                    # returns the bound port
        ...
        srv.stop()
    """

    def __init__(self, spark=None, host: str = "127.0.0.1", port: int = 0):
        self.spark = spark
        self.host = host
        self.port = port
        self._httpd = None
        self._thread = None
        self._saves: dict = {}
        self._start_time = time.time()

    # ------------------------------------------------------------ routes

    def health(self) -> dict:
        return {"time": time.strftime("%Y-%m-%dT%H:%M:%S"),
                "up_since": time.strftime(
                    "%Y-%m-%dT%H:%M:%S", time.localtime(self._start_time))}

    def process_rm(self, code: str, data=None) -> dict:
        """POST /api/process-rm — run an RM program, return {"result": ...}.
        Mirrors controllers/rad_mapper.clj process-rm (bi/processRM with
        optional user-data)."""
        ip = Interp(self.spark)
        return {"result": ip.run(code, data=data)}

    def graph_get(self, ident_type: str, ident_val: str,
                  request_objs: str) -> dict:
        """GET /api/graph-get — $get([ident-type, ident-val], [objs]);
        request_objs is '|'-separated per the reference wire format."""
        props = [p for p in request_objs.split("|") if p]
        out = readers.catalog_get([ident_type, ident_val], props or None)
        if out is readers.NOMATCH:
            return {}
        if isinstance(out, dict):
            out = {k: v for k, v in out.items() if k != "fn_exe"}
        return out

    def graph_put(self, put_ident_type: str, put_ident_val: str,
                  put_obj) -> str:
        readers.rm_put(None, [put_ident_type, put_ident_val], put_obj)
        return "success"

    def datalog_query(self, qforms: str, data=None) -> list:
        """POST /api/datalog-query — EDN qforms against posted data (or the
        catalog's stored objects when no data is given). The reference runs
        qforms against its schema DB via query-fn-aux; our equivalent store
        is the $get/$put catalog."""
        src = "( $q := " + qforms_to_rm(qforms) + "; $q($data) )"
        if data is None:
            data = list(readers._load_catalog().values())
        ip = Interp(self.spark)
        return ip.run(src, bindings={"$data": data})

    def llm_match(self, src, tar) -> dict:
        return llm_ops.llm_match(src, tar)

    def llm_extract(self, source: str, seek: str):
        return llm_ops.llm_extract(source, seek)

    def save_code(self, body: dict) -> dict:
        if not body.get("code"):
            raise ValueError("No code found.")
        sid = str(uuid.uuid4())
        self._saves[sid] = dict(body)
        return {"save-id": sid}

    def fetch_code(self, save_id: str) -> dict:
        return self._saves.get(save_id, {})

    # ------------------------------------------------------------ http

    def _handler_class(self):
        srv = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence request logging
                pass

            def _reply(self, obj, status: int = 200):
                body = json.dumps(obj, default=str).encode("utf-8")
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _bad(self, msg: str, status: int = 400):
                self._reply({"error": msg}, status)

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length") or 0)
                raw = self.rfile.read(n) if n else b"{}"
                return json.loads(raw.decode("utf-8") or "{}")

            def do_GET(self):
                u = urlparse(self.path)
                q = {k: v[0] for k, v in parse_qs(u.query).items()}
                try:
                    if u.path == "/api/health":
                        return self._reply(srv.health())
                    if u.path == "/api/graph-get":
                        if not all(k in q for k in
                                   ("ident-type", "ident-val", "request-objs")):
                            return self._bad("Missing query args.")
                        return self._reply(srv.graph_get(
                            q["ident-type"], q["ident-val"], q["request-objs"]))
                    if u.path == "/api/llm-extract":
                        if not all(k in q for k in ("source", "seek")):
                            return self._bad(
                                "extract-src or extract-seek not provided.")
                        return self._reply(
                            {"result": srv.llm_extract(q["source"], q["seek"])})
                    if u.path == "/api/fetch-code":
                        return self._reply(srv.fetch_code(q.get("save-id", "")))
                    return self._bad("no such route", 404)
                except (RMError, ValueError) as e:
                    return self._bad(str(e))
                except Exception as e:  # route errors -> 500, never a hang
                    return self._bad(str(e), 500)

            def do_POST(self):
                u = urlparse(self.path)
                try:
                    body = self._body()
                    if u.path == "/api/process-rm":
                        if not body.get("code"):
                            return self._bad("No code provided.")
                        return self._reply(
                            srv.process_rm(body["code"], body.get("data")))
                    if u.path == "/api/graph-put":
                        ks = ("put-ident-type", "put-ident-val", "put-obj")
                        if not all(k in body for k in ks):
                            return self._bad("Missing args.")
                        return self._reply(srv.graph_put(*(body[k] for k in ks)))
                    if u.path == "/api/datalog-query":
                        if not body.get("qforms"):
                            return self._bad(
                                "No arguments applied to datalog query.")
                        return self._reply(srv.datalog_query(
                            body["qforms"], body.get("data")))
                    if u.path == "/api/llm-match":
                        if not (body.get("src") and body.get("tar")):
                            return self._bad("src or tar not provided.")
                        return self._reply(srv.llm_match(body["src"], body["tar"]))
                    if u.path == "/api/save-code":
                        return self._reply(srv.save_code(body))
                    return self._bad("no such route", 404)
                except (RMError, ValueError) as e:
                    return self._bad(str(e))
                except Exception as e:
                    return self._bad(str(e), 500)

        return Handler

    def start(self) -> int:
        self._httpd = ThreadingHTTPServer((self.host, self.port),
                                          self._handler_class())
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self.port

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
