"""Minimal HTTP facade: POST /druid/v2 (native JSON queries) and
POST /druid/v2/sql (Druid SQL), mirroring the reference's endpoints.

Reference: server/src/main/java/org/apache/druid/server/QueryResource.java:89,143
(native) and sql/src/main/java/org/apache/druid/sql/http/SqlResource.java:72,102
(SQL, resultFormat field). Stdlib http.server — the broker's whole
scatter/gather behind these endpoints is the Spark driver; this class
is just serialization.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from apache_druid_spark.plans.compiler import compile_query
from apache_druid_spark.sql.dialect import druid_sql
from apache_druid_spark.sql.results import format_results


class DruidHttpServer:
    """Serve a DatasourceRegistry over the Druid HTTP surface.

    >>> srv = DruidHttpServer(spark, registry, port=8888)
    >>> srv.start()          # background thread
    >>> # POST {"queryType": ...}          -> /druid/v2
    >>> # POST {"query": "SELECT ...", "resultFormat": "csv"} -> /druid/v2/sql
    >>> srv.stop()
    """

    def __init__(self, spark, registry, host: str = "127.0.0.1",
                 port: int = 8082):
        self.spark = spark
        self.registry = registry
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                try:
                    if self.path.rstrip("/") == "/druid/v2/sql":
                        df = druid_sql(outer.spark, body["query"],
                                       outer.registry)
                        fmt = body.get("resultFormat", "object")
                        payload = format_results(
                            df, fmt, header=bool(body.get("header")))
                    elif self.path.rstrip("/") == "/druid/v2":
                        df = compile_query(body, outer.registry)
                        payload = format_results(df, "object")
                    else:
                        self.send_error(404)
                        return
                except Exception as e:  # noqa: BLE001 — HTTP error surface
                    msg = json.dumps({"error": str(e)})
                    self.send_response(400)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(msg.encode())
                    return
                self.send_response(200)
                ctype = ("text/csv" if body.get("resultFormat") == "csv"
                         else "application/json")
                self.send_header("Content-Type", ctype)
                self.end_headers()
                self.wfile.write(payload.encode())

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> None:
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
