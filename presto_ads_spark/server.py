"""Minimal HTTP statement API — the reference's primary entry point.

Presto clients POST SQL to ``/v1/statement`` and poll result pages
(reference: presto-main/.../server/protocol/StatementResource.java:84-170;
CLI/JDBC speak the same protocol, SURVEY.md §3.2). This facade accepts the
same POST shape and returns a single-page response with Presto-style
``columns``/``data``/``stats`` fields (small results; ``nextUri`` is always
absent — pagination buys nothing when Spark already streamed the result to
the driver). For heavy remote clients use Spark Connect instead; this
endpoint exists so a presto-ads user's curl/HTTP integration keeps working.
"""

from __future__ import annotations

import datetime
import decimal
import json
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _json_default(v):
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep=" ")
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


class StatementServer:
    """``POST /v1/statement`` with the SQL text as the request body."""

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 0,
                 max_rows: int = 10_000):
        self.engine = engine
        self.max_rows = max_rows
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def do_POST(self):
                if self.path.rstrip("/") != "/v1/statement":
                    self.send_error(404)
                    return
                length = int(self.headers.get("Content-Length", 0))
                sql = self.rfile.read(length).decode("utf-8")
                body = outer.execute(sql)
                payload = json.dumps(body, default=_json_default).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address
        self._thread: threading.Thread | None = None

    def execute(self, sql: str) -> dict:
        query_id = str(uuid.uuid4())
        try:
            df = self.engine.sql(sql)
            rows = df.limit(self.max_rows).collect()
            return {
                "id": query_id,
                "columns": [
                    {"name": f.name, "type": f.dataType.simpleString()}
                    for f in df.schema.fields
                ],
                "data": [list(r) for r in rows],
                "stats": {"state": "FINISHED", "rows": len(rows)},
            }
        except Exception as e:  # Presto reports errors in-band
            return {
                "id": query_id,
                "error": {
                    "message": str(e).split("\n")[0],
                    "errorType": type(e).__name__,
                },
                "stats": {"state": "FAILED"},
            }

    def start(self) -> int:
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self.port

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
