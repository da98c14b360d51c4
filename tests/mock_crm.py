"""Local mock CRM sink for tests — same contract as the reference's
crm_server (POST /customers → 201; injectable 503 failures,
reference crm_server/server.go:19-36). Failure injection is deterministic
(by request index) instead of random, per FIXTURES.md §5."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class MockCRM:
    def __init__(self, fail_every: int = 0):
        """fail_every=N → every Nth request (1-based) gets a 503; 0 = none."""
        self.received: list[dict] = []
        self.total = 0
        self.failed = 0
        self._lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
                with outer._lock:
                    outer.total += 1
                    n = outer.total
                    if fail_every and n % fail_every == 0:
                        outer.failed += 1
                        self.send_response(503)
                        self.end_headers()
                        return
                    outer.received.append(json.loads(body))
                self.send_response(201)
                self.end_headers()

            def log_message(self, *a):
                pass

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self._server.server_port}"

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *a):
        self._server.shutdown()
        self._server.server_close()
