"""Loopback-HTTP integration test for the REAL fetcher (round-4 verdict
ask #5): every other urlfetch test injects the deterministic fetcher, so
http_fetch_one's redirect/HTTPError/timeout handling had never executed.
A stdlib ThreadingHTTPServer on 127.0.0.1 serves the full route matrix:

* /ok          -> 200
* /moved       -> 301 + Location -> followed, reported as the FINAL 200
* /moved-dead  -> 301 with NO Location -> cannot follow, reported as 301
                  (the p013-parity case: the reference sees 301 exactly
                  when the chain ends at the 301 itself)
* /missing     -> 404 (HTTPError IS the status, not an error)
* /boom        -> 500
* /slow        -> sleeps past the timeout -> (None, error)

and live_url_status runs against it with the real fetcher through the
actual Spark mapInPandas path (extraction + trailing-punct strip +
distinct + thread-pooled fetch).
"""

from __future__ import annotations

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import Row

from metacheck_spark.sources.urlfetch import http_fetch_one, live_url_status


class _Routes(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 (stdlib handler name)
        if self.path == "/ok":
            body = b"hello"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/moved":
            self.send_response(301)
            self.send_header("Location", "/ok")
            self.send_header("Content-Length", "0")
            self.end_headers()
        elif self.path == "/moved-dead":
            self.send_response(301)  # no Location: un-followable redirect
            self.send_header("Content-Length", "0")
            self.end_headers()
        elif self.path == "/missing":
            self.send_error(404)
        elif self.path == "/boom":
            self.send_error(500)
        elif self.path == "/slow":
            time.sleep(5.0)
            self.send_error(504)
        else:
            self.send_error(400)

    def log_message(self, *a):  # keep pytest output clean
        pass


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Routes)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_fetch_one_route_matrix(server):
    fetch = http_fetch_one(timeout=1.0)
    assert fetch(f"{server}/ok") == (200, None)
    # 301 with Location: followed, final status reported
    assert fetch(f"{server}/moved") == (200, None)
    # 301 without Location: the chain ends AT the 301 -> reported as 301
    assert fetch(f"{server}/moved-dead") == (301, None)
    assert fetch(f"{server}/missing") == (404, None)
    assert fetch(f"{server}/boom") == (500, None)
    code, err = fetch(f"{server}/slow")
    assert code is None and err is not None  # timeout -> error class name
    # scheme-less URLs get the reference's http:// prefix treatment
    assert fetch(f"{server}/ok".removeprefix("http://")) == (200, None)


def test_http_fetch_one_unresolvable_host():
    fetch = http_fetch_one(timeout=1.0)
    code, err = fetch("http://host.invalid/x")  # RFC 6761 reserved TLD
    assert code is None and err == "URLError"


def test_live_url_status_real_fetcher_end_to_end(server, spark):
    """The full Spark path — extraction, trailing-punct strip, distinct,
    mapInPandas thread-pooled fetch — against the loopback server with
    the REAL fetcher (fetch_one left as default)."""
    df = spark.createDataFrame(
        [
            Row(caption=f"see {server}/ok."),          # trailing punct strip
            Row(caption=f"also {server}/ok here"),     # duplicate -> 1 fetch
            Row(caption=f"dead link {server}/missing"),
            Row(caption=f"old home {server}/moved"),
            Row(caption=f"legacy {server}/moved-dead"),
            Row(caption="no urls in this caption"),
        ]
    )
    got = {
        r["url"]: (r["status_code"], r["error"])
        for r in live_url_status(
            df, "caption", num_tasks=2, concurrency=4, timeout=2.0
        ).collect()
    }
    assert got == {
        f"{server}/ok": (200, None),
        f"{server}/missing": (404, None),
        f"{server}/moved": (200, None),
        f"{server}/moved-dead": (301, None),
    }
