"""Opt-in real-dependency tier (round-3 verdict item 5).

Default runs keep every fake: deterministic embeddings, fake fetcher,
stdlib HTML parser. Setting PARLER_REAL_DEPS=1 exercises the real
seams that the fakes stand in for:

- S9/M5: `fetch_objects(fetcher="http")` against a local
  `http.server` (no external network — the server binds 127.0.0.1
  inside the test), proving the urllib path, the error taxonomy on a
  live 404, and the binary payload round-trip.
- M2: `embed_documents(backend="st")` with a real
  sentence-transformers model, proving the per-worker model-load
  seam (`functions/embed.py:_st_model`). Skips (with a reason) when
  the library genuinely isn't installed — the flag promises to
  exercise what the environment CAN run, not to conjure wheels.

The bs4 differential (test_html_fixtures.test_differential_vs_bs4)
already self-gates on `pytest.importorskip("bs4")` and needs no flag.
"""

from __future__ import annotations

import http.server
import os
import socketserver
import threading

import pytest

from parlerproject_spark.sources.fetch import fetch_objects

pytestmark = pytest.mark.skipif(
    not os.environ.get("PARLER_REAL_DEPS"),
    reason="real-dependency tier: set PARLER_REAL_DEPS=1 to run")


@pytest.fixture()
def local_http_server():
    payloads = {
        "/a.bin": b"alpha-bytes",
        "/b.bin": b"beta-bytes-longer",
    }

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (stdlib casing)
            body = payloads.get(self.path)
            if body is None:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    srv = socketserver.TCPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}", payloads
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_fetch_against_local_server(spark, local_http_server):
    base_url, payloads = local_http_server
    listing = spark.createDataFrame(
        [("a.bin",), ("b.bin",), ("nope.bin",)], ["filename"])
    out = {r["filename"]: (r["status"], bytes(r["content"] or b""))
           for r in fetch_objects(listing, base_url=base_url + "/",
                                  fetcher="http").collect()}
    assert out["a.bin"] == ("success", payloads["/a.bin"])
    assert out["b.bin"] == ("success", payloads["/b.bin"])
    # live 404 -> HTTPError (a URLError) -> the reference's
    # connection_error taxonomy bucket, empty payload
    assert out["nope.bin"] == ("connection_error", b"")


def test_embed_documents_real_backend(spark):
    pytest.importorskip(
        "sentence_transformers",
        reason="backend='st' needs sentence-transformers installed")
    from parlerproject_spark.functions.embed import embed_documents

    docs = spark.createDataFrame(
        [(1, "spark executes declarative plans"),
         (2, "spark executes declarative plans"),
         (3, "an entirely different sentence")],
        ["doc_id", "text"])
    rows = {r["doc_id"]: r["embedding"]
            for r in embed_documents(docs, backend="st").collect()}
    # real model: identical text -> identical vector, and the vector
    # is model-dim (not our fake's), finite, non-degenerate
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]
    assert len(rows[1]) >= 128
    assert any(abs(x) > 1e-8 for x in rows[1])
