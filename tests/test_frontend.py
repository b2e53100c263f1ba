"""Frontend server tests: page render with injected config, health probe,
API status endpoint, sample serving."""

import http.client
import importlib
import json
import os
import socket
import threading
import time

import pytest


@pytest.fixture(scope="module")
def frontend(tmp_path_factory):
    # module-scoped MonkeyPatch: env vars and sys.path are restored after
    # this module, so later tests can't inherit frontend leftovers (or the
    # generically-named cached 'app' module)
    import sys

    mp = pytest.MonkeyPatch()
    mp.syspath_prepend("/root/repo/frontend")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    mp.setenv("PORT", str(port))
    mp.setenv("HOST", "127.0.0.1")
    mp.setenv("API_URL", "http://127.0.0.1:1")  # intentionally dead
    import app as frontend_app

    importlib.reload(frontend_app)
    from http.server import ThreadingHTTPServer

    frontend_app.FrontendHandler.samples = frontend_app._ensure_samples()
    server = ThreadingHTTPServer(("127.0.0.1", port), frontend_app.FrontendHandler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    time.sleep(0.2)
    yield "127.0.0.1", port
    server.shutdown()
    sys.modules.pop("app", None)
    mp.undo()


def _get(host, port, path):
    conn = http.client.HTTPConnection(host, port, timeout=10)
    conn.request("GET", path)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


def test_health(frontend):
    status, body = _get(*frontend, "/health")
    assert status == 200 and body == b"ok"


def test_index_injects_config(frontend):
    status, body = _get(*frontend, "/")
    assert status == 200
    assert b"__CONFIG__" not in body
    assert b"apiUrl" in body


def test_index_has_batch_ui(frontend):
    """Drag-and-drop zone, multi-file input, comparison slider, and
    download-all are part of the page contract."""
    status, body = _get(*frontend, "/")
    assert status == 200
    for needle in (b"multiple", b"downloadall", b"cmp-handle",
                   b"dataTransfer.files", b"tilemode", b"mode=tile"):
        assert needle in body


def test_index_pngname_helper_is_top_level(frontend):
    """pngName is used by BOTH the per-item download link and the
    download-all handler; declared inside select() it is a ReferenceError
    for download-all, silently breaking the button."""
    status, body = _get(*frontend, "/")
    assert status == 200
    text = body.decode()
    decl = text.index("const pngName")
    assert decl < text.index("function select("), \
        "pngName must be declared before (outside) select()"
    assert "pngName(" in text[text.index("downloadall').onclick"):]


def test_api_status_reports_offline(frontend):
    status, body = _get(*frontend, "/api_status")
    assert status == 200
    assert json.loads(body) == {"online": False}


def test_api_status_reports_stats_when_online(frontend):
    """When the API answers, /api_status enriches the payload with the
    deployed-model identity and serving numbers from /stats."""
    import sys
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class MockApi(BaseHTTPRequestHandler):
        def do_GET(self):
            body = (b'{"message":"pong"}' if self.path == "/ping" else
                    json.dumps({"model": "lightweight",
                                "model_path": "/m.onnx",
                                "requests_served": 3,
                                "latency_ms_p50": 8.5,
                                "queue_depth": 0}).encode())
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):
            pass

    mock = ThreadingHTTPServer(("127.0.0.1", 0), MockApi)
    t = threading.Thread(target=mock.serve_forever, daemon=True)
    t.start()
    app = sys.modules["app"]
    old = app.API_URL
    app.API_URL = f"http://127.0.0.1:{mock.server_address[1]}"
    try:
        status, body = _get(*frontend, "/api_status")
    finally:
        app.API_URL = old
        mock.shutdown()
    assert status == 200
    payload = json.loads(body)
    assert payload["online"] is True
    assert payload["stats"] == {"model": "lightweight",
                                "model_path": "/m.onnx",
                                "requests_served": 3,
                                "latency_ms_p50": 8.5}


def test_index_renders_stats_in_status_line(frontend):
    """The page JS turns the enriched /api_status into the status text."""
    status, body = _get(*frontend, "/")
    assert status == 200
    for needle in (b"j.stats", b"requests_served", b"latency_ms_p50"):
        assert needle in body


def test_samples_served(frontend):
    status, body = _get(*frontend, "/samples/test_input1.png")
    assert status == 200
    assert body.startswith(b"\x89PNG")


def test_committed_samples_served_verbatim(frontend):
    """The repo now CHECKS IN photo-grade samples (reference ships real
    photos under frontend/samples); _ensure_samples must serve those
    bytes untouched, not clobber them with the synthesized fallback."""
    import app as frontend_app

    path = os.path.join(frontend_app._SAMPLES_DIR, "test_input1.png")
    with open(path, "rb") as f:
        committed = f.read()
    assert frontend_app._ensure_samples() == ["test_input1.png",
                                              "test_input2.png"]
    with open(path, "rb") as f:
        assert f.read() == committed, "_ensure_samples rewrote a sample"
    status, body = _get(*frontend, "/samples/test_input1.png")
    assert status == 200 and body == committed


def test_infer_proxy_forwards_to_api(frontend):
    """POST /infer on the frontend proxies to the API server-side: the
    browser cannot resolve cluster-internal API addresses (k8s Service
    names, compose hostnames) — the reference's Streamlit server makes the
    request itself for the same reason."""
    import http.client
    import sys
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    seen = {}

    class MockApi(BaseHTTPRequestHandler):
        def do_POST(self):
            seen["path"] = self.path
            seen["ctype"] = self.headers.get("Content-Type")
            seen["body"] = self.rfile.read(
                int(self.headers.get("Content-Length", "0")))
            body = b'{"image":"ZmFrZQ=="}'
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):
            pass

    mock = ThreadingHTTPServer(("127.0.0.1", 0), MockApi)
    t = threading.Thread(target=mock.serve_forever, daemon=True)
    t.start()
    app = sys.modules["app"]
    old = app.API_URL
    app.API_URL = f"http://127.0.0.1:{mock.server_address[1]}"
    try:
        host, port = frontend
        conn = http.client.HTTPConnection(host, port, timeout=30)
        payload = b"--b\r\nContent-Disposition: form-data; " \
                  b"name=\"image\"\r\n\r\nxx\r\n--b--\r\n"
        conn.request("POST", "/infer?mode=tile", body=payload,
                     headers={"Content-Type":
                              "multipart/form-data; boundary=b"})
        resp = conn.getresponse()
        data = resp.read()
        conn.close()
    finally:
        app.API_URL = old
        mock.shutdown()
    assert resp.status == 200 and json.loads(data)["image"] == "ZmFrZQ=="
    # body, content type, AND the query string pass through unchanged
    assert seen == {"path": "/infer?mode=tile",
                    "ctype": "multipart/form-data; boundary=b",
                    "body": payload}


def test_infer_proxy_unreachable_api_502(frontend):
    import http.client
    import sys

    app = sys.modules["app"]
    old = app.API_URL
    app.API_URL = "http://127.0.0.1:1"
    try:
        host, port = frontend
        conn = http.client.HTTPConnection(host, port, timeout=30)
        conn.request("POST", "/infer", body=b"x",
                     headers={"Content-Type": "text/plain"})
        resp = conn.getresponse()
        data = resp.read()
        conn.close()
    finally:
        app.API_URL = old
    assert resp.status == 502 and b"unreachable" in data


def test_index_defaults_to_same_origin_api(frontend):
    """CONFIG.apiUrl defaults to '' (same-origin proxy) so the deployed
    page works without the browser reaching the API directly."""
    status, body = _get(*frontend, "/")
    assert status == 200
    assert b'"apiUrl": ""' in body or b'"apiUrl":""' in body
