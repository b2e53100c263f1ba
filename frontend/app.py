"""Web frontend: upload -> enhance -> download.

The reference ships a Streamlit app (reference: frontend/app.py:128-209:
API status indicator, sample-image buttons, before/after columns, download
button). Streamlit is not in this environment, so the same UX is a
zero-dependency stdlib HTTP server + a static page. ``/health`` mirrors
Streamlit's ``/_stcore/health`` role for the k8s probes.

The page's enhance requests go through this server's ``POST /infer``
PROXY by default: API_URL names a SERVER-side address (a cluster-internal
Service in k8s, a compose service name) that the user's browser cannot
resolve — exactly like the reference, whose Streamlit server makes the
request itself (reference: frontend/app.py:43,88). Deployments where the
browser CAN reach the API directly may set BROWSER_API_URL to skip the
proxy hop (the API sends CORS headers).

Env: API_URL (reference: frontend/app.py:17), BROWSER_API_URL, HOST, PORT.
"""

from __future__ import annotations

import json
import os
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

API_URL = os.environ.get("API_URL", "http://localhost:4000")
# what the BROWSER should call for /infer: "" = same-origin (this server
# proxies to API_URL); set to a reachable API address to go direct
BROWSER_API_URL = os.environ.get("BROWSER_API_URL", "")
HOST = os.environ.get("HOST", "0.0.0.0")
PORT = int(os.environ.get("PORT", "8501"))
#: proxy deadline: covers the API's own bounded engine wait (300 s)
PROXY_TIMEOUT_S = 330

_HERE = os.path.dirname(os.path.abspath(__file__))
_SAMPLES_DIR = os.path.join(_HERE, "samples")


def _ensure_samples() -> list[str]:
    """Generate two sample glare images on first run (the reference checks
    in real sample PNGs; ours are synthesized)."""
    os.makedirs(_SAMPLES_DIR, exist_ok=True)
    names = ["test_input1.png", "test_input2.png"]
    missing = [n for n in names if not os.path.exists(os.path.join(_SAMPLES_DIR, n))]
    if missing:
        try:
            import numpy as np
            from PIL import Image

            from image_enhancement_deglaring_tpu.data.synthetic import make_triptych

            # regenerate ONLY the absent files (a user-customized surviving
            # sample must not be clobbered); seed per name so the images
            # stay stable regardless of which subset is missing
            for n in missing:
                rng = np.random.default_rng(7 + names.index(n))
                trip = make_triptych(rng, size=512)
                third = trip.shape[1] // 3
                glared = trip[:, third: 2 * third]
                Image.fromarray(glared, mode="RGBA").save(os.path.join(_SAMPLES_DIR, n))
        except Exception:
            return []
    return names


class FrontendHandler(BaseHTTPRequestHandler):
    samples: list[str] = []

    def do_GET(self):
        if self.path in ("/", "/index.html"):
            self._serve_index()
        elif self.path == "/health":
            self._send(200, b"ok", "text/plain")
        elif self.path == "/api_status":
            self._api_status()
        elif self.path.startswith("/samples/"):
            self._serve_sample(os.path.basename(self.path))
        else:
            self._send(404, b"not found", "text/plain")

    def _send(self, status: int, body: bytes, ctype: str):
        self.send_response(status)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        if self.path.split("?")[0] == "/infer":
            self._proxy_infer()
        else:
            self._send(404, b"not found", "text/plain")

    def _proxy_infer(self):
        """Forward the browser's multipart /infer to the API: the browser
        cannot resolve cluster-internal API addresses (k8s Service names,
        compose hostnames) — the reference's Streamlit server makes the
        request server-side for the same reason."""
        import urllib.error

        try:
            length = int(self.headers.get("Content-Length", "0") or 0)
        except ValueError:
            self._send(400, b'{"detail":"Bad Content-Length"}',
                       "application/json")
            return
        body = self.rfile.read(length) if length else b""
        req = urllib.request.Request(
            f"{API_URL}{self.path}", data=body, method="POST",
            headers={"Content-Type": self.headers.get("Content-Type", "")})
        try:
            with urllib.request.urlopen(req, timeout=PROXY_TIMEOUT_S) as r:
                self._send(r.status, r.read(),
                           r.headers.get("Content-Type", "application/json"))
        except urllib.error.HTTPError as e:  # pass API errors through
            self._send(e.code, e.read(),
                       e.headers.get("Content-Type", "application/json"))
        except Exception as e:
            self._send(502, json.dumps(
                {"detail": f"API unreachable: {e}"}).encode(),
                "application/json")

    def _serve_index(self):
        with open(os.path.join(_HERE, "index.html"), "rb") as f:
            page = f.read()
        cfg = {"apiUrl": BROWSER_API_URL, "samples": self.samples}
        page = page.replace(b"__CONFIG__", json.dumps(cfg).encode())
        self._send(200, page, "text/html; charset=utf-8")

    def _serve_sample(self, name: str):
        path = os.path.join(_SAMPLES_DIR, os.path.basename(name))
        if not os.path.exists(path):
            self._send(404, b"no such sample", "text/plain")
            return
        with open(path, "rb") as f:
            self._send(200, f.read(), "image/png")

    def _api_status(self):
        """Server-side API liveness probe (reference: frontend/app.py:21-29),
        enriched with the API's /stats (deployed model + serving numbers)
        when it answers — shown in the page's status line."""
        try:
            with urllib.request.urlopen(f"{API_URL}/ping", timeout=3) as r:
                ok = r.status == 200
        except Exception:
            ok = False
        payload: dict = {"online": ok}
        if ok:
            try:
                with urllib.request.urlopen(f"{API_URL}/stats", timeout=3) as r:
                    stats = json.loads(r.read())
                payload["stats"] = {
                    k: stats[k]
                    for k in ("model", "model_path", "requests_served",
                              "latency_ms_p50")
                    if k in stats
                }
            except Exception:
                pass  # stats are decoration; liveness already answered
        self._send(200, json.dumps(payload).encode(), "application/json")

    def log_message(self, fmt, *args):
        pass


def main():
    FrontendHandler.samples = _ensure_samples()
    server = ThreadingHTTPServer((HOST, PORT), FrontendHandler)
    print(f"Frontend serving on {HOST}:{PORT} (API_URL={API_URL})")
    server.serve_forever()


if __name__ == "__main__":
    main()
