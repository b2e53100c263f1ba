"""Load-test the byte-parity /infer path (reference: api/app.py:109-213).

Posts a document-like grayscale PNG over C concurrent keep-alive
connections and reports throughput + latency percentiles. Usage:

    python scripts/load_test_api.py --url http://127.0.0.1:4000 \
        --requests 200 --concurrency 16 --size 512
"""

import argparse
import io
import json
import os
import sys
import threading
import time
from urllib.parse import urlparse

import numpy as np


def make_document_png(size: int) -> bytes:
    """Synthetic scanned-document page: white ground, text lines, glare."""
    from PIL import Image

    rng = np.random.default_rng(0)
    img = np.full((size, size), 235, np.uint8)
    for r in range(size // 12, size - 10, size // 24):
        mask = rng.random(size) < 0.4
        img[r : r + max(2, size // 64), mask] = 40
    yy, xx = np.mgrid[0:size, 0:size]
    glare = (80 * np.exp(-(((yy - size * 0.4) / (size * 0.5)) ** 2
                           + ((xx - size * 0.6) / (size * 0.6)) ** 2)))
    img = np.clip(img.astype(np.int32) + glare.astype(np.int32), 0, 255)
    buf = io.BytesIO()
    Image.fromarray(img.astype(np.uint8), "L").save(buf, format="PNG")
    return buf.getvalue()


class _PassthroughEngine:
    """Instant engine: isolates the HTTP/host layer (multipart, PIL decode,
    resizes, PNG encode, base64, keep-alive loop) from device/link speed."""

    def submit(self, img_u8):
        from concurrent.futures import Future

        fut = Future()
        fut.set_result(img_u8)
        return fut

    def stats(self):
        return {"requests_served": -1}

    def stop(self):
        pass


def _start_selftest_server(port: int):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from image_enhancement_deglaring_tpu.serve.http_server import DeglareServer

    server = DeglareServer(_PassthroughEngine(), host="127.0.0.1", port=port,
                           image_size=512, log_dir="/tmp/loadtest_logs")
    t = threading.Thread(target=server.run, daemon=True)
    t.start()
    import http.client
    for _ in range(100):
        try:
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=1)
            c.request("GET", "/ping")
            c.getresponse().read()
            return server
        except OSError:
            time.sleep(0.1)
    raise RuntimeError("selftest server failed to start")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:4000")
    ap.add_argument("--requests", type=int, default=200)
    ap.add_argument("--concurrency", type=int, default=16)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--selftest", action="store_true",
                    help="spin up an in-process server with a passthrough "
                         "engine: measures the HTTP/host layer alone")
    args = ap.parse_args()
    if args.selftest:
        port = 4973
        _start_selftest_server(port)
        args.url = f"http://127.0.0.1:{port}"

    import http.client

    png = make_document_png(args.size)
    boundary = "LOADTESTBOUND"
    body = (
        f'--{boundary}\r\nContent-Disposition: form-data; name="image"; '
        f'filename="doc.png"\r\nContent-Type: image/png\r\n\r\n'
    ).encode() + png + f"\r\n--{boundary}--\r\n".encode()
    headers = {"Content-Type": f"multipart/form-data; boundary={boundary}"}
    u = urlparse(args.url)

    lock = threading.Lock()
    remaining = [args.requests]
    latencies: list[float] = []
    errors = [0]

    def worker():
        conn = http.client.HTTPConnection(u.hostname, u.port, timeout=120)
        while True:
            with lock:
                if remaining[0] <= 0:
                    break
                remaining[0] -= 1
            t0 = time.perf_counter()
            try:
                conn.request("POST", "/infer", body=body, headers=headers)
                resp = conn.getresponse()
                data = resp.read()
                ok = resp.status == 200 and b"image" in data
            except Exception:
                ok = False
                conn.close()
                conn = http.client.HTTPConnection(u.hostname, u.port, timeout=120)
            dt = time.perf_counter() - t0
            with lock:
                if ok:
                    latencies.append(dt)
                else:
                    errors[0] += 1
        conn.close()

    # one warm request (compiles/warms everything before the clock starts);
    # guarded so a down server still yields the errors-counted summary
    # instead of a raw traceback
    try:
        w = http.client.HTTPConnection(u.hostname, u.port, timeout=600)
        w.request("POST", "/infer", body=body, headers=headers)
        w.getresponse().read()
        w.close()
    except (OSError, http.client.HTTPException) as e:
        # HTTPException (BadStatusLine from a non-HTTP listener, truncated
        # responses) is NOT an OSError — without it the guard's promised
        # errors-counted summary is skipped for a raw traceback
        print(f"warm request failed ({e}); proceeding cold")

    threads = [threading.Thread(target=worker) for _ in range(args.concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    lat = sorted(latencies)

    def pct(p):
        # None when every request failed — the summary (with the error
        # count) must still print instead of crashing on round(None)
        return round(lat[min(len(lat) - 1, int(p * len(lat)))] * 1000, 1) \
            if lat else None

    print(json.dumps({
        "requests_ok": len(latencies),
        "errors": errors[0],
        "concurrency": args.concurrency,
        "input": f"{args.size}x{args.size} document PNG ({len(png)} B)",
        "wall_s": round(wall, 2),
        "req_per_s": round(len(latencies) / wall, 1),
        "latency_ms_p50": pct(0.50),
        "latency_ms_p95": pct(0.95),
    }))
    return 0 if errors[0] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
