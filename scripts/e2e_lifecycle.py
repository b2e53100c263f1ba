"""One-command lifecycle rehearsal: the reference's full user workflow
(reference: README.md:63-171) driven end-to-end through THIS framework's
CLIs, with metric assertions at every stage — so the day the real SD1
dataset appears, proving parity is one command:

    make e2e            # CPU, tiny shapes, ~5-10 min
    python scripts/e2e_lifecycle.py --tpu   # same flow on the real chip

Stages (each is the actual production CLI in a subprocess, not a
library shortcut):
  1. synthesize an SD1-contract dataset        (cli.make_synthetic)
  2. validate it                               (cli.check_dataset)
  3. short hyperparameter sweep                (cli.sweep)
  4. train with the sweep's best config        (cli.train)
  5. export the best checkpoint to ONNX        (cli.export_onnx)
  6. evaluate the ONNX artifact                (cli.evaluate; JAX-vs-ONNX
     L1 parity asserted against the train loop's best val loss)
  7. promotion gate vs the shipped artifact    (scripts/crossval_artifact.py)
  8. serve the ONNX artifact over HTTP         (cli.serve)
  9. drive the live API                        (cli.test_api --test all)
 10. frontend proxy round-trip                 (frontend/app.py /infer)
 11. SIGTERM drain: server exits 0

Prints one PASS line per stage and a final JSON summary.
"""

import argparse
import base64
import json
import math
import os
import signal
import socket
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PY = sys.executable


def _env(tpu: bool) -> dict:
    if tpu:
        return dict(os.environ)
    # CPU mode: drop the axon sitecustomize from PYTHONPATH so
    # JAX_PLATFORMS=cpu is honored (CLAUDE.md: the env var is ignored
    # while /root/.axon_site is importable)
    return {
        "PATH": os.environ.get("PATH", ""),
        "HOME": os.environ.get("HOME", "/root"),
        "PYTHONPATH": REPO,
        "JAX_PLATFORMS": "cpu",
        "JAX_COMPILATION_CACHE_DIR": os.path.join(REPO, "tests", ".jax_cache"),
    }


def _run(args, env, timeout, tag):
    t0 = time.time()
    r = subprocess.run(args, env=env, capture_output=True, text=True,
                       timeout=timeout)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:] + "\n" + r.stderr[-4000:] + "\n")
        raise SystemExit(f"FAIL {tag}: rc={r.returncode}")
    print(f"PASS {tag} ({time.time() - t0:.1f}s)")
    return r.stdout


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _wait_http(url, deadline_s, proc=None):
    t0 = time.time()
    while time.time() - t0 < deadline_s:
        if proc is not None and proc.poll() is not None:
            raise SystemExit(f"FAIL: server died rc={proc.returncode}")
        try:
            with urllib.request.urlopen(url, timeout=5) as resp:
                return resp.read()
        except Exception:
            time.sleep(1.0)
    raise SystemExit(f"FAIL: {url} not up within {deadline_s}s")


def _multipart(field, fname, payload):
    boundary = "e2eBoundary7430"
    body = (f"--{boundary}\r\nContent-Disposition: form-data; "
            f'name="{field}"; filename="{fname}"\r\n'
            "Content-Type: image/png\r\n\r\n").encode() + payload + \
        f"\r\n--{boundary}--\r\n".encode()
    return body, f"multipart/form-data; boundary={boundary}"


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--tpu", action="store_true",
                   help="run on the real chip (default: forced CPU)")
    p.add_argument("--work_dir", default="/tmp/e2e_lifecycle")
    p.add_argument("--size", type=int, default=64,
                   help="image size for train/eval stages (divisible by 16)")
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--sweep_count", type=int, default=3)
    args = p.parse_args()

    env = _env(args.tpu)
    W = args.work_dir
    os.makedirs(W, exist_ok=True)
    data, sweep_dir, models = (os.path.join(W, d)
                               for d in ("data", "sweep", "models"))
    t_all = time.time()
    summary = {}

    # 1. data — n_train is sized so every sweep-sampled batch size fits
    _run([PY, "-m", "image_enhancement_deglaring_tpu.cli.make_synthetic",
          "--out_dir", data, "--n_train", "24", "--n_val", "8",
          "--size", str(args.size)], env, 300, "make_synthetic")

    # 2. dataset validator (the reference's check_png.py contract check;
    # rc==0 == every triptych passes dimension/RGBA/decodability checks)
    _run([PY, "-m", "image_enhancement_deglaring_tpu.cli.check_dataset",
          data, "--width", str(3 * args.size), "--height", str(args.size)],
         env, 300, "check_dataset")

    # 3. sweep (random method: cheap + deterministic trial count)
    _run([PY, "-m", "image_enhancement_deglaring_tpu.cli.sweep",
          "--data_dir", os.path.join(data, "train"),
          "--output_dir", sweep_dir, "--sweep_count", str(args.sweep_count),
          "--max_epochs", "2", "--early_stop_min_iter", "1", "--eta", "2",
          "--image_size", "32", "--method", "random", "--num_workers", "2"],
         env, 1800, "sweep")
    with open(os.path.join(sweep_dir, "sweep_results.json")) as f:
        best = json.load(f)["best"]
    assert best is not None and best["best_val_loss"] < 1.0, best
    summary["sweep_best_val_loss"] = best["best_val_loss"]

    # 4. train with the sweep's winning config
    _run([PY, "-m", "image_enhancement_deglaring_tpu.cli.train",
          "--data_dir", os.path.join(data, "train"),
          "--output_dir", models, "--epochs", str(args.epochs),
          "--batch_size", str(min(best["batch_size"], 16)),
          "--lr", str(best["lr"]), "--weight_decay", str(best["wd"]),
          "--image_size", str(args.size), "--validation_metrics_every", "1",
          "--num_workers", "2", "--save_every", "1000"],
         env, 1800, "train")
    with open(os.path.join(models, "logs", "metrics.jsonl")) as f:
        records = [json.loads(ln) for ln in f]
    val_losses = [r["val_loss"] for r in records if "val_loss" in r]
    assert val_losses, "no val_loss records in metrics.jsonl"
    best_val = min(val_losses)
    # non-divergence gate, not strict improvement: with few epochs and a
    # sweep-chosen tiny LR, epoch 1 can legitimately be the minimum — the
    # rehearsal verifies the pipeline runs and stays sane, convergence
    # depth is the synthetic-demo script's job. Bound: untrained-model L1
    # on [0,1] images is ~0.2-0.5, so any trained epoch sits well under
    # 1.0 unless the loss went non-finite or the pipeline mis-scaled.
    assert (best_val < 1.0
            and all(math.isfinite(v) for v in val_losses)), (
        f"training diverged: {val_losses}")
    summary["train_best_val_loss"] = best_val

    # 5. export ONNX
    onnx_path = os.path.join(models, "best_model.onnx")
    _run([PY, "-m", "image_enhancement_deglaring_tpu.cli.export_onnx",
          "--model_path", os.path.join(models, "best_model"),
          "--output", onnx_path], env, 600, "export_onnx")
    assert os.path.getsize(onnx_path) > 1_000_000  # ~1.9 MB fp32 weights

    # 6. evaluate the exported artifact; L1 must match the train loop's
    # best val loss (JAX-vs-ONNX parity through a full export/import trip).
    # Both numbers are means over the same val split at the same size; the
    # tolerance covers eval-batch padding and the train loop's bf16 fwd.
    out = _run([PY, "-m", "image_enhancement_deglaring_tpu.cli.evaluate",
                "--model_path", onnx_path,
                "--data_dir", os.path.join(data, "train"),
                "--image_size", str(args.size), "--batch_size", "8"],
               env, 900, "evaluate_onnx")
    onnx_l1 = float(next(ln for ln in out.splitlines()
                         if ln.startswith("L1 Loss:")).split(":")[1])
    assert abs(onnx_l1 - best_val) < max(0.02, 0.25 * best_val), (
        f"ONNX L1 {onnx_l1} vs train best val {best_val}")
    summary["onnx_l1"] = onnx_l1

    # 7. promotion gate vs the shipped artifact (fresh held-out seed)
    out = _run([PY, os.path.join(REPO, "scripts", "crossval_artifact.py"),
                "--candidate", onnx_path, "--n", "8",
                "--size", str(args.size), "--batch_size", "4"],
               env, 900, "crossval_gate")
    gate = json.loads(out.strip().splitlines()[-1])
    assert gate["verdict"] in ("promote", "keep_incumbent"), gate
    summary["gate_verdict"] = gate["verdict"]

    # 8-11. serve -> drive API -> frontend proxy -> drain
    api_port, fe_port = _free_port(), _free_port()
    server = subprocess.Popen(
        [PY, "-m", "image_enhancement_deglaring_tpu.cli.serve",
         "--model_path", onnx_path, "--port", str(api_port),
         "--image_size", str(args.size),
         "--log_dir", os.path.join(W, "serve_logs")],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.STDOUT)
    frontend = None
    try:
        ping = _wait_http(f"http://127.0.0.1:{api_port}/ping", 600, server)
        assert json.loads(ping) == {"message": "pong"}, ping
        print("PASS serve_up")

        # 9. the reference's own API test script (ping + infer + stats)
        sample = next(os.path.join(data, "val", f)
                      for f in sorted(os.listdir(os.path.join(data, "val"))))
        # --timeout 300: on --tpu the FIRST background-thread dispatch
        # through the tunnel can take 30-230 s even after the engine's
        # startup warmup (CLAUDE.md gotcha; observed 120 s+ in the first
        # real-chip lifecycle run)
        _run([PY, "-m", "image_enhancement_deglaring_tpu.cli.test_api",
              "--test", "all", "--url", f"http://127.0.0.1:{api_port}",
              "--image", sample, "--timeout", "300"], env, 600,
             "test_api_all")

        # 10. frontend proxy round-trip (browser -> frontend /infer -> API)
        fe_env = dict(env)
        fe_env.update({"API_URL": f"http://127.0.0.1:{api_port}",
                       "PORT": str(fe_port), "HOST": "127.0.0.1"})
        frontend = subprocess.Popen(
            [PY, os.path.join(REPO, "frontend", "app.py")], env=fe_env,
            stdout=subprocess.DEVNULL, stderr=subprocess.STDOUT)
        _wait_http(f"http://127.0.0.1:{fe_port}/", 120, frontend)
        with open(sample, "rb") as f:
            body, ctype = _multipart("image", "sample.png", f.read())
        req = urllib.request.Request(
            f"http://127.0.0.1:{fe_port}/infer", data=body,
            headers={"Content-Type": ctype})
        with urllib.request.urlopen(req, timeout=300) as resp:
            rec = json.loads(resp.read())
        png = base64.b64decode(rec["image"])
        assert png[:8] == b"\x89PNG\r\n\x1a\n", png[:8]
        print("PASS frontend_proxy")

        # 11. drain: SIGTERM must exit 0 (the k8s preStop contract)
        server.send_signal(signal.SIGTERM)
        rc = server.wait(timeout=120)
        assert rc == 0, f"drain rc={rc}"
        print("PASS sigterm_drain")
    finally:
        for proc in (frontend, server):
            if proc is not None and proc.poll() is None:
                proc.kill()
                proc.wait(timeout=30)

    summary["wall_s"] = round(time.time() - t_all, 1)
    print("E2E_SUMMARY " + json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
