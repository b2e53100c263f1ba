"""Headline benchmark: /infer serving throughput on one TPU chip.

Measures the serving engine's device path (uint8 in -> normalize -> bf16
U-Net forward -> clip -> uint8 out) at 512x512 on the production weights,
at the engine's steady-state batch size, and compares against the
reference serving baseline: single-image CPU forwards, which is what the
reference's ONNX-Runtime CPU ExecutionProvider does per /infer request
(reference: api/app.py:84,170-171). onnxruntime is not available in this
environment, so the CPU baseline is the same computation via torch CPU —
the ONNX graph is a direct export of that torch model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
"""

import json
import os
import sys
import time

import numpy as np

BATCH = 256  # throughput-serving batch; amortizes per-dispatch overhead
             # (measured: 3,411 img/s @128 vs 3,503 @256 vs 3,588 @512 —
             # same 0.27 ms/img marginal, bigger batches amortize the fixed
             # dispatch cost; 256 balances that against HBM headroom)
SIZE = 512
WARMUP_ITERS = 2
BENCH_ITERS = 10
# the 1-CPU cgroup makes single-forward times jittery (vs_baseline moved
# ~15% between rounds on an identical path; still ~8% at 16 samples);
# median over enough forwards stabilizes the denominator to a few percent
BASELINE_IMAGES = 48
# The headline ratio uses a FROZEN denominator so vs_baseline is
# reproducible run-to-run: even the median-of-48 live measurement drifted
# 5.11 -> 6.34 -> 5.88 img/s across rounds (1-CPU-cgroup scheduling noise)
# while tpu_img_s held within +/-0.5%. 5.88 is the round-3 median-of-48
# reading (docs/PERF.md); the live CPU number is still measured and
# emitted as cpu_img_s_live for auditability.
FROZEN_CPU_IMG_S = 5.88


class _Timeout(Exception):
    pass


def _tpu_throughput(params, quantize: str | None = None) -> float:
    import jax
    import jax.numpy as jnp

    from image_enhancement_deglaring_tpu.models import LightweightUNet
    from image_enhancement_deglaring_tpu.serve.engine import InferenceEngine

    model = LightweightUNet(dtype=jnp.bfloat16)
    engine = InferenceEngine(
        model.apply, params, image_size=SIZE, max_batch_size=BATCH,
        compute_dtype=jnp.bfloat16, warmup=False, quantize=quantize,
    )
    # generate the 64 MB input batch ON DEVICE: shipping it from the host
    # costs ~6-7s of the watchdog budget through the ~10 MB/s relay
    @jax.jit
    def make_batch(key):
        u = jax.random.uniform(key, (BATCH, SIZE, SIZE, 1)) * 255.0
        return u.astype(jnp.uint8)

    x = make_batch(jax.random.PRNGKey(0))
    step = engine._step

    # On some backends block_until_ready returns before execution completes;
    # fetching a device-reduced scalar is the reliable execution barrier.
    @jax.jit
    def checksum(y):
        return jnp.sum(y.astype(jnp.int32))

    for _ in range(WARMUP_ITERS):
        float(checksum(step(engine._params, x)))
    t0 = time.perf_counter()
    for _ in range(BENCH_ITERS):
        out = step(engine._params, x)
    float(checksum(out))
    dt = time.perf_counter() - t0
    return BATCH * BENCH_ITERS / dt


def _cpu_baseline_throughput(params) -> float | None:
    """Single-image torch-CPU forwards (the reference's serving pattern)."""
    try:
        from image_enhancement_deglaring_tpu.modelio.torch_reference import (
            torch_forward_lightweight,
        )
    except Exception:
        return None
    try:
        # let the TPU tunnel relay (same 1-CPU cgroup) go quiet before
        # timing CPU forwards — it keeps burning CPU briefly after the
        # device phase and skews the denominator run-to-run
        time.sleep(3.0)
        rng = np.random.default_rng(0)
        x = rng.random((1, SIZE, SIZE, 1)).astype(np.float32)
        torch_forward_lightweight(params, x)  # warmup
        # median of per-image times: robust to the 1-CPU cgroup's
        # scheduling jitter, which moved the mean ~15% between runs
        times = []
        for _ in range(BASELINE_IMAGES):
            t0 = time.perf_counter()
            torch_forward_lightweight(params, x)
            times.append(time.perf_counter() - t0)
        return 1.0 / float(np.median(times))
    except _Timeout:
        raise  # the watchdog alarm must reach main's handler
    except Exception:
        return None


def _emit(value, vs_baseline, note=None, metric="infer_throughput_512x512_bf16",
          cpu_img_s_live=None):
    rec = {
        "metric": metric,
        "value": round(value, 2) if value else value,
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        # raw numbers for both sides so the ratio's provenance is auditable:
        # cpu_img_s is the frozen denominator vs_baseline divides by,
        # cpu_img_s_live is this run's fresh median-of-48 measurement
        "tpu_img_s": round(value, 2) if value else value,
        "cpu_img_s": FROZEN_CPU_IMG_S,
        "cpu_img_s_live": round(cpu_img_s_live, 2) if cpu_img_s_live else None,
    }
    if note:
        rec["note"] = note
    print(json.dumps(rec))


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="bf16", choices=["bf16", "int8"],
                    help="bf16 = flagship serving path; int8 = quantized-"
                         "weight engine (AQT-style per-channel PTQ)")
    args = ap.parse_args()
    from image_enhancement_deglaring_tpu.modelio import (
        lightweight_unet_params_from_onnx,
    )

    onnx_path = "/root/reference/best_model.onnx"
    if os.path.exists(onnx_path):
        params = lightweight_unet_params_from_onnx(onnx_path)
    else:
        import jax
        import jax.numpy as jnp

        from image_enhancement_deglaring_tpu.models import LightweightUNet

        params = jax.jit(LightweightUNet().init)(
            jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 1))
        )["params"]

    # The remote-TPU tunnel can wedge; a hang here must still produce the
    # one JSON line the harness records, so measure under a watchdog.
    import signal

    def _alarm(_sig, _frm):
        raise _Timeout()

    quantize = "int8" if args.mode == "int8" else None
    metric = ("infer_throughput_512x512_int8w" if args.mode == "int8"
              else "infer_throughput_512x512_bf16")
    signal.signal(signal.SIGALRM, _alarm)
    # the retry attempt gets a tighter budget (the server-side compile
    # cache is warm by then) so worst-case wall stays near the old
    # single-attempt bound instead of doubling
    signal.alarm(300 if os.environ.get("BENCH_RETRY") == "1" else 420)
    try:
        tpu_ips = _tpu_throughput(params, quantize=quantize)
        signal.alarm(60)
        try:
            cpu_ips = _cpu_baseline_throughput(params)
        except _Timeout:
            cpu_ips = None
        signal.alarm(0)
    except _Timeout:
        # A wedged tunnel session usually clears with a fresh process (the
        # stall is session state, not the chip): re-exec ourselves ONCE —
        # execv releases the chip and nothing has been printed yet, so the
        # retry still emits exactly one JSON line.
        if os.environ.get("BENCH_RETRY") != "1":
            os.environ["BENCH_RETRY"] = "1"
            sys.stdout.flush()
            sys.stderr.flush()
            os.execv(sys.executable, [sys.executable] + sys.argv)
        _emit(None, None, note="device benchmark timed out (tunnel stall, "
              "after one fresh-process retry)", metric=metric)
        return 1
    _emit(tpu_ips, tpu_ips / FROZEN_CPU_IMG_S, metric=metric,
          cpu_img_s_live=cpu_ips,
          note="baseline = single-image torch-CPU forwards (the reference's "
               "ORT-CPU serving pattern; onnxruntime wheel unavailable "
               "here), frozen at the round-3 median-of-"
               f"{BASELINE_IMAGES} reading; cpu_img_s_live is this run's "
               "fresh measurement")
    return 0


if __name__ == "__main__":
    sys.exit(main())
