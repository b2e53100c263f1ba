"""Training-step roofline decomposition (the serving-step methodology from
docs/PERF.md applied to the compiled train step).

Measures ms/step at several batch sizes (data generated ON DEVICE — the
relay moves ~10 MB/s, so host-fed batches would measure the tunnel, not
the step), pulls XLA's own cost_analysis() from the compiled program, and
decomposes throughput into:
  - compute floor  (FLOPs / peak MXU bf16)
  - bandwidth floor (bytes accessed / peak HBM)
  - fixed per-dispatch component (linear fit over batch sizes)

Run on the real chip: `python scripts/train_roofline.py`.
"""

import os
import sys
import time

# runnable from anywhere: scripts/ is sys.path[0], the package lives one up
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from image_enhancement_deglaring_tpu.models import LightweightUNet
from image_enhancement_deglaring_tpu.train.loop import TrainState, make_train_step

SIZE = 512
PEAK_BF16_TFLOPS = 197.0   # v5e MXU
PEAK_HBM_GBS = 819.0       # v5e HBM

LR = 0.002362532125818593
WD = 6.753784966611083e-05


def build(batch, remat=False):
    model = LightweightUNet(dtype=jnp.bfloat16, remat=remat) \
        if remat else LightweightUNet(dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, SIZE, SIZE, 1)))["params"]
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(LR, weight_decay=WD))
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.asarray(0), rng=jax.random.PRNGKey(0))
    step = make_train_step(model.apply, tx)

    @jax.jit
    def gen(key):
        y = jax.random.uniform(key, (batch, SIZE, SIZE, 1), jnp.float32)
        x = jnp.clip(y + 0.1 * jax.random.normal(key, y.shape), 0, 1)
        return x, y

    x, y = gen(jax.random.PRNGKey(1))
    jax.block_until_ready((x, y))
    return state, step, x, y


def timed_step(state, step, x, y, iters=8):
    state, loss = step(state, x, y)          # compile + warm
    float(loss)                              # barrier (scalar fetch)
    state, loss = step(state, x, y)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, x, y)
    float(loss)                              # one barrier at the end
    dt = (time.perf_counter() - t0) / iters
    return state, dt


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,32,128",
                    help="comma list; suffix r = remat (e.g. 256r)")
    args = ap.parse_args()
    configs = []
    for tok in args.batches.split(","):
        remat = tok.endswith("r")
        configs.append((int(tok.rstrip("r")), remat))

    rows = []
    for batch, remat in configs:
        state, step, x, y = build(batch, remat=remat)
        t0 = time.perf_counter()
        # cost numbers from an AOT lower+compile (NOT called — calling the
        # AOT executable wedges through the axon tunnel); timing goes
        # through the normal jit dispatch path below
        c = step.lower(state, x, y).compile().cost_analysis()
        print(f"batch {batch}: compiled in {time.perf_counter()-t0:.0f}s",
              flush=True)
        if isinstance(c, list):
            c = c[0]
        flops = float(c.get("flops", 0.0))
        bytes_acc = float(c.get("bytes accessed", 0.0))
        state, dt = timed_step(state, step, x, y)
        rows.append((batch, remat, dt, flops, bytes_acc))
        comp_floor = flops / (PEAK_BF16_TFLOPS * 1e12)
        bw_floor = bytes_acc / (PEAK_HBM_GBS * 1e9)
        print(f"batch {batch}{' (remat)' if remat else ''}: "
              f"{dt*1e3:7.1f} ms/step  {batch/dt:7.0f} img/s | "
              f"GFLOP {flops/1e9:7.1f}  MB {bytes_acc/1e6:7.0f} | "
              f"floors: compute {comp_floor*1e3:6.1f} ms, "
              f"bandwidth {bw_floor*1e3:6.1f} ms", flush=True)

    # fixed-vs-marginal decomposition over the non-remat points
    bs = np.array([r[0] for r in rows if not r[1]], float)
    ts = np.array([r[2] for r in rows if not r[1]], float)
    if len(bs) >= 2:
        slope, fixed = np.polyfit(bs, ts, 1)
        print(f"\nlinear fit over b={sorted(bs.astype(int))}: "
              f"fixed {fixed*1e3:.1f} ms/step + "
              f"{slope*1e3:.3f} ms/img marginal", flush=True)

    # what is the fixed part? an (almost) empty program's dispatch round
    # trip through the same path:
    @jax.jit
    def trivial(a):
        return a + 1.0

    a = jnp.zeros(())
    float(trivial(a))
    t0 = time.perf_counter()
    for _ in range(16):
        a = trivial(a)
    float(a)
    triv = (time.perf_counter() - t0) / 16
    print(f"trivial jitted dispatch (chained, amortized): {triv*1e3:.1f} ms")

    # per-dispatch un-chained round trip (each dispatch waits for fetch)
    t0 = time.perf_counter()
    for _ in range(8):
        float(trivial(jnp.zeros(())))
    rt = (time.perf_counter() - t0) / 8
    print(f"trivial dispatch+fetch round trip: {rt*1e3:.1f} ms")


if __name__ == "__main__":
    main()
