"""Measure per-step vs resident (one-dispatch) sweep epochs on hardware.

Times one vmapped trial group (8 trials, batch 16, full LightweightUNet)
over a synthetic dataset: the host-loader per-step path dispatches every
batch; the resident path ships the cache to HBM once and scans the whole
epoch in one compiled program. Prints JSON with both epoch times.
"""

import json
import os
import sys
import time

import numpy as np

# runnable from any checkout: scripts/ is sys.path[0], the package one up
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from image_enhancement_deglaring_tpu.models import LightweightUNet  # noqa: E402
from image_enhancement_deglaring_tpu.ops.augment_device import (  # noqa: E402
    device_augment_batch,
)
from image_enhancement_deglaring_tpu.parallel.sweep import (  # noqa: E402
    Trial,
    VmappedTrialGroup,
)
from image_enhancement_deglaring_tpu.train.resident import (  # noqa: E402
    batch_val_cache,
    cache_on_device,
)
from tests.loaders import ArrayLoader  # noqa: E402


def main(n=256, size=128, bs=16, k=8, epochs=3, dtype="float32"):
    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    make_model = lambda: LightweightUNet(dtype=dt)
    rng = np.random.default_rng(0)
    y = rng.random((n, size, size, 1)).astype(np.float32)
    x = np.clip(y + rng.normal(0, 0.1, y.shape), 0, 1).astype(np.float32)
    vx, vy = x[:64], y[:64]

    def trials():
        return [Trial(trial_id=i, batch_size=bs, lr=1e-3, wd=1e-5)
                for i in range(k)]

    loader = ArrayLoader(x, y, bs)
    vloader = ArrayLoader(vx, vy, bs)

    # ---- per-step path (same device augmentation as the resident side,
    # so the comparison isolates dispatch/transfer, not augment FLOPs)
    g = VmappedTrialGroup(make_model(), trials(), seed=0,
                          augment_fn=device_augment_batch)
    g.train_epoch(loader, 0)  # warm up compile
    g.val_epoch(vloader)
    t0 = time.time()
    for e in range(epochs):
        g.train_epoch(loader, e + 1)
        g.val_epoch(vloader)
    stepwise_s = (time.time() - t0) / epochs

    # ---- resident path
    g2 = VmappedTrialGroup(make_model(), trials(), seed=0,
                           augment_fn=device_augment_batch)
    data = cache_on_device(loader)
    vdata = cache_on_device(vloader)
    vb = batch_val_cache(vdata, bs)
    g2.train_epoch_resident(data, 0)  # warm up compile
    g2.val_epoch_resident(vb, vdata.n)
    t0 = time.time()
    for e in range(epochs):
        g2.train_epoch_resident(data, e + 1)
        g2.val_epoch_resident(vb, vdata.n)
    resident_s = (time.time() - t0) / epochs

    print(json.dumps({
        "device": str(jax.devices()[0]),
        "n": n, "size": size, "batch": bs, "trials": k,
        "steps_per_epoch": n // bs, "dtype": dtype,
        "stepwise_epoch_s": round(stepwise_s, 4),
        "resident_epoch_s": round(resident_s, 4),
        "speedup": round(stepwise_s / resident_s, 2),
    }))


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    a = p.parse_args()
    main(n=a.n, size=a.size, bs=a.bs, k=a.k, epochs=a.epochs,
         dtype=a.dtype)
