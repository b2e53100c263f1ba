"""A/B the whole-slice dec1+output Mosaic kernel against XLA on TPU.

Three numbers make the close-out:
  1. XLA slice time (the production path, NHWC)
  2. Pallas kernel time with NCHW inputs handed to it (kernel best case —
     transposes NOT counted)
  3. the NHWC->NCHW input transposes alone (what the model would really
     pay to feed the kernel)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from image_enhancement_deglaring_tpu.ops.pallas_dec1 import (
    dec1_output_xla,
    fused_dec1_output,
)

B, C, H, W = 128, 8, 512, 512
DTYPE = jnp.bfloat16


def barrier(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timed(fn, *args, iters=8):
    out = fn(*args)
    barrier(out)
    out = fn(*args)
    barrier(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    barrier(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    rng = np.random.default_rng(0)
    f32 = lambda *sh, s=1.0: (rng.standard_normal(sh) * s).astype(np.float32)

    @jax.jit
    def gen(key):
        # DISTINCT keys: identical up/skip tensors would make the parity
        # check blind to operand swaps inside the fused kernel
        ku, ks = jax.random.split(key)
        xu = jax.random.uniform(ku, (B, H, W, C), jnp.float32) * 2 - 1
        xs = jax.random.uniform(ks, (B, H, W, C), jnp.float32) * 2 - 1
        return xu.astype(DTYPE), xs.astype(DTYPE)

    xu, xs = gen(jax.random.PRNGKey(1))
    jax.block_until_ready((xu, xs))
    wa, wb, w2 = f32(3, 3, C, C, s=.2), f32(3, 3, C, C, s=.2), f32(3, 3, C, C, s=.2)
    g1s, g1b, g2s, g2b = f32(C), f32(C), f32(C), f32(C)
    wo, bo = f32(1, 1, C, 1, s=.3), f32(1)

    xla_fn = jax.jit(lambda a, b: dec1_output_xla(
        a, b, wa, wb, w2, g1s, g1b, g2s, g2b, wo, bo))
    t_xla, want = timed(xla_fn, xu, xs)
    print(f"XLA slice (NHWC, b{B} bf16):      {t_xla*1e3:7.2f} ms  "
          f"({t_xla/B*1e6:6.1f} us/img)", flush=True)

    tr = jax.jit(lambda a, b: (jnp.transpose(a, (0, 3, 1, 2)),
                               jnp.transpose(b, (0, 3, 1, 2))))
    t_tr, _ = timed(lambda a, b: tr(a, b)[0], xu, xs)
    xu_c, xs_c = tr(xu, xs)
    jax.block_until_ready((xu_c, xs_c))
    print(f"input transposes NHWC->NCHW:      {t_tr*1e3:7.2f} ms", flush=True)

    pallas_fn = jax.jit(lambda a, b: fused_dec1_output(
        a, b, wa, wb, w2, g1s, g1b, g2s, g2b, wo, bo, tile_h=64))
    t0 = time.perf_counter()
    got = pallas_fn(xu_c, xs_c)
    barrier(got)
    print(f"pallas compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    t_pal, got = timed(pallas_fn, xu_c, xs_c)
    print(f"Pallas fused slice (NCHW inputs): {t_pal*1e3:7.2f} ms  "
          f"({t_pal/B*1e6:6.1f} us/img)", flush=True)

    err = np.abs(np.asarray(got, np.float32)[..., None]
                 - np.asarray(want, np.float32))
    print(f"max abs err vs XLA (bf16): {err.max():.4f}  mean {err.mean():.5f}")
    print(f"\nkernel vs XLA: {t_xla/t_pal:.2f}x  "
          f"(incl. transposes: {t_xla/(t_pal+t_tr):.2f}x)")


if __name__ == "__main__":
    main()
