"""int8 activation quantization (ops.quant + LightweightUNet act_scales).

Measured close-out on v5e (docs/PERF.md): int8 activation storage is
SLOWER end-to-end than XLA's bf16 schedule at every tested site subset, so
the feature ships as a validated model-level opt-in, not a serving
default. These tests pin the semantics either way.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_enhancement_deglaring_tpu.models import (
    LightweightUNet,
    calibrate_act_scales,
)
from image_enhancement_deglaring_tpu.ops.quant import (
    HOT_SITES_512,
    fake_quant_act_int8,
    subset_act_scales,
)

SIZE = 32


@pytest.fixture(scope="module")
def model_and_params():
    model = LightweightUNet()
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, SIZE, SIZE, 1)))["params"]
    return model, params


def _inputs(n, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).random((n, SIZE, SIZE, 1)).astype(np.float32))


def test_fake_quant_error_bound(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    scale = jnp.max(jnp.abs(x), axis=(0, 1, 2)) / 127.0
    y = fake_quant_act_int8(x, scale)
    # symmetric rounding: error <= scale/2 per channel
    err = np.abs(np.asarray(y - x))
    bound = np.asarray(scale)[None, None, None, :] * 0.5 + 1e-7
    assert (err <= bound).all()


def test_fake_quant_clips_beyond_calibrated_range(rng):
    x = jnp.asarray(np.array([[[[10.0, -10.0]]]], np.float32))
    scale = jnp.asarray([0.01, 0.01], jnp.float32)  # max representable 1.27
    y = np.asarray(fake_quant_act_int8(x, scale))
    np.testing.assert_allclose(y, [[[[1.27, -1.27]]]], rtol=1e-5)


def test_calibration_site_structure(model_and_params):
    model, params = model_and_params
    scales = calibrate_act_scales(model, params, [_inputs(2)])
    # top-level sites: 5 blocks + 4 dec blocks (dicts), 4 pools + 4 upconvs
    blocks = {"enc1", "enc2", "enc3", "enc4", "bottleneck",
              "dec4", "dec3", "dec2", "dec1"}
    singles = {"p1", "p2", "p3", "p4", "u4", "u3", "u2", "u1"}
    assert set(scales.keys()) == blocks | singles
    for b in blocks:
        assert set(scales[b].keys()) == {"a1", "a2"}
    # per-channel scale shapes follow the feature ladder
    assert scales["enc1"]["a1"].shape == (8,)
    assert scales["bottleneck"]["a2"].shape == (128,)
    assert scales["u1"].shape == (8,)
    for leaf in jax.tree_util.tree_leaves(scales):
        assert (leaf > 0).all()


def test_calib_mode_output_unchanged(model_and_params):
    model, params = model_and_params
    x = _inputs(1)
    ref = model.apply({"params": params}, x)
    out, v = model.apply({"params": params}, x, act_scales="calib",
                         mutable=["act_stats"])
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert "act_stats" in v


def test_quantized_forward_fidelity(model_and_params):
    """All 26 sites quantized: output stays close to the exact forward
    (GroupNorm before every site keeps ranges tame)."""
    model, params = model_and_params
    scales = calibrate_act_scales(model, params, [_inputs(2, seed=1)])
    x = _inputs(2, seed=2)
    ref = np.asarray(model.apply({"params": params}, x))
    got = np.asarray(model.apply({"params": params}, x, act_scales=scales))
    mse = float(np.mean((ref - got) ** 2))
    dyn = float(np.mean(ref ** 2)) + 1e-12
    snr_db = 10 * np.log10(dyn / max(mse, 1e-12))
    # random-init weights at 32^2 are the worst case (near-zero outputs);
    # the production weights measure ~38 dB PSNR vs f32 (docs/PERF.md)
    assert snr_db > 20.0, f"quantized forward SNR too low: {snr_db:.1f} dB"


def test_subset_sites_run_unquantized(model_and_params):
    """Sites excluded from the scales dict are exact: quantizing only enc1
    gives an output strictly closer to the reference than quantizing all."""
    model, params = model_and_params
    scales = calibrate_act_scales(model, params, [_inputs(2, seed=1)])
    x = _inputs(2, seed=3)
    ref = np.asarray(model.apply({"params": params}, x))
    all_q = np.asarray(model.apply({"params": params}, x, act_scales=scales))
    one_q = np.asarray(model.apply(
        {"params": params}, x, act_scales=subset_act_scales(scales, ("enc1",))))
    assert np.mean((ref - one_q) ** 2) < np.mean((ref - all_q) ** 2)

    hot = subset_act_scales(scales, HOT_SITES_512)
    assert set(hot.keys()) == set(HOT_SITES_512) & set(scales.keys())


def test_training_path_unaffected(model_and_params):
    """Default act_scales=None is byte-identical to the pre-feature model."""
    model, params = model_and_params
    x = _inputs(1, seed=4)
    a = np.asarray(model.apply({"params": params}, x))
    b = np.asarray(model.apply({"params": params}, x, act_scales=None))
    np.testing.assert_array_equal(a, b)
