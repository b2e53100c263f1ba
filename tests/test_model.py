"""Model-level tests: parameter counts, shapes, ONNX weight import, and
end-to-end forward parity against a torch functional re-execution.

The torch side is built *functionally* from the imported weights (a loop of
F.conv2d / F.group_norm / F.silu / F.avg_pool2d / F.conv_transpose2d calls),
so we validate our network against torch's numerics for the exact production
weights without depending on the reference's code.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from image_enhancement_deglaring_tpu.models import (
    EnhancedUNet,
    LightweightUNet,
    OptimizedUNet,
    count_parameters,
    get_model_size_mb,
)
from image_enhancement_deglaring_tpu.modelio import lightweight_unet_params_from_onnx

REFERENCE_ONNX = "/root/reference/best_model.onnx"

# Eager per-op dispatch compiles each op separately (~seconds per op in this
# environment), so every init/apply in tests goes through jit.
_LW = LightweightUNet()
_lw_init = jax.jit(_LW.init)
_lw_apply = jax.jit(_LW.apply)


@pytest.fixture(scope="module")
def lw_params():
    return _lw_init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))["params"]


def test_lightweight_param_count_matches_published(lw_params):
    # Published: 486,409 trainable params (reference: README.md:10)
    assert count_parameters(lw_params) == 486409
    assert 1.8 < get_model_size_mb(lw_params) < 1.92


def test_lightweight_forward_shape(lw_params):
    y = _lw_apply({"params": lw_params}, jnp.zeros((2, 64, 64, 1)))
    assert y.shape == (2, 64, 64, 1)
    assert y.dtype == jnp.float32


def test_optimized_forward_shape():
    model = OptimizedUNet()
    x = jnp.zeros((1, 64, 64, 1))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    y = jax.jit(model.apply)({"params": params}, x)
    assert y.shape == (1, 64, 64, 1)


def test_enhanced_forward_shape_and_range():
    model = EnhancedUNet()
    x = jnp.zeros((1, 64, 64, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    y = jax.jit(model.apply)(variables, x)
    assert y.shape == (1, 64, 64, 1)
    # Sigmoid head: output in [0, 1] (reference: src/model.py:310-313)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_enhanced_batchnorm_momentum_matches_torch_default():
    """torch BatchNorm2d default momentum=0.1 means running = 0.9*old +
    0.1*batch; flax's default momentum (0.99) updates 10x slower — short
    sweep rungs would evaluate with badly stale stats vs the reference."""
    model = EnhancedUNet()
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    rngs = {"dropout": jax.random.PRNGKey(2)}
    _, updated = model.apply(variables, x, train=True,
                             mutable=["batch_stats"], rngs=rngs)
    bn = variables["batch_stats"]["enc1"]["bn1"]
    new = updated["batch_stats"]["enc1"]["bn1"]
    # reproduce the batch mean feeding enc1/bn1: it normalizes conv1's
    # output, so recompute via a stats-only forward is overkill — instead
    # solve for the implied momentum from the update of the running mean,
    # which must be 0.9 regardless of the batch statistics' values
    old_m, new_m = np.asarray(bn["mean"]), np.asarray(new["mean"])
    # new = m*old + (1-m)*batch with old=0 (init) -> batch = new/(1-m);
    # run a SECOND update on the same inputs: new2 = m*new + (1-m)*batch
    _, updated2 = model.apply(
        {"params": variables["params"], "batch_stats": updated["batch_stats"]},
        x, train=True, mutable=["batch_stats"], rngs=rngs)
    new2_m = np.asarray(updated2["batch_stats"]["enc1"]["bn1"]["mean"])
    assert np.allclose(old_m, 0.0)
    batch_mean = new_m / 0.1  # if momentum is 0.9 as required
    np.testing.assert_allclose(new2_m, 0.9 * new_m + 0.1 * batch_mean,
                               rtol=1e-4, atol=1e-6)


@pytest.fixture(scope="module")
def onnx_params():
    if not os.path.exists(REFERENCE_ONNX):
        pytest.skip("reference best_model.onnx not available")
    return lightweight_unet_params_from_onnx(REFERENCE_ONNX)


def test_onnx_import_shapes(onnx_params):
    assert onnx_params["enc1"]["conv1"].shape == (3, 3, 1, 8)
    assert onnx_params["bottleneck"]["conv1"].shape == (3, 3, 64, 128)
    assert onnx_params["upconv4"]["weight"].shape == (128, 64, 2, 2)
    assert onnx_params["output_conv_weight"].shape == (1, 1, 8, 1)
    assert count_parameters(onnx_params) == 486409
    # GN params must have been recovered from the anonymous initializers
    assert onnx_params["enc1"]["gn1_scale"].shape == (8,)
    assert not np.allclose(onnx_params["enc1"]["gn1_scale"], 1.0)


from image_enhancement_deglaring_tpu.modelio.torch_reference import (  # noqa: E402
    torch_forward_lightweight as _torch_forward_lightweight,
)


def test_forward_parity_with_torch_on_production_weights(onnx_params, rng):
    pytest.importorskip("torch")
    x = rng.random((1, 64, 64, 1), dtype=np.float32)
    params = jax.tree_util.tree_map(jnp.asarray, onnx_params)
    got = np.asarray(_lw_apply({"params": params}, x))
    want = _torch_forward_lightweight(onnx_params, x)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_forward_is_deterministic(onnx_params, rng):
    params = jax.tree_util.tree_map(jnp.asarray, onnx_params)
    x = jnp.asarray(rng.random((2, 64, 64, 1), dtype=np.float32))
    y1 = _lw_apply({"params": params}, x)
    y2 = _lw_apply({"params": params}, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_remat_model_identical_outputs_and_grads(onnx_params, rng):
    """remat=True must change only the backward-pass schedule, not numerics."""
    import optax

    from image_enhancement_deglaring_tpu.ops.metrics import l1_loss

    params = jax.tree_util.tree_map(jnp.asarray, onnx_params)
    x = jnp.asarray(rng.random((1, 64, 64, 1), dtype=np.float32))
    y = jnp.asarray(rng.random((1, 64, 64, 1), dtype=np.float32))
    plain = LightweightUNet()
    rematted = LightweightUNet(remat=True)
    out_a = jax.jit(plain.apply)({"params": params}, x)
    out_b = jax.jit(rematted.apply)({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)

    def loss(model, p):
        return l1_loss(model.apply({"params": p}, x), y)

    ga = jax.jit(jax.grad(lambda p: loss(plain, p)))(params)
    gb = jax.jit(jax.grad(lambda p: loss(rematted, p)))(params)
    norm_a = float(optax.global_norm(ga))
    norm_b = float(optax.global_norm(gb))
    np.testing.assert_allclose(norm_a, norm_b, rtol=1e-5)


def test_golden_values_on_production_weights(onnx_params):
    """Cross-round regression pin: forward of the reference's production
    weights on a fixed structured input must reproduce these golden
    statistics (computed on the f32 CPU path at round 1)."""
    yy, xx = np.mgrid[0:64, 0:64]
    x = ((yy / 63.0 + ((xx // 8 + yy // 8) % 2) * 0.3) / 1.3).astype(np.float32)
    x = x[None, ..., None]
    params = jax.tree_util.tree_map(jnp.asarray, onnx_params)
    out = np.asarray(_lw_apply({"params": params}, x))
    np.testing.assert_allclose(out.mean(), 0.51017225, rtol=1e-4)
    np.testing.assert_allclose(out.std(), 0.20897736, rtol=1e-4)
    np.testing.assert_allclose(
        out[0, :2, :2, 0].ravel(),
        [0.25717306, 0.24841405, 0.16935296, 0.16444781],
        rtol=5e-4,
    )
