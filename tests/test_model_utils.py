"""Model utilities: pruning and int8 quantization (capability parity with
reference: src/model.py:399-486)."""

import numpy as np
import jax
import jax.numpy as jnp

from image_enhancement_deglaring_tpu.models import (
    LightweightUNet,
    prune_params,
    quantize_params_int8,
)
from image_enhancement_deglaring_tpu.models.model_utils import (
    count_parameters,
    dequantize_params_int8,
    get_model_size_mb,
)


def _params():
    model = LightweightUNet()
    return jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]


def test_prune_zeroes_requested_fraction():
    params = _params()
    pruned = prune_params(params, amount=0.3)
    assert count_parameters(pruned) == count_parameters(params)
    w = np.asarray(pruned["bottleneck"]["conv1"])
    frac_zero = (w == 0).mean()
    assert 0.28 <= frac_zero <= 0.32
    # norm scales/biases untouched
    np.testing.assert_array_equal(
        np.asarray(pruned["enc1"]["gn1_scale"]), np.asarray(params["enc1"]["gn1_scale"])
    )
    # surviving weights unchanged
    orig = np.asarray(params["bottleneck"]["conv1"])
    mask = w != 0
    np.testing.assert_array_equal(w[mask], orig[mask])


def test_quantize_roundtrip_error_small():
    params = _params()
    q, scales = quantize_params_int8(params)
    deq = dequantize_params_int8(q, scales)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(deq)):
        a, b = np.asarray(a), np.asarray(b)
        if a.ndim >= 2:
            # symmetric int8: max error is half a quantization step
            step = np.abs(a).max() / 127.0
            assert np.abs(a - b).max() <= step * 0.51
        else:
            np.testing.assert_array_equal(a, b)
    # int8 storage shrinks weights ~4x
    assert get_model_size_mb(q) < 0.3 * get_model_size_mb(params) + 0.05


def test_quantized_model_output_close():
    params = _params()
    model = LightweightUNet()
    x = jnp.asarray(np.random.default_rng(0).random((1, 32, 32, 1), dtype=np.float32))
    fwd = jax.jit(model.apply)
    y = fwd({"params": params}, x)
    q, scales = quantize_params_int8(params)
    y_q = fwd({"params": dequantize_params_int8(q, scales)}, x)
    assert float(jnp.max(jnp.abs(y - y_q))) < 0.05


def test_per_channel_quant_upconv_axis():
    """ConvTranspose weights are (Cin, Cout, 2, 2): per-channel scales must
    be per OUTPUT channel (axis 1), not per kw column."""
    import jax
    import jax.numpy as jnp
    from image_enhancement_deglaring_tpu.models import LightweightUNet
    from image_enhancement_deglaring_tpu.models.model_utils import (
        dequantize_params_int8,
        quantize_params_int8,
    )

    params = jax.jit(LightweightUNet().init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
    q, s = quantize_params_int8(params, per_channel=True)
    up_w = params["upconv4"]["weight"]          # (128, 64, 2, 2)
    up_s = s["upconv4"]["weight"]
    assert up_w.shape == (128, 64, 2, 2)
    assert up_s.shape == (1, 64, 1, 1), f"wrong channel axis: {up_s.shape}"
    # HWIO conv kernels stay per-output-channel on the last axis
    assert s["enc1"]["conv1"].shape == (1, 1, 1, 8)
    # round-trip error bounded by scale/2 per output channel
    deq = dequantize_params_int8(q, s)
    err = jnp.abs(deq["upconv4"]["weight"] - up_w)
    assert float(jnp.max(err - up_s * 0.5)) <= 1e-6


def test_per_channel_quant_optimized_upconv_is_hwio():
    """OptimizedUNet's upconvN blocks hold ordinary HWIO (3,3,cin,f) conv
    kernels named 'conv' — per-channel scales must stay on the LAST axis;
    keying on the module name alone pooled every output channel into 3
    kernel-width scales."""
    import jax
    import jax.numpy as jnp
    from image_enhancement_deglaring_tpu.models import OptimizedUNet
    from image_enhancement_deglaring_tpu.models.model_utils import (
        quantize_params_int8,
    )

    params = jax.jit(OptimizedUNet().init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))["params"]
    _, s = quantize_params_int8(params, per_channel=True)
    w = params["upconv4"]["conv"]
    f = w.shape[-1]
    assert w.shape[:2] == (3, 3)
    assert s["upconv4"]["conv"].shape == (1, 1, 1, f), s["upconv4"]["conv"].shape


def test_prune_exact_count_with_ties():
    """Exactly k weights are zeroed even when magnitudes tie at the k-th
    value (torch l1_unstructured semantics) — a <=threshold rule would
    zero every tie, e.g. after int8 dequantization grids the weights."""
    import jax.numpy as jnp
    from image_enhancement_deglaring_tpu.models.model_utils import (
        prune_params,
    )

    w = jnp.asarray([[0.1, 0.1, 0.1, 0.1], [0.5, 0.6, 0.7, 0.8]])
    pruned = prune_params({"w": w}, amount=0.25)["w"]  # k = 2, 4 ties at 0.1
    assert int((pruned == 0).sum()) == 2
    assert float(jnp.abs(pruned[1]).min()) > 0  # large weights untouched
