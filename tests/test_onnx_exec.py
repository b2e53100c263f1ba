"""ONNX export semantics: the numpy executor verifies that the exported
graphs compute the same function as the Flax models — the role ONNX
Runtime plays for the reference (reference: evaluate.py:73-140)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_enhancement_deglaring_tpu.modelio import (
    enhanced_unet_params_from_onnx,
    lightweight_unet_params_from_onnx,
    optimized_unet_params_from_onnx,
    run_onnx,
)
from image_enhancement_deglaring_tpu.modelio.onnx_writer import (
    export_enhanced_unet,
    export_lightweight_unet,
    export_optimized_unet,
)
from image_enhancement_deglaring_tpu.models import (
    EnhancedUNet,
    LightweightUNet,
    OptimizedUNet,
)


def _nchw(x_nhwc):
    return np.ascontiguousarray(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def _init(model, size, seed=0):
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(seed), jnp.zeros((1, size, size, 1))
    )
    return jax.tree_util.tree_map(np.asarray, variables)


def test_exported_lightweight_matches_flax(tmp_path):
    model = LightweightUNet()
    variables = _init(model, 32)
    x = np.random.default_rng(0).random((2, 32, 32, 1), np.float32)

    path = export_lightweight_unet(variables["params"], str(tmp_path / "m.onnx"))
    got = run_onnx(path, {"input": _nchw(x)})["output"]
    want = np.asarray(model.apply(variables, x))
    np.testing.assert_allclose(_nhwc(got), want, atol=2e-4, rtol=1e-3)


def test_exported_optimized_matches_flax(tmp_path):
    model = OptimizedUNet()
    variables = _init(model, 32)
    x = np.random.default_rng(1).random((2, 32, 32, 1), np.float32)

    path = export_optimized_unet(variables["params"], str(tmp_path / "m.onnx"))
    got = run_onnx(path, {"input": _nchw(x)})["output"]
    want = np.asarray(model.apply(variables, x))
    np.testing.assert_allclose(_nhwc(got), want, atol=2e-4, rtol=1e-3)


def test_exported_enhanced_matches_flax(tmp_path):
    model = EnhancedUNet()
    variables = _init(model, 64)
    # non-trivial running stats so the BatchNormalization wiring is
    # actually exercised (fresh init is mean=0/var=1 — a near no-op)
    rng = np.random.default_rng(2)
    stats = jax.tree_util.tree_map(
        lambda a: (rng.standard_normal(a.shape).astype(np.float32) * 0.1
                   + (1.0 if a is not None else 0.0)) ** 2,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    x = rng.random((1, 64, 64, 1), np.float32)

    path = export_enhanced_unet(
        variables["params"], variables["batch_stats"], str(tmp_path / "m.onnx")
    )
    got = run_onnx(path, {"input": _nchw(x)})["output"]
    want = np.asarray(model.apply(variables, x, train=False))
    np.testing.assert_allclose(_nhwc(got), want, atol=2e-4, rtol=1e-3)


def test_optimized_export_import_roundtrip(tmp_path):
    model = OptimizedUNet()
    params = _init(model, 32)["params"]
    path = export_optimized_unet(params, str(tmp_path / "m.onnx"))
    back = optimized_unet_params_from_onnx(path)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_enhanced_export_import_roundtrip(tmp_path):
    model = EnhancedUNet()
    variables = _init(model, 64)
    path = export_enhanced_unet(
        variables["params"], variables["batch_stats"], str(tmp_path / "m.onnx")
    )
    back_p, back_s = enhanced_unet_params_from_onnx(path)
    for a, b in zip(
        jax.tree_util.tree_leaves((variables["params"], variables["batch_stats"])),
        jax.tree_util.tree_leaves((back_p, back_s)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_executor_runs_reference_artifact_matches_jax():
    """The reference's own best_model.onnx, executed by the numpy executor,
    agrees with our JAX forward on the imported weights — closing the loop
    between the torch-exported graph and the Flax reimplementation."""
    ref = "/root/reference/best_model.onnx"
    if not os.path.exists(ref):
        pytest.skip("reference onnx missing")
    params = lightweight_unet_params_from_onnx(ref)
    model = LightweightUNet()
    x = np.random.default_rng(3).random((1, 64, 64, 1), np.float32)

    got = run_onnx(ref, {"input": _nchw(x)})["output"]
    want = np.asarray(model.apply({"params": params}, x))
    np.testing.assert_allclose(_nhwc(got), want, atol=2e-4, rtol=1e-3)


def test_executor_rejects_unknown_op(tmp_path):
    from image_enhancement_deglaring_tpu.modelio.onnx_writer import (
        OnnxGraphBuilder,
        _value_info,
    )

    g = OnnxGraphBuilder("bad")
    g.inputs.append(_value_info("input", [1]))
    g.outputs.append(_value_info("output", [1]))
    g.add_named("TotallyMadeUpOp", ["input"], ["output"])
    path = tmp_path / "bad.onnx"
    path.write_bytes(g.model_bytes())
    with pytest.raises(NotImplementedError):
        run_onnx(str(path), {"input": np.zeros(1, np.float32)})
