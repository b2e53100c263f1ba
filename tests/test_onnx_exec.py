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


# -------------------------------------------- round-3 oracle review fixes


def _tiny_graph():
    from image_enhancement_deglaring_tpu.modelio.onnx_writer import (
        OnnxGraphBuilder,
        _value_info,
    )

    g = OnnxGraphBuilder("t")
    g.inputs.append(_value_info("input", [1, 1, "h", "w"]))
    g.outputs.append(_value_info("output", [1, 1, "h", "w"]))
    return g


def test_resize_sizes_input_exact_output_extent(tmp_path):
    """Resize driven by the sizes input must produce EXACTLY the requested
    sizes: round-tripping through scales and re-flooring lands one pixel
    short for many pairs (floor(11 * (15/11)) == 14)."""
    g = _tiny_graph()
    roi = g.init_tensor("roi", np.zeros(0, np.float32))
    scales = g.init_tensor("scales", np.zeros(0, np.float32))
    sizes = g.init_tensor("sizes", np.asarray([1, 1, 15, 15], np.int64))
    g.add_named("Resize", ["input", roi, scales, sizes], ["output"],
                mode="nearest", coordinate_transformation_mode="asymmetric",
                nearest_mode="floor")
    path = tmp_path / "rs.onnx"
    path.write_bytes(g.model_bytes())
    x = np.arange(11 * 11, dtype=np.float32).reshape(1, 1, 11, 11)
    out = run_onnx(str(path), {"input": x})["output"]
    assert out.shape == (1, 1, 15, 15)
    # asymmetric + floor semantics: out[i] = in[floor(i / scale)]
    idx = np.floor(np.arange(15) / (15 / 11)).astype(np.int64)
    np.testing.assert_array_equal(out[0, 0], x[0, 0][np.ix_(idx, idx)])


@pytest.mark.parametrize("attrs", [
    {"output_padding": [1, 1]},
    {"group": 2},
    {"dilations": [2, 2]},
    {"auto_pad": "SAME_UPPER"},
])
def test_conv_transpose_unhonored_attrs_fail_loudly(tmp_path, attrs):
    g = _tiny_graph()
    w = g.init_tensor("w", np.ones((1, 1, 2, 2), np.float32))
    g.add_named("ConvTranspose", ["input", w], ["output"],
                kernel_shape=[2, 2], strides=[2, 2], **attrs)
    path = tmp_path / "ct.onnx"
    path.write_bytes(g.model_bytes())
    with pytest.raises(NotImplementedError):
        run_onnx(str(path), {"input": np.zeros((1, 1, 4, 4), np.float32)})


def test_conv_auto_pad_fails_loudly(tmp_path):
    g = _tiny_graph()
    w = g.init_tensor("w", np.ones((1, 1, 3, 3), np.float32))
    g.add_named("Conv", ["input", w], ["output"], kernel_shape=[3, 3],
                auto_pad="SAME_UPPER")
    path = tmp_path / "c.onnx"
    path.write_bytes(g.model_bytes())
    with pytest.raises(NotImplementedError):
        run_onnx(str(path), {"input": np.zeros((1, 1, 4, 4), np.float32)})


def test_resize_foreign_modes_fail_on_non_integral_scale(tmp_path):
    """half_pixel/round_prefer_floor at a NON-integral scale is not what the
    asymmetric+floor implementation computes — must raise, not silently
    resample wrongly. (All modes coincide on integral upscales, which stay
    accepted for torch-exported 2x Upsample graphs.)"""
    for s, should_raise in ((1.5, True), (2.0, False)):
        g = _tiny_graph()
        roi = g.init_tensor("roi", np.zeros(0, np.float32))
        scales = g.init_tensor("scales",
                               np.asarray([1, 1, s, s], np.float32))
        g.add_named("Resize", ["input", roi, scales], ["output"],
                    mode="nearest",
                    coordinate_transformation_mode="half_pixel",
                    nearest_mode="round_prefer_floor")
        path = tmp_path / f"rz{s}.onnx"
        path.write_bytes(g.model_bytes())
        x = np.zeros((1, 1, 4, 4), np.float32)
        if should_raise:
            with pytest.raises(NotImplementedError):
                run_onnx(str(path), {"input": x})
        else:
            assert run_onnx(str(path), {"input": x})["output"].shape == \
                (1, 1, 8, 8)


def test_resize_integral_downscale_is_not_integral(tmp_path):
    """An INTEGRAL DOWNSCALE via sizes (15->5) samples different pixels per
    coordinate mode (half_pixel picks 3x+1, asymmetric/floor picks 3x) — it
    must hit the fail-loud guard under foreign modes, and compute floor
    semantics under asymmetric/floor."""
    for ct, nm, should_raise in (
            ("half_pixel", "round_prefer_floor", True),
            ("asymmetric", "floor", False)):
        g = _tiny_graph()
        roi = g.init_tensor("roi", np.zeros(0, np.float32))
        scales = g.init_tensor("scales", np.zeros(0, np.float32))
        sizes = g.init_tensor("sizes", np.asarray([1, 1, 5, 5], np.int64))
        g.add_named("Resize", ["input", roi, scales, sizes], ["output"],
                    mode="nearest", coordinate_transformation_mode=ct,
                    nearest_mode=nm)
        path = tmp_path / f"rzd_{ct}.onnx"
        path.write_bytes(g.model_bytes())
        x = np.arange(15 * 15, dtype=np.float32).reshape(1, 1, 15, 15)
        if should_raise:
            with pytest.raises(NotImplementedError):
                run_onnx(str(path), {"input": x})
        else:
            out = run_onnx(str(path), {"input": x})["output"]
            idx = np.arange(5) * 3
            np.testing.assert_array_equal(out[0, 0], x[0, 0][np.ix_(idx, idx)])


def test_multi_output_node_fails_loudly(tmp_path):
    """Only outputs[0] is computed; a second declared output (e.g. MaxPool
    indices) must raise at the node, not KeyError at its consumer."""
    g = _tiny_graph()
    g.add_named("MaxPool", ["input"], ["output", "indices"],
                kernel_shape=[2, 2], strides=[2, 2])
    path = tmp_path / "mp.onnx"
    path.write_bytes(g.model_bytes())
    with pytest.raises(NotImplementedError, match="outputs"):
        run_onnx(str(path), {"input": np.zeros((1, 1, 4, 4), np.float32)})


def test_importer_rejects_unconsumed_keys():
    """A checkpoint carrying parameters the Flax port has no slot for (e.g.
    biases on bias-free convs) must fail the import, not silently drop
    them and serve different numerics."""
    from tests.test_torch_import import _make_torch_state_dict
    from image_enhancement_deglaring_tpu.modelio import (
        lightweight_unet_params_from_state_dict,
    )

    rng = np.random.default_rng(0)
    sd = {k: np.asarray(v) for k, v in _make_torch_state_dict(rng).items()}
    assert lightweight_unet_params_from_state_dict(dict(sd))  # clean: ok
    sd["enc1.0.bias"] = np.zeros(8, np.float32)
    with pytest.raises(ValueError, match="enc1.0.bias"):
        lightweight_unet_params_from_state_dict(sd)
