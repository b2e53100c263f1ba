"""Eval harness tests: averaging semantics (batch-mean L1, per-sample
PSNR/SSIM), ragged-batch masking, and results-file format."""

import numpy as np
import pytest
import jax.numpy as jnp

from image_enhancement_deglaring_tpu.eval import evaluate, write_results_file


def _identityish_apply(variables, x):
    # a fake "model": slightly biased identity so metrics are non-trivial
    return x + variables["params"]["bias"]


def _numpy_reference_eval(batches, bias):
    from tests.test_metrics import _psnr_np, _ssim_np

    total_loss, total_psnr, total_ssim, n_img = 0.0, 0.0, 0.0, 0
    for x, y in batches:
        out = x + bias
        total_loss += np.mean(np.abs(out - y))
        for i in range(x.shape[0]):
            o = np.clip(out[i, ..., 0], 0, 1).astype(np.float64)
            t = y[i, ..., 0].astype(np.float64)
            total_psnr += _psnr_np(o, t)
            total_ssim += _ssim_np(o, t)
            n_img += 1
    return {
        "l1_loss": total_loss / len(batches),
        "psnr": total_psnr / n_img,
        "ssim": total_ssim / n_img,
    }


def test_evaluate_matches_reference_averaging(rng):
    # 2 full batches of 4 + ragged batch of 2 (pads + masks internally)
    batches = []
    for b in (4, 4, 2):
        x = rng.random((b, 32, 32, 1)).astype(np.float32)
        y = np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1).astype(np.float32)
        batches.append((x, y))
    params = {"bias": jnp.asarray(0.03, jnp.float32)}
    got = evaluate(_identityish_apply, params, batches, batch_size=4, progress=False)
    want = _numpy_reference_eval(batches, 0.03)
    assert got["num_samples"] == 10
    np.testing.assert_allclose(got["l1_loss"], want["l1_loss"], rtol=1e-4)
    np.testing.assert_allclose(got["psnr"], want["psnr"], rtol=1e-4)
    np.testing.assert_allclose(got["ssim"], want["ssim"], rtol=1e-3)


def test_write_results_file(tmp_path):
    metrics = {"l1_loss": 0.0168, "psnr": 32.57, "ssim": 0.975}
    path = write_results_file(metrics, str(tmp_path / "model.ckpt"), "SD1/val",
                              "onnx", out_dir=str(tmp_path))
    text = open(path).read()
    # format parity with reference: evaluate.py:372-379
    assert "L1 Loss: 0.0168" in text
    assert "PSNR: 32.57 dB" in text
    assert "SSIM: 0.9750" in text
    assert "Model type: ONNX" in text


def test_evaluate_saves_visualizations(tmp_path, rng):
    batches = []
    x = rng.random((2, 32, 32, 1)).astype(np.float32)
    y = np.clip(x + 0.02, 0, 1).astype(np.float32)
    batches.append((x, y))
    params = {"bias": jnp.asarray(0.0, jnp.float32)}
    evaluate(_identityish_apply, params, batches, batch_size=2, progress=False,
             save_visualizations=True, visualizations_dir=str(tmp_path),
             max_vis_samples=2)
    import os

    assert os.path.exists(tmp_path / "sample_0.png")
    assert os.path.exists(tmp_path / "sample_1.png")


def test_evaluate_mesh_sharded_matches_single_device(rng):
    from image_enhancement_deglaring_tpu.parallel import make_mesh

    batches = []
    for b in (8, 8, 5):  # ragged tail also exercises mesh-aligned padding
        x = rng.random((b, 32, 32, 1)).astype(np.float32)
        y = np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1).astype(np.float32)
        batches.append((x, y))
    params = {"bias": jnp.asarray(0.02, jnp.float32)}
    solo = evaluate(_identityish_apply, params, list(batches), batch_size=8,
                    progress=False)
    mesh = make_mesh(8)
    sharded = evaluate(_identityish_apply, params, list(batches), progress=False,
                       mesh=mesh)
    assert sharded["num_samples"] == solo["num_samples"] == 21
    np.testing.assert_allclose(sharded["l1_loss"], solo["l1_loss"], rtol=1e-5)
    np.testing.assert_allclose(sharded["psnr"], solo["psnr"], rtol=1e-5)
    np.testing.assert_allclose(sharded["ssim"], solo["ssim"], rtol=1e-5)


def test_evaluate_mesh_with_explicit_nondivisible_batch(rng):
    """An explicit --batch_size that doesn't divide the mesh must round up
    to a mesh-aligned padded shape instead of crashing on uneven sharding."""
    from image_enhancement_deglaring_tpu.parallel import make_mesh

    batches = []
    for b in (6, 6):
        x = rng.random((b, 32, 32, 1)).astype(np.float32)
        y = np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1).astype(np.float32)
        batches.append((x, y))
    params = {"bias": jnp.asarray(0.02, jnp.float32)}
    solo = evaluate(_identityish_apply, params, list(batches), batch_size=6,
                    progress=False)
    mesh = make_mesh(8)
    sharded = evaluate(_identityish_apply, params, list(batches), batch_size=6,
                       progress=False, mesh=mesh)
    assert sharded["num_samples"] == solo["num_samples"] == 12
    np.testing.assert_allclose(sharded["psnr"], solo["psnr"], rtol=1e-5)


def test_load_model_for_eval_infers_narrow_width(tmp_path, rng):
    """Module widths come from the artifact: a features_start=4 ONNX
    export must load and forward (hard-coded defaults would crash at
    group_norm reshape with 8 groups over 4 channels)."""
    import jax
    import jax.numpy as jnp

    from image_enhancement_deglaring_tpu.eval.harness import (
        load_model_for_eval,
    )
    from image_enhancement_deglaring_tpu.models import LightweightUNet
    from image_enhancement_deglaring_tpu.modelio.onnx_writer import (
        export_lightweight_unet,
    )

    model = LightweightUNet(features_start=4)
    params = jax.tree_util.tree_map(
        np.asarray,
        jax.jit(model.init)(jax.random.PRNGKey(7),
                            jnp.zeros((1, 32, 32, 1)))["params"],
    )
    path = export_lightweight_unet(params, str(tmp_path / "narrow.onnx"))
    apply_fn, loaded = load_model_for_eval(path)
    x = rng.random((1, 32, 32, 1)).astype(np.float32)
    got = np.asarray(apply_fn({"params": loaded}, x))
    want = np.asarray(model.apply({"params": params}, x))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_evaluate_padded_identical_rows_stay_finite():
    """mse=0 on a padded row gives psnr=inf; masking must not turn the
    totals into NaN (inf * 0 = NaN with plain multiplication)."""
    x = np.zeros((3, 32, 32, 1), np.float32)
    y = np.zeros((3, 32, 32, 1), np.float32)
    params = {"bias": jnp.asarray(0.0, jnp.float32)}  # exact identity
    got = evaluate(_identityish_apply, params, [(x, y)], batch_size=4,
                   progress=False)
    # the REAL identical rows legitimately give psnr=+inf; the padded row
    # must contribute exactly 0, never NaN
    assert not np.isnan(got["psnr"])
    assert np.isfinite(got["ssim"])
    assert got["num_samples"] == 3


# ------------------------------------------- round-3 eval/models review


def test_evaluate_rejects_loader_batch_above_compiled(rng):
    """A loader batch larger than the compiled eval batch must raise
    (a clamped mask would silently divide the L1 by the wrong count)."""
    x = rng.random((4, 32, 32, 1)).astype(np.float32)
    params = {"bias": jnp.asarray(0.03, jnp.float32)}
    with pytest.raises(ValueError, match="exceeds the compiled"):
        evaluate(_identityish_apply, params, [(x, x)], batch_size=1,
                 progress=False)


def test_infer_width_fails_loudly_on_non_model_tree():
    from image_enhancement_deglaring_tpu.eval.harness import _infer_width

    assert _infer_width(
        {"enc1": {"conv1": np.zeros((3, 3, 1, 8))}}, 16) == 8
    with pytest.raises(ValueError, match="enc1/conv1"):
        _infer_width({"params": {}, "batch_stats": {}}, 16)


def test_remat_rejects_act_scales():
    """remat (training memory) + act_scales (serving quantization) is a
    clear error, not an opaque TypeError inside the lifted checkpoint."""
    import jax
    import jax.numpy as jnp

    from image_enhancement_deglaring_tpu.models import LightweightUNet

    model = LightweightUNet(remat=True)
    with pytest.raises(ValueError, match="remat"):
        jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 1)),
                               act_scales="calib"))


def test_model_size_metadata_only_and_dequant_export():
    """get_model_size_mb reads dtype metadata without device transfers
    (works on plain numpy trees), and dequantize_params_int8 is a public
    re-export like its documented inverse."""
    from image_enhancement_deglaring_tpu.models import (
        dequantize_params_int8,
        get_model_size_mb,
        quantize_params_int8,
    )

    tree = {"w": np.zeros((4, 4), np.float32),
            "b": np.zeros((4,), np.dtype("bfloat16")
                          if hasattr(np, "bfloat16") else np.float16)}
    mb = get_model_size_mb(tree)
    assert mb > 0
    q, s = quantize_params_int8({"w": np.ones((4, 4), np.float32)})
    out = dequantize_params_int8(q, s)
    np.testing.assert_allclose(np.asarray(out["w"]), 1.0, atol=1e-2)
