"""Model-family autodetection and arch-generic loading/serving.

The reference serves whatever graph its .onnx holds because ORT executes
it directly (reference: api/app.py:84); our engine binds a Flax
architecture, so ``detect_model_arch`` + ``load_model_for_eval("auto")``
recover the family from the artifact instead."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_enhancement_deglaring_tpu.eval import load_model_for_eval
from image_enhancement_deglaring_tpu.modelio import detect_model_arch
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

SIZE = 64


def _init(model, seed=0):
    return jax.tree_util.tree_map(
        np.asarray,
        jax.jit(model.init)(jax.random.PRNGKey(seed), jnp.zeros((1, SIZE, SIZE, 1))),
    )


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    d = tmp_path_factory.mktemp("arch")
    paths = {}
    paths["lightweight"] = export_lightweight_unet(
        _init(LightweightUNet())["params"], str(d / "lw.onnx"))
    paths["optimized"] = export_optimized_unet(
        _init(OptimizedUNet())["params"], str(d / "opt.onnx"))
    v = _init(EnhancedUNet())
    paths["enhanced"] = export_enhanced_unet(
        v["params"], v["batch_stats"], str(d / "enh.onnx"))
    return paths


def test_detect_arch_from_onnx(artifacts):
    for arch, path in artifacts.items():
        assert detect_model_arch(path) == arch


def test_detect_arch_reference_artifact():
    import os

    ref = "/root/reference/best_model.onnx"
    if not os.path.exists(ref):
        pytest.skip("reference onnx missing")
    assert detect_model_arch(ref) == "lightweight"


def test_detect_arch_from_torch_state_dict(tmp_path):
    torch = pytest.importorskip("torch")

    cases = {
        "lightweight": {"enc1.0.weight": torch.zeros(8, 1, 3, 3)},
        "optimized": {"enc1.0.weight": torch.zeros(16, 1, 3, 3),
                      "attention4.fc.0.weight": torch.zeros(8, 128)},
        "enhanced": {"enc1.conv_block.0.weight": torch.zeros(16, 1, 3, 3)},
    }
    for arch, sd in cases.items():
        p = tmp_path / f"{arch}.pth"
        torch.save(sd, str(p))
        assert detect_model_arch(str(p)) == arch


@pytest.mark.parametrize("arch", ["lightweight", "optimized", "enhanced"])
def test_auto_load_and_serve_each_family(artifacts, arch):
    """auto-loaded apply runs inside the serving engine for every family."""
    from image_enhancement_deglaring_tpu.serve.engine import InferenceEngine

    apply_fn, params = load_model_for_eval(artifacts[arch], model_arch="auto")
    eng = InferenceEngine(apply_fn, jax.tree_util.tree_map(np.asarray, params),
                          image_size=SIZE, max_batch_size=4, warmup=False,
                          compute_dtype=jnp.float32)
    x = (np.random.default_rng(0).random((3, SIZE, SIZE)) * 255).astype(np.uint8)
    out = eng.infer_batch(x)
    assert out.shape == x.shape and out.dtype == np.uint8


def test_enhanced_auto_load_matches_flax(artifacts):
    """The batch_stats-bound apply equals the raw Flax inference forward."""
    apply_fn, params = load_model_for_eval(artifacts["enhanced"],
                                           model_arch="auto")
    model = EnhancedUNet()
    v = _init(EnhancedUNet())
    x = np.random.default_rng(1).random((1, SIZE, SIZE, 1), np.float32)
    got = np.asarray(apply_fn({"params": params}, jnp.asarray(x)))
    want = np.asarray(model.apply(v, x, train=False))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_enhanced_load_rejects_orbax_dir_without_stats(tmp_path):
    """An orbax dir that carries no batch_stats cannot bind EnhancedUNet."""
    from image_enhancement_deglaring_tpu.train.checkpoint import save_checkpoint

    v = _init(LightweightUNet())
    p = str(tmp_path / "lw_ckpt")
    save_checkpoint(p, params=v["params"])
    with pytest.raises(ValueError, match="batch_stats"):
        load_model_for_eval(p, model_arch="enhanced")


@pytest.mark.parametrize("model,arch", [
    (LightweightUNet, "lightweight"),
    (OptimizedUNet, "optimized"),
])
def test_detect_arch_orbax_dir(tmp_path, model, arch):
    """Repo-trained orbax checkpoints autodetect their family — both via
    the model_arch tag save_checkpoint records and, for tag-less dirs,
    from the restored params' module names."""
    import json
    import os

    from image_enhancement_deglaring_tpu.train.checkpoint import save_checkpoint

    v = _init(model())
    p = str(tmp_path / f"{arch}_ckpt")
    save_checkpoint(p, params=v["params"])
    assert detect_model_arch(p) == arch

    meta = os.path.join(p, "train_meta.json")
    with open(meta) as f:
        assert json.load(f)["model_arch"] == arch
    os.remove(meta)  # pre-tag checkpoint: fall back to param-key sniffing
    assert detect_model_arch(p) == arch


def test_auto_load_trained_optimized_orbax(tmp_path):
    """The round-1 failure case: train --model optimized, then serve the
    orbax best_model with --model auto — detection must NOT say
    lightweight."""
    from image_enhancement_deglaring_tpu.train.checkpoint import save_checkpoint

    v = _init(OptimizedUNet())
    p = str(tmp_path / "best_model")
    save_checkpoint(p, params=v["params"])
    apply_fn, params = load_model_for_eval(p, model_arch="auto")
    x = np.random.default_rng(2).random((1, SIZE, SIZE, 1), np.float32)
    got = np.asarray(apply_fn({"params": params}, jnp.asarray(x)))
    want = np.asarray(OptimizedUNet().apply(v, x))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_enhanced_orbax_roundtrip(tmp_path):
    """Enhanced orbax checkpoints (batch_stats in model_state, as the train
    loop writes them) autodetect, load, and match the Flax forward."""
    from image_enhancement_deglaring_tpu.train.checkpoint import save_checkpoint

    v = _init(EnhancedUNet())
    p = str(tmp_path / "enh_ckpt")
    save_checkpoint(p, params=v["params"],
                    model_state={"batch_stats": v["batch_stats"]})
    assert detect_model_arch(p) == "enhanced"
    apply_fn, params = load_model_for_eval(p, model_arch="auto")
    x = np.random.default_rng(3).random((1, SIZE, SIZE, 1), np.float32)
    got = np.asarray(apply_fn({"params": params}, jnp.asarray(x)))
    want = np.asarray(EnhancedUNet().apply(v, x, train=False))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("arch", ["optimized", "enhanced"])
def test_extract_weights_cli_autodetects_family(artifacts, tmp_path, arch):
    """extract_weights re-exports non-lightweight ONNX artifacts intact."""
    from image_enhancement_deglaring_tpu.cli.extract_weights import main
    from image_enhancement_deglaring_tpu.modelio import run_onnx

    out = str(tmp_path / f"{arch}_re.onnx")
    assert main([artifacts[arch], out]) == 0
    assert detect_model_arch(out) == arch
    x = np.random.default_rng(0).random((1, 1, SIZE, SIZE), np.float32)
    a = run_onnx(artifacts[arch], {"input": x})["output"]
    b = run_onnx(out, {"input": x})["output"]
    np.testing.assert_array_equal(a, b)


def test_extract_weights_cli_enhanced_npz_roundtrip(artifacts, tmp_path):
    """The .npz an enhanced extraction writes must be readable by the
    project's own loader (and keep the running stats)."""
    from image_enhancement_deglaring_tpu.cli.extract_weights import main

    out = str(tmp_path / "enh.npz")
    assert main([artifacts["enhanced"], out]) == 0
    flat = np.load(out)
    assert any(k.startswith("batch_stats/") for k in flat.files)
    assert any(k.startswith("params/") for k in flat.files)

    assert detect_model_arch(out) == "enhanced"
    apply_fn, params = load_model_for_eval(out, model_arch="auto")
    apply_onnx, params_onnx = load_model_for_eval(artifacts["enhanced"])
    x = np.random.default_rng(4).random((1, SIZE, SIZE, 1), np.float32)
    got = np.asarray(apply_fn({"params": params}, jnp.asarray(x)))
    want = np.asarray(apply_onnx({"params": params_onnx}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)


def test_extract_weights_cli_lightweight_npz_roundtrip(artifacts, tmp_path):
    from image_enhancement_deglaring_tpu.cli.extract_weights import main

    out = str(tmp_path / "lw.npz")
    assert main([artifacts["lightweight"], out]) == 0
    assert detect_model_arch(out) == "lightweight"
    apply_fn, params = load_model_for_eval(out, model_arch="auto")
    x = np.random.default_rng(5).random((1, SIZE, SIZE, 1), np.float32)
    out_arr = np.asarray(apply_fn({"params": params}, jnp.asarray(x)))
    assert out_arr.shape == (1, SIZE, SIZE, 1)


def test_extract_weights_cli_enhanced_orbax_roundtrip(artifacts, tmp_path):
    """Enhanced extraction to an orbax dir keeps the stats as model_state
    and the result loads back via auto-detection."""
    from image_enhancement_deglaring_tpu.cli.extract_weights import main

    out = str(tmp_path / "enh_ckpt")
    assert main([artifacts["enhanced"], out]) == 0
    assert detect_model_arch(out) == "enhanced"
    apply_fn, params = load_model_for_eval(out, model_arch="auto")
    apply_onnx, params_onnx = load_model_for_eval(artifacts["enhanced"])
    x = np.random.default_rng(6).random((1, SIZE, SIZE, 1), np.float32)
    got = np.asarray(apply_fn({"params": params}, jnp.asarray(x)))
    want = np.asarray(apply_onnx({"params": params_onnx}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)


def test_detect_model_arch_fails_loudly_on_bad_paths(tmp_path):
    """Unknown extensions and missing files must raise, not silently
    default to 'lightweight' and fail later with a confusing shape error."""
    from image_enhancement_deglaring_tpu.modelio import detect_model_arch

    with pytest.raises(FileNotFoundError):
        detect_model_arch(str(tmp_path / "nope.onnx"))
    weird = tmp_path / "model.safetensors"
    weird.write_bytes(b"\0" * 8)
    with pytest.raises(ValueError, match="autodetect"):
        detect_model_arch(str(weird))
