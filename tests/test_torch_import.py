"""Torch checkpoint import: state-dict naming, layout conversion, and the
reference's checkpoint-format heuristics (full checkpoint vs raw dict,
reference: evaluate.py:62-67, scripts/extract_weights.py:28-37)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _tt(a):
    """torch tensor from a (possibly non-writable) array, via a copy."""
    import numpy as _np

    return torch.from_numpy(_np.array(a))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from image_enhancement_deglaring_tpu.modelio import (  # noqa: E402
    lightweight_unet_params_from_state_dict,
    load_torch_state_dict,
)
from image_enhancement_deglaring_tpu.models import LightweightUNet  # noqa: E402


def _make_torch_state_dict(rng):
    """Random tensors under the reference's state-dict names/layouts."""
    blocks = {
        "enc1": (1, 8), "enc2": (8, 16), "enc3": (16, 32), "enc4": (32, 64),
        "bottleneck": (64, 128), "dec4": (128, 64), "dec3": (64, 32),
        "dec2": (32, 16), "dec1": (16, 8),
    }
    sd = {}
    for blk, (cin, f) in blocks.items():
        sd[f"{blk}.0.weight"] = _tt(
            rng.standard_normal((f, cin, 3, 3)).astype(np.float32))
        sd[f"{blk}.1.weight"] = _tt(rng.standard_normal(f).astype(np.float32))
        sd[f"{blk}.1.bias"] = _tt(rng.standard_normal(f).astype(np.float32))
        sd[f"{blk}.3.weight"] = _tt(
            rng.standard_normal((f, f, 3, 3)).astype(np.float32))
        sd[f"{blk}.4.weight"] = _tt(rng.standard_normal(f).astype(np.float32))
        sd[f"{blk}.4.bias"] = _tt(rng.standard_normal(f).astype(np.float32))
    for up, (cin, cout) in {"upconv4": (128, 64), "upconv3": (64, 32),
                            "upconv2": (32, 16), "upconv1": (16, 8)}.items():
        sd[f"{up}.weight"] = _tt(
            rng.standard_normal((cin, cout, 2, 2)).astype(np.float32))
        sd[f"{up}.bias"] = _tt(rng.standard_normal(cout).astype(np.float32))
    sd["output_conv.weight"] = _tt(
        rng.standard_normal((1, 8, 1, 1)).astype(np.float32))
    sd["output_conv.bias"] = _tt(rng.standard_normal(1).astype(np.float32))
    return sd


def test_pth_roundtrip_both_checkpoint_formats(tmp_path, rng):
    sd = _make_torch_state_dict(rng)

    raw_path = str(tmp_path / "weights.pth")
    torch.save(sd, raw_path)
    full_path = str(tmp_path / "ckpt.pth")
    torch.save({"model_state_dict": sd, "epoch": 3, "loss": 0.1,
                "optimizer_state_dict": {}}, full_path)

    for path in (raw_path, full_path):
        loaded = load_torch_state_dict(path)
        params = lightweight_unet_params_from_state_dict(loaded)
        # spot-check layout conversion: OIHW -> HWIO
        want = sd["enc2.0.weight"].numpy().transpose(2, 3, 1, 0)
        np.testing.assert_array_equal(params["enc2"]["conv1"], want)
        np.testing.assert_array_equal(params["upconv4"]["weight"],
                                      sd["upconv4.weight"].numpy())

    # the imported tree is directly usable by the model
    params = lightweight_unet_params_from_state_dict(load_torch_state_dict(raw_path))
    model = LightweightUNet()
    y = jax.jit(model.apply)(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.zeros((1, 32, 32, 1)),
    )
    assert y.shape == (1, 32, 32, 1)


def test_optimized_unet_pth_import(tmp_path, rng):
    """OptimizedUNet .pth import: torch Sequential/Linear naming -> our
    pytree, shape- and value-exact (reference: evaluate.py --model optimized)."""
    from image_enhancement_deglaring_tpu.modelio.params_import import (
        optimized_unet_params_from_state_dict,
    )
    from image_enhancement_deglaring_tpu.models import OptimizedUNet

    model = OptimizedUNet()
    canonical = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 32, 32, 1)))["params"]

    # build a torch-layout state dict whose shapes invert our mapping
    sd = {}
    for blk in ("enc1", "enc2", "enc3", "enc4", "bottleneck",
                "dec4", "dec3", "dec2", "dec1"):
        p = canonical[blk]
        for t_idx, key in (("0", "conv1"), ("3", "conv2")):
            hwio = np.asarray(p[key])
            sd[f"{blk}.{t_idx}.weight"] = _tt(
                np.ascontiguousarray(hwio.transpose(3, 2, 0, 1)))
        for t_idx, skey, bkey in (("1", "gn1_scale", "gn1_bias"),
                                  ("4", "gn2_scale", "gn2_bias")):
            sd[f"{blk}.{t_idx}.weight"] = _tt(np.asarray(p[skey]))
            sd[f"{blk}.{t_idx}.bias"] = _tt(np.asarray(p[bkey]))
    for up in ("upconv4", "upconv3", "upconv2", "upconv1"):
        p = canonical[up]
        sd[f"{up}.1.weight"] = _tt(
            np.ascontiguousarray(np.asarray(p["conv"]).transpose(3, 2, 0, 1)))
        sd[f"{up}.2.weight"] = _tt(np.asarray(p["gn_scale"]))
        sd[f"{up}.2.bias"] = _tt(np.asarray(p["gn_bias"]))
    for att in ("attention4", "attention3", "attention2", "attention1"):
        p = canonical[att]
        sd[f"{att}.fc.0.weight"] = _tt(
            np.ascontiguousarray(np.asarray(p["fc1"])[0, 0].T))
        sd[f"{att}.fc.2.weight"] = _tt(
            np.ascontiguousarray(np.asarray(p["fc2"])[0, 0].T))
    sd["output.weight"] = _tt(
        np.ascontiguousarray(np.asarray(canonical["output_weight"]).transpose(3, 2, 0, 1)))
    sd["output.bias"] = _tt(np.asarray(canonical["output_bias"]))

    path = str(tmp_path / "optimized.pth")
    torch.save(sd, path)
    from image_enhancement_deglaring_tpu.modelio import load_torch_state_dict

    imported = optimized_unet_params_from_state_dict(load_torch_state_dict(path))
    flat_c = jax.tree_util.tree_flatten_with_path(canonical)[0]
    flat_i = dict(jax.tree_util.tree_flatten_with_path(imported)[0])
    assert len(flat_c) == len(flat_i)
    for kpath, leaf in flat_c:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat_i[kpath]),
                                      err_msg=str(kpath))

    # and the eval loader path dispatches by arch
    from image_enhancement_deglaring_tpu.eval import load_model_for_eval

    apply_fn, params2 = load_model_for_eval(path, model_arch="optimized")
    y = jax.jit(apply_fn)({"params": params2}, jnp.zeros((1, 32, 32, 1)))
    assert y.shape == (1, 32, 32, 1)


def test_enhanced_unet_pth_import(tmp_path, rng):
    """EnhancedUNet .pth import: ResidualBlock/AttentionGate/BN naming,
    params + running stats, inverse-mapping exact and runnable."""
    from image_enhancement_deglaring_tpu.modelio.params_import import (
        enhanced_unet_params_from_state_dict,
    )
    from image_enhancement_deglaring_tpu.models import EnhancedUNet

    model = EnhancedUNet()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 1)))
    canonical_p = variables["params"]
    canonical_s = variables["batch_stats"]

    def put_conv(sd, name, hwio):
        sd[name] = _tt(
            np.ascontiguousarray(np.asarray(hwio).transpose(3, 2, 0, 1)))

    def put_bn(sd, prefix, p_bn, s_bn):
        sd[f"{prefix}.weight"] = _tt(np.asarray(p_bn["scale"]))
        sd[f"{prefix}.bias"] = _tt(np.asarray(p_bn["bias"]))
        sd[f"{prefix}.running_mean"] = _tt(np.asarray(s_bn["mean"]))
        sd[f"{prefix}.running_var"] = _tt(np.asarray(s_bn["var"]))

    sd = {}
    for blk in ("enc1", "enc2", "enc3", "enc4", "enc5",
                "dec5", "dec4", "dec3", "dec2", "dec1"):
        put_conv(sd, f"{blk}.conv_block.0.weight", canonical_p[blk]["conv1"])
        put_conv(sd, f"{blk}.conv_block.4.weight", canonical_p[blk]["conv2"])
        put_bn(sd, f"{blk}.conv_block.1", canonical_p[blk]["bn1"],
               canonical_s[blk]["bn1"])
        put_bn(sd, f"{blk}.conv_block.5", canonical_p[blk]["bn2"],
               canonical_s[blk]["bn2"])
        if "shortcut_conv" in canonical_p[blk]:
            put_conv(sd, f"{blk}.shortcut.0.weight",
                     canonical_p[blk]["shortcut_conv"])
            put_bn(sd, f"{blk}.shortcut.1", canonical_p[blk]["shortcut_bn"],
                   canonical_s[blk]["shortcut_bn"])
    put_conv(sd, "bottleneck.0.weight", canonical_p["bottleneck_conv1"])
    put_conv(sd, "bottleneck.4.weight", canonical_p["bottleneck_conv2"])
    put_bn(sd, "bottleneck.1", canonical_p["bottleneck_bn1"],
           canonical_s["bottleneck_bn1"])
    put_bn(sd, "bottleneck.5", canonical_p["bottleneck_bn2"],
           canonical_s["bottleneck_bn2"])
    for att in ("attention5", "attention4", "attention3", "attention2",
                "attention1"):
        p = canonical_p[att]
        put_conv(sd, f"{att}.W_g.0.weight", p["w_g"])
        sd[f"{att}.W_g.0.bias"] = _tt(np.asarray(p["w_g_bias"]))
        put_conv(sd, f"{att}.W_x.0.weight", p["w_x"])
        sd[f"{att}.W_x.0.bias"] = _tt(np.asarray(p["w_x_bias"]))
        put_conv(sd, f"{att}.psi.0.weight", p["psi"])
        sd[f"{att}.psi.0.bias"] = _tt(np.asarray(p["psi_bias"]))
        s = canonical_s[att]
        put_bn(sd, f"{att}.W_g.1", p["bn_g"], s["bn_g"])
        put_bn(sd, f"{att}.W_x.1", p["bn_x"], s["bn_x"])
        put_bn(sd, f"{att}.psi.1", p["bn_psi"], s["bn_psi"])
    for up in ("upconv5", "upconv4", "upconv3", "upconv2", "upconv1"):
        sd[f"{up}.weight"] = _tt(np.asarray(canonical_p[up]["weight"]))
        sd[f"{up}.bias"] = _tt(np.asarray(canonical_p[up]["bias"]))
    put_conv(sd, "output.0.weight", canonical_p["output_weight"])
    sd["output.0.bias"] = _tt(np.asarray(canonical_p["output_bias"]))

    path = str(tmp_path / "enhanced.pth")
    torch.save(sd, path)
    from image_enhancement_deglaring_tpu.modelio import load_torch_state_dict

    params, stats = enhanced_unet_params_from_state_dict(load_torch_state_dict(path))

    flat_c = jax.tree_util.tree_flatten_with_path(canonical_p)[0]
    flat_i = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    assert len(flat_c) == len(flat_i)
    for kpath, leaf in flat_c:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat_i[kpath]),
                                      err_msg=str(kpath))
    flat_cs = jax.tree_util.tree_flatten_with_path(canonical_s)[0]
    flat_is = dict(jax.tree_util.tree_flatten_with_path(stats)[0])
    assert len(flat_cs) == len(flat_is)
    for kpath, leaf in flat_cs:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat_is[kpath]))

    y = jax.jit(model.apply)(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        jnp.zeros((1, 64, 64, 1)),
    )
    assert y.shape == (1, 64, 64, 1)


def test_torch_oracle_respects_group_resolution():
    """The parity oracle must resolve per-block group counts like the Flax
    model (largest-divisor rule) for non-default configs."""
    import jax
    import jax.numpy as jnp

    from image_enhancement_deglaring_tpu.models import LightweightUNet
    from image_enhancement_deglaring_tpu.modelio.torch_reference import (
        torch_forward_lightweight,
    )

    model = LightweightUNet(features_start=4)  # first level: 4ch -> groups=4
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 32, 32, 1)))["params"]
    x = np.random.default_rng(0).random((1, 32, 32, 1)).astype(np.float32)
    want = np.asarray(model.apply({"params": params}, x))
    got = torch_forward_lightweight(
        jax.tree_util.tree_map(np.asarray, params), x)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_load_torch_state_dict_refuses_arbitrary_pickles(tmp_path, rng):
    """A .pth that pickles non-tensor objects is refused by default — this
    loader is reachable from serving /reload and autodetect, so a tampered
    checkpoint must not execute code at unpickle time. allow_pickle=True is
    the explicit trust opt-in."""
    import argparse

    import torch

    sd = _make_torch_state_dict(rng)
    path = str(tmp_path / "wrapped.pth")
    # argparse.Namespace is outside weights_only's allowlist — the shape of
    # checkpoint real training scripts produce when they stash their args
    torch.save({"model_state_dict": sd, "args": argparse.Namespace(lr=1e-3)},
               path)
    from image_enhancement_deglaring_tpu.modelio import load_torch_state_dict

    with pytest.raises(ValueError, match="weights_only"):
        load_torch_state_dict(path)
    loaded = load_torch_state_dict(path, allow_pickle=True)
    assert set(loaded) == {k for k in sd}


def test_load_torch_state_dict_real_errors_not_misdiagnosed(tmp_path):
    """A missing or truncated file must surface as itself — not as a
    'pickles non-tensor objects' ValueError steering the user toward the
    allow_pickle=True security opt-out."""
    from image_enhancement_deglaring_tpu.modelio import load_torch_state_dict

    with pytest.raises(FileNotFoundError):
        load_torch_state_dict(str(tmp_path / "nope.pth"))
    corrupt = tmp_path / "corrupt.pth"
    corrupt.write_bytes(b"PK\x03\x04 definitely not a checkpoint")
    try:
        load_torch_state_dict(str(corrupt))
    except ValueError as e:
        assert "allow_pickle" not in str(e)
    except Exception:
        pass  # any non-misdiagnosing error type is fine
    else:
        pytest.fail("corrupt checkpoint loaded")


def test_load_torch_state_dict_plain_formats_stay_safe_path(tmp_path, rng):
    """Raw state dicts and reference-style training checkpoints (tensors +
    scalars only, reference: optimized_train.py:63-73) load via
    weights_only=True without the opt-in."""
    import torch

    sd = _make_torch_state_dict(rng)
    raw = str(tmp_path / "raw.pth")
    full = str(tmp_path / "full.pth")
    torch.save(sd, raw)
    torch.save({"model_state_dict": sd, "epoch": 1, "loss": 0.5,
                "optimizer_state_dict": {}}, full)
    from image_enhancement_deglaring_tpu.modelio import load_torch_state_dict

    for path in (raw, full):
        assert set(load_torch_state_dict(path)) == set(sd)
