"""Torch checkpoint import: state-dict naming, layout conversion, and the
reference's checkpoint-format heuristics (full checkpoint vs raw dict,
reference: evaluate.py:62-67, scripts/extract_weights.py:28-37)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

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
        sd[f"{blk}.0.weight"] = torch.from_numpy(
            rng.standard_normal((f, cin, 3, 3)).astype(np.float32))
        sd[f"{blk}.1.weight"] = torch.from_numpy(rng.standard_normal(f).astype(np.float32))
        sd[f"{blk}.1.bias"] = torch.from_numpy(rng.standard_normal(f).astype(np.float32))
        sd[f"{blk}.3.weight"] = torch.from_numpy(
            rng.standard_normal((f, f, 3, 3)).astype(np.float32))
        sd[f"{blk}.4.weight"] = torch.from_numpy(rng.standard_normal(f).astype(np.float32))
        sd[f"{blk}.4.bias"] = torch.from_numpy(rng.standard_normal(f).astype(np.float32))
    for up, (cin, cout) in {"upconv4": (128, 64), "upconv3": (64, 32),
                            "upconv2": (32, 16), "upconv1": (16, 8)}.items():
        sd[f"{up}.weight"] = torch.from_numpy(
            rng.standard_normal((cin, cout, 2, 2)).astype(np.float32))
        sd[f"{up}.bias"] = torch.from_numpy(rng.standard_normal(cout).astype(np.float32))
    sd["output_conv.weight"] = torch.from_numpy(
        rng.standard_normal((1, 8, 1, 1)).astype(np.float32))
    sd["output_conv.bias"] = torch.from_numpy(rng.standard_normal(1).astype(np.float32))
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
