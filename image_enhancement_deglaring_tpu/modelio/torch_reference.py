"""Torch functional re-execution of LightweightUNet — validation/benchmark
oracle only (never on the serving/training path).

Used by tests for end-to-end numerical parity and by bench.py as the
CPU-baseline stand-in for the reference's ONNX-Runtime CPU serving
(reference: api/app.py:84 — onnxruntime is not installable here, and the
ONNX graph is a 1:1 export of this same torch computation).

Consumes OUR params pytree (HWIO), so it is independent of the reference's
module code.
"""

from __future__ import annotations

import numpy as np


def torch_forward_lightweight(params: dict, x_nhwc: np.ndarray,
                              num_groups: int = 8) -> np.ndarray:
    """Run the LightweightUNet computation with torch functional ops.

    Args:
        params: our Flax params pytree (see models/unet.py).
        x_nhwc: float32 (N, H, W, 1).
        num_groups: the model's GroupNorm budget; the per-block count is
            resolved with the same largest-divisor rule the Flax model
            uses (reference: src/model.py:71-86), so non-default
            features_start/num_groups configs stay comparable.
    Returns:
        float32 (N, H, W, 1).
    """
    import torch
    import torch.nn.functional as F

    from ..ops.conv_blocks import resolve_group_count

    def t(a):
        return torch.from_numpy(np.asarray(a))

    def block(x, p):
        g = resolve_group_count(int(np.asarray(p["gn1_scale"]).shape[0]),
                                num_groups)
        x = F.conv2d(x, t(p["conv1"]).permute(3, 2, 0, 1), padding=1)
        x = F.group_norm(x, g, t(p["gn1_scale"]), t(p["gn1_bias"]))
        x = F.silu(x)
        x = F.conv2d(x, t(p["conv2"]).permute(3, 2, 0, 1), padding=1)
        x = F.group_norm(x, g, t(p["gn2_scale"]), t(p["gn2_bias"]))
        return F.silu(x)

    with torch.no_grad():
        x = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())
        enc1 = block(x, params["enc1"])
        enc2 = block(F.avg_pool2d(enc1, 2), params["enc2"])
        enc3 = block(F.avg_pool2d(enc2, 2), params["enc3"])
        enc4 = block(F.avg_pool2d(enc3, 2), params["enc4"])
        d = block(F.avg_pool2d(enc4, 2), params["bottleneck"])
        for up, dec, skip in (
            ("upconv4", "dec4", enc4),
            ("upconv3", "dec3", enc3),
            ("upconv2", "dec2", enc2),
            ("upconv1", "dec1", enc1),
        ):
            d = F.conv_transpose2d(d, t(params[up]["weight"]), t(params[up]["bias"]),
                                   stride=2)
            d = block(torch.cat([d, skip], dim=1), params[dec])
        out = F.conv2d(d, t(params["output_conv_weight"]).permute(3, 2, 0, 1),
                       t(params["output_conv_bias"]))
        return np.transpose(out.numpy(), (0, 2, 3, 1))
