"""Weight import: reference .onnx / .pth checkpoints -> our Flax pytrees.

The reference stores torch state dicts either raw or wrapped in a training
checkpoint (reference: scripts/extract_weights.py:28-37, evaluate.py:62-67);
its ONNX export keeps torch parameter names for conv weights and lowers
GroupNorm to InstanceNormalization followed by Mul(scale)/Add(bias) with
anonymous ``onnx::Mul_N`` initializers (verified by graph inspection).

Layout conversions (torch OIHW -> our HWIO NHWC):
- Conv2d weight (O, I, kh, kw)          -> transpose (2, 3, 1, 0)
- ConvTranspose2d weight (I, O, 2, 2)   -> kept as-is (upsample2x_matmul
  consumes the torch layout directly)
- GroupNorm weight/bias (C,)            -> kept as-is
"""

from __future__ import annotations

import os
import re

import numpy as np

from .onnx_reader import load_onnx

_BLOCKS = ["enc1", "enc2", "enc3", "enc4", "bottleneck", "dec4", "dec3", "dec2", "dec1"]
_UPCONVS = ["upconv4", "upconv3", "upconv2", "upconv1"]


def _conv_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)).astype(np.float32))


class _TrackedDict(dict):
    """State-dict wrapper that records which keys an importer consumed."""

    def __init__(self, sd):
        super().__init__(sd)
        self.used: set[str] = set()

    def __getitem__(self, key):
        self.used.add(key)
        return super().__getitem__(key)


def _require_all_consumed(sd: "_TrackedDict") -> None:
    """Fail loudly on checkpoint keys the importer never read: the source
    model carries parameters (e.g. biases on layers the Flax port created
    without them) that would otherwise be silently dropped, making the
    imported model numerically different with no warning."""
    extra = sorted(k for k in sd if k not in sd.used
                   and not k.endswith("num_batches_tracked"))
    if extra:
        shown = ", ".join(extra[:8]) + ("..." if len(extra) > 8 else "")
        raise ValueError(
            f"checkpoint keys not consumed by the importer ({len(extra)}): "
            f"{shown}")


def _gn_block_from_sd(sd: dict[str, np.ndarray], blk: str) -> dict:
    """Conv(0)/GN(1)/act/Conv(3)/GN(4) Sequential -> our block params
    (shared by the LightweightUNet and OptimizedUNet torch layouts)."""
    return {
        "conv1": _conv_to_hwio(sd[f"{blk}.0.weight"]),
        "gn1_scale": sd[f"{blk}.1.weight"].astype(np.float32).reshape(-1),
        "gn1_bias": sd[f"{blk}.1.bias"].astype(np.float32).reshape(-1),
        "conv2": _conv_to_hwio(sd[f"{blk}.3.weight"]),
        "gn2_scale": sd[f"{blk}.4.weight"].astype(np.float32).reshape(-1),
        "gn2_bias": sd[f"{blk}.4.bias"].astype(np.float32).reshape(-1),
    }


def load_torch_state_dict(path: str, *,
                          allow_pickle: bool = False) -> dict[str, np.ndarray]:
    """Load a torch checkpoint into {name: float32 ndarray}.

    Handles both full training checkpoints ({'model_state_dict': ...}) and
    raw state dicts, mirroring the reference's loader heuristics
    (reference: evaluate.py:62-67, scripts/extract_weights.py:28-37).
    Requires torch (CPU) to unpickle.

    Loads with ``weights_only=True`` (tensors/containers only): this
    function is reachable from the serving /reload and autodetect paths, so
    a tampered .pth must not execute code at unpickle time. A checkpoint
    that genuinely needs full pickling (custom classes in the wrapper dict)
    requires an explicit ``allow_pickle=True`` opt-in.
    """
    import pickle

    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except pickle.UnpicklingError as e:
        # ONLY the weights_only rejection gets the allow_pickle treatment;
        # a missing file / truncated zip must surface as itself, not as
        # advice to disable the unpickling safety default
        if not allow_pickle:
            raise ValueError(
                f"{path} is not loadable with weights_only=True (it pickles "
                "non-tensor objects). Re-save it as a plain state dict, or "
                "pass allow_pickle=True if you trust its origin.") from e
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        sd = ckpt["model_state_dict"]
    elif isinstance(ckpt, dict) and "state_dict" in ckpt:
        sd = ckpt["state_dict"]
    else:
        sd = ckpt
    return {k: v.detach().cpu().numpy().astype(np.float32) for k, v in sd.items()}


def lightweight_unet_params_from_state_dict(sd: dict[str, np.ndarray]) -> dict:
    """Torch state dict (LightweightUNet names) -> our Flax params pytree."""
    sd = _TrackedDict(sd)
    params: dict = {blk: _gn_block_from_sd(sd, blk) for blk in _BLOCKS}
    for up in _UPCONVS:
        params[up] = {
            "weight": sd[f"{up}.weight"].astype(np.float32),
            "bias": sd[f"{up}.bias"].astype(np.float32),
        }
    params["output_conv_weight"] = _conv_to_hwio(sd["output_conv.weight"])
    params["output_conv_bias"] = sd["output_conv.bias"].astype(np.float32)
    _require_all_consumed(sd)
    return params


def optimized_unet_params_from_state_dict(sd: dict[str, np.ndarray]) -> dict:
    """Torch state dict (OptimizedUNet names, reference:
    src/optimized_model.py:6-158) -> our Flax params pytree.

    Torch module layout: enc/dec/bottleneck Sequentials index
    Conv(0)/GN(1)/Conv(3)/GN(4); upconv Sequentials index
    Upsample(0)/Conv(1)/GN(2); SE attention holds Linear(fc.0)/Linear(fc.2);
    output Conv2d carries weight+bias.
    """
    sd = _TrackedDict(sd)
    params: dict = {blk: _gn_block_from_sd(sd, blk) for blk in _BLOCKS}
    for up in ("upconv4", "upconv3", "upconv2", "upconv1"):
        params[up] = {
            "conv": _conv_to_hwio(sd[f"{up}.1.weight"]),
            "gn_scale": sd[f"{up}.2.weight"].astype(np.float32).reshape(-1),
            "gn_bias": sd[f"{up}.2.bias"].astype(np.float32).reshape(-1),
        }
    for att in ("attention4", "attention3", "attention2", "attention1"):
        # torch Linear weight (out, in) -> our 1x1 conv kernel (1, 1, in, out)
        w1 = sd[f"{att}.fc.0.weight"].astype(np.float32)
        w2 = sd[f"{att}.fc.2.weight"].astype(np.float32)
        params[att] = {
            "fc1": np.ascontiguousarray(w1.T)[None, None],
            "fc2": np.ascontiguousarray(w2.T)[None, None],
        }
    params["output_weight"] = _conv_to_hwio(sd["output.weight"])
    params["output_bias"] = sd["output.bias"].astype(np.float32)
    _require_all_consumed(sd)
    return params


def enhanced_unet_params_from_state_dict(sd: dict[str, np.ndarray]):
    """Torch state dict (EnhancedUNet names, reference: src/model.py:240-313)
    -> (params, batch_stats) for our Flax EnhancedUNet.

    Torch layout: ResidualBlock.conv_block indexes Conv(0)/BN(1)/ReLU(2)/
    Dropout(3)/Conv(4)/BN(5) with an optional shortcut Conv(0)/BN(1);
    bottleneck Sequential mirrors the block; AttentionGate holds
    W_g/W_x/psi Conv+BN pairs; output Sequential is Conv(0)+Sigmoid.
    """
    sd = _TrackedDict(sd)
    params: dict = {}
    stats: dict = {}

    def bn(prefix: str):
        return (
            {"scale": sd[f"{prefix}.weight"].astype(np.float32),
             "bias": sd[f"{prefix}.bias"].astype(np.float32)},
            {"mean": sd[f"{prefix}.running_mean"].astype(np.float32),
             "var": sd[f"{prefix}.running_var"].astype(np.float32)},
        )

    blocks = ["enc1", "enc2", "enc3", "enc4", "enc5",
              "dec5", "dec4", "dec3", "dec2", "dec1"]
    for blk in blocks:
        p: dict = {
            "conv1": _conv_to_hwio(sd[f"{blk}.conv_block.0.weight"]),
            "conv2": _conv_to_hwio(sd[f"{blk}.conv_block.4.weight"]),
        }
        s: dict = {}
        p["bn1"], s["bn1"] = bn(f"{blk}.conv_block.1")
        p["bn2"], s["bn2"] = bn(f"{blk}.conv_block.5")
        if f"{blk}.shortcut.0.weight" in sd:
            p["shortcut_conv"] = _conv_to_hwio(sd[f"{blk}.shortcut.0.weight"])
            p["shortcut_bn"], s["shortcut_bn"] = bn(f"{blk}.shortcut.1")
        params[blk] = p
        stats[blk] = s

    params["bottleneck_conv1"] = _conv_to_hwio(sd["bottleneck.0.weight"])
    params["bottleneck_conv2"] = _conv_to_hwio(sd["bottleneck.4.weight"])
    params["bottleneck_bn1"], stats["bottleneck_bn1"] = bn("bottleneck.1")
    params["bottleneck_bn2"], stats["bottleneck_bn2"] = bn("bottleneck.5")

    for att in ("attention5", "attention4", "attention3", "attention2",
                "attention1"):
        p = {
            "w_g": _conv_to_hwio(sd[f"{att}.W_g.0.weight"]),
            "w_g_bias": sd[f"{att}.W_g.0.bias"].astype(np.float32),
            "w_x": _conv_to_hwio(sd[f"{att}.W_x.0.weight"]),
            "w_x_bias": sd[f"{att}.W_x.0.bias"].astype(np.float32),
            "psi": _conv_to_hwio(sd[f"{att}.psi.0.weight"]),
            "psi_bias": sd[f"{att}.psi.0.bias"].astype(np.float32),
        }
        s = {}
        p["bn_g"], s["bn_g"] = bn(f"{att}.W_g.1")
        p["bn_x"], s["bn_x"] = bn(f"{att}.W_x.1")
        p["bn_psi"], s["bn_psi"] = bn(f"{att}.psi.1")
        params[att] = p
        stats[att] = s

    for up in ("upconv5", "upconv4", "upconv3", "upconv2", "upconv1"):
        params[up] = {
            "weight": sd[f"{up}.weight"].astype(np.float32),
            "bias": sd[f"{up}.bias"].astype(np.float32),
        }
    params["output_weight"] = _conv_to_hwio(sd["output.0.weight"])
    params["output_bias"] = sd["output.0.bias"].astype(np.float32)
    _require_all_consumed(sd)
    return params, stats


def arch_from_param_keys(keys) -> str:
    """Family from a params pytree's TOP-LEVEL module names.

    EnhancedUNet alone has a 5th level ("attention5"/"enc5") and BatchNorm
    bottleneck modules; OptimizedUNet alone adds SE gates ("attention1..4")
    to a 4-level net; LightweightUNet has neither.
    """
    keys = set(keys)
    if keys & {"attention5", "enc5", "bottleneck_bn1"}:
        return "enhanced"
    if "attention4" in keys:
        return "optimized"
    return "lightweight"


def detect_model_arch(path: str) -> str:
    """Autodetect which model family a checkpoint belongs to.

    The reference never needs this because ORT executes whatever graph the
    .onnx contains (reference: api/app.py:84); our serving engine binds a
    Flax architecture, so we recover the family from the artifact instead:
    - .onnx: op census — BatchNormalization appears only in EnhancedUNet,
      Resize/GlobalAveragePool only in OptimizedUNet, else LightweightUNet;
    - .pth: state-dict key shapes (``*.conv_block.*`` / ``*.fc.*``);
    - .npz: flat ``a/b/c`` key census (arch_from_param_keys);
    - orbax dir: the ``model_arch`` tag save_checkpoint records, else the
      restored params' module names.
    """
    if not os.path.exists(path):
        raise FileNotFoundError(f"model artifact not found: {path}")
    lower = path.lower()
    if lower.endswith(".onnx"):
        g = load_onnx(path)
        ops = {n.op_type for n in g.nodes}
        if "BatchNormalization" in ops:
            return "enhanced"
        if "Resize" in ops or "GlobalAveragePool" in ops:
            return "optimized"
        return "lightweight"
    if lower.endswith((".pth", ".pt")):
        sd = load_torch_state_dict(path)
        if any(".conv_block." in k for k in sd):
            return "enhanced"
        if any(".fc." in k for k in sd):
            return "optimized"
        return "lightweight"
    if lower.endswith(".npz"):
        with np.load(path) as flat:
            tops = set()
            for key in flat.files:
                parts = key.split("/")
                # extractions of stateful models nest under params/batch_stats
                tops.add(parts[1] if parts[0] in ("params", "batch_stats")
                         and len(parts) > 1 else parts[0])
            return arch_from_param_keys(tops)
    if os.path.isdir(path):
        import json

        meta_path = os.path.join(path, "train_meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                arch = json.load(f).get("model_arch")
            if arch:
                return arch
        from ..train.checkpoint import restore_params

        return arch_from_param_keys(restore_params(path).keys())
    # a silent "lightweight" default here would defer the real failure to a
    # confusing shape/KeyError deep inside model build
    raise ValueError(
        f"cannot autodetect a model family from {path!r} — expected .onnx, "
        ".pth/.pt, .npz, or an orbax checkpoint directory")


def optimized_unet_params_from_onnx(path: str) -> dict:
    """Read an OptimizedUNet .onnx written by our exporter back into the
    Flax params pytree (initializers carry torch-style names; the SE gate
    weights are stored as 1x1 conv kernels (O, I, 1, 1) and squeeze back
    to torch Linear (O, I) layout)."""
    g = load_onnx(path)
    sd: dict[str, np.ndarray] = {}
    for name, arr in g.initializers.items():
        if "." not in name:
            # generated graph constants (resize_roi_N, gnshape_N, ...) —
            # torch parameter names always carry a module dot
            continue
        arr = np.asarray(arr, dtype=np.float32)
        if ".fc." in name and arr.ndim == 4:
            arr = arr.reshape(arr.shape[0], arr.shape[1])
        sd[name] = arr
    return optimized_unet_params_from_state_dict(sd)


def enhanced_unet_params_from_onnx(path: str):
    """Read an EnhancedUNet .onnx written by our exporter back into
    (params, batch_stats) — initializer names match the torch state dict."""
    g = load_onnx(path)
    sd = {name: np.asarray(arr, dtype=np.float32)
          for name, arr in g.initializers.items() if "." in name}
    return enhanced_unet_params_from_state_dict(sd)


def lightweight_unet_params_from_onnx(path: str) -> dict:
    """Parse the reference best_model.onnx and build our params pytree.

    Conv / ConvTranspose / output weights carry torch names directly.
    GroupNorm scale/bias hide behind anonymous initializers; we recover them
    by walking Mul/Add nodes whose names embed the torch module path
    (e.g. ``/enc1/enc1.1/Mul_output_0``).
    """
    g = load_onnx(path)
    sd: dict[str, np.ndarray] = {}

    for name, arr in g.initializers.items():
        # skip torch's anonymous GN initializers (recovered below) and our
        # own writer's generated graph constants (gn_ones_N, gnshape_N, ...,
        # dot-less); torch parameter names always carry a module dot
        if not name.startswith("onnx::") and "." in name:
            sd[name] = np.asarray(arr, dtype=np.float32)

    # Recover GN scale/bias: Mul/Add nodes referencing an anonymous initializer,
    # with output names like /enc1/enc1.1/Mul_output_0.
    pat = re.compile(r"^/[^/]+/([a-z_0-9]+)\.(\d)/(Mul|Add)_output")
    for node in g.nodes:
        if node.op_type not in ("Mul", "Add") or not node.outputs:
            continue
        m = pat.match(node.outputs[0])
        if not m:
            continue
        blk, idx, kind = m.group(1), m.group(2), m.group(3)
        init_name = next((i for i in node.inputs if i in g.initializers), None)
        if init_name is None:
            continue
        arr = np.asarray(g.initializers[init_name], dtype=np.float32).reshape(-1)
        suffix = "weight" if kind == "Mul" else "bias"
        sd[f"{blk}.{idx}.{suffix}"] = arr

    return lightweight_unet_params_from_state_dict(sd)
