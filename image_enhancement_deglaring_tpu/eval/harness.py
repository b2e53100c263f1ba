"""Evaluation harness: L1 / PSNR / SSIM over a validation set, on device.

Reproduces the reference's evaluation semantics exactly
(reference: evaluate.py:207-324):

- L1 on the raw model output (NOT clipped)          (evaluate.py:251)
- PSNR/SSIM on the clipped output, per image        (evaluate.py:259-272)
- avg L1  = sum of per-batch means / num_batches    (evaluate.py:309)
- avg PSNR/SSIM = sum over images / num_samples     (evaluate.py:310-311)

TPU-native design: one jitted eval step computes batch L1 and per-image
PSNR/SSIM entirely on device; ragged final batches are padded to the
static batch shape and masked (XLA needs static shapes), preserving the
reference's batch-mean weighting bit-for-bit.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.metrics import psnr as psnr_fn
from ..ops.metrics import ssim as ssim_fn


@partial(jax.jit, static_argnums=0)
def _eval_step(apply_fn, params, x, y, mask):
    """Returns (masked batch-mean L1, per-image PSNR, per-image SSIM, raw
    prediction — so visualizations don't pay a second forward pass).

    mask: (B,) 1.0 for real samples, 0.0 for padding.
    """
    out = apply_fn({"params": params}, x)
    out = out.astype(jnp.float32)
    y = y.astype(jnp.float32)

    per_el = jnp.abs(out - y)
    # batch-mean L1 over real samples only (matches criterion(outputs, targets)
    # on the unpadded batch)
    denom = jnp.sum(mask) * np.prod(x.shape[1:])
    l1 = jnp.sum(per_el * mask[:, None, None, None]) / denom

    clipped = jnp.clip(out[..., 0], 0.0, 1.0)
    target = y[..., 0]
    # where(), not *mask: a padded all-zero row can hit mse=0 -> psnr=inf,
    # and inf * 0.0 = NaN would poison the totals
    psnrs = jnp.where(mask > 0, jax.vmap(psnr_fn)(clipped, target), 0.0)
    ssims = jnp.where(mask > 0, jax.vmap(ssim_fn)(clipped, target), 0.0)
    return l1, psnrs, ssims, out


def evaluate(apply_fn, params, val_loader, *, save_visualizations: bool = False,
             visualizations_dir: str | None = None, max_vis_samples: int = 10,
             batch_size: int | None = None, progress: bool = True,
             mesh=None) -> dict:
    """Evaluate a model over ``val_loader`` (yields NHWC numpy batches).

    Returns {'l1_loss', 'psnr', 'ssim'} with the reference's averaging.
    ``mesh``: optional 1-D Mesh — params replicate and eval batches shard
    across it (padding keeps every compiled batch mesh-aligned), so
    validation scales over a slice like training does.
    """
    params = jax.tree_util.tree_map(jnp.asarray, params)
    sharding = None
    if mesh is not None:
        from ..parallel.mesh import batch_sharding, replicate

        params = replicate(params, mesh)
        sharding = batch_sharding(mesh)
    num_batches = 0
    total_samples = 0
    vis_count = 0
    # per-batch reduced scalars stay ON DEVICE; one stacked fetch at the
    # end (a float() per batch would sync the dispatch pipeline every step
    # — same design as the train loop's epoch metrics)
    batch_stats: list = []

    static_b = batch_size
    iterator = val_loader
    if progress:
        try:
            from tqdm import tqdm

            iterator = tqdm(val_loader, desc="Evaluating")
        except ImportError:
            pass

    if static_b is not None and mesh is not None:
        # an explicit batch size must still divide the mesh evenly
        n_dev = mesh.devices.size
        static_b = -(-static_b // n_dev) * n_dev

    for x, y in iterator:
        b = x.shape[0]
        if static_b is not None and b > static_b:
            # silently clamping the mask would divide the batch L1 by the
            # wrong count (inflated metrics) or crash inside XLA with an
            # opaque broadcast error
            raise ValueError(
                f"loader batch ({b}) exceeds the compiled eval batch "
                f"({static_b}); pass batch_size >= the loader's batch size")
        if static_b is None:
            static_b = b
            if mesh is not None:
                n_dev = mesh.devices.size
                static_b = -(-static_b // n_dev) * n_dev
        if b < static_b:  # pad ragged final batch to the compiled shape
            pad = static_b - b
            x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
            y = np.concatenate([y, np.zeros((pad,) + y.shape[1:], y.dtype)])
        mask = np.zeros((static_b,), np.float32)
        mask[:b] = 1.0

        if sharding is not None:
            x = jax.device_put(x, sharding)
            y = jax.device_put(y, sharding)
            mask = jax.device_put(mask, sharding)
        l1, psnrs, ssims, out = _eval_step(apply_fn, params, jnp.asarray(x),
                                           jnp.asarray(y), jnp.asarray(mask))
        batch_stats.append(jnp.stack([l1, jnp.sum(psnrs), jnp.sum(ssims)]))
        num_batches += 1
        total_samples += b

        if save_visualizations and visualizations_dir and vis_count < max_vis_samples:
            vis_count = _save_visualizations(
                x, y, np.asarray(out), b, visualizations_dir, vis_count,
                max_vis_samples, np.asarray(psnrs), np.asarray(ssims),
            )

    if batch_stats:
        totals = np.asarray(jnp.stack(batch_stats), np.float64).sum(axis=0)
    else:
        totals = np.zeros(3)
    return {
        "l1_loss": float(totals[0]) / max(num_batches, 1),
        "psnr": float(totals[1]) / max(total_samples, 1),
        "ssim": float(totals[2]) / max(total_samples, 1),
        "num_samples": total_samples,
    }


def _save_visualizations(x, y, pred, b, out_dir, vis_count,
                         max_vis, psnrs, ssims) -> int:
    """3-panel input/prediction/target figures (reference: evaluate.py:275-305).

    ``pred`` is the prediction _eval_step already computed — no second
    forward pass."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    for i in range(b):
        if vis_count >= max_vis:
            break
        fig, axes = plt.subplots(1, 3, figsize=(15, 5))
        panels = [
            (x[i, ..., 0], "Input"),
            (np.clip(pred[i, ..., 0], 0, 1),
             f"Prediction\nPSNR: {psnrs[i]:.2f}, SSIM: {ssims[i]:.4f}"),
            (y[i, ..., 0], "Ground Truth"),
        ]
        for ax, (img, title) in zip(axes, panels):
            ax.imshow(img, cmap="gray")
            ax.set_title(f"{title}\nRange: [{img.min():.2f}, {img.max():.2f}]")
            ax.axis("off")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, f"sample_{vis_count}.png"))
        plt.close(fig)
        vis_count += 1
    return vis_count


def _unflatten_npz(path: str) -> dict:
    """Rebuild the nested pytree from flat ``a/b/c`` npz keys."""
    from ..utils.pytree import load_npz_tree

    return load_npz_tree(path)


def load_model_for_eval(model_path: str, *, model_arch: str = "auto",
                        compute_dtype=jnp.float32):
    """Load (apply_fn, params) from .onnx / .pth / orbax checkpoint dir.

    Extension-based format autodetect mirrors reference: evaluate.py:338-345;
    ``model_arch="auto"`` additionally recovers the model *family* from the
    artifact (modelio.detect_model_arch) — matching the reference serving
    behavior where ORT executes whichever graph the .onnx holds
    (reference: api/app.py:84) — with explicit
    lightweight/optimized/enhanced overrides.
    """
    from ..models import EnhancedUNet, LightweightUNet, OptimizedUNet

    lower = model_path.lower()
    if model_arch == "auto":
        from ..modelio import detect_model_arch

        model_arch = detect_model_arch(model_path)

    if model_arch == "enhanced":
        # BatchNorm running stats travel with the weights; bind them (and
        # inference mode) into the apply so engines/harnesses can treat the
        # model like the stateless families.
        from ..modelio import (
            enhanced_unet_params_from_onnx,
            enhanced_unet_params_from_state_dict,
            load_torch_state_dict,
        )

        if lower.endswith(".onnx"):
            params, stats = enhanced_unet_params_from_onnx(model_path)
        elif lower.endswith((".pth", ".pt")):
            params, stats = enhanced_unet_params_from_state_dict(
                load_torch_state_dict(model_path))
        elif lower.endswith(".npz"):
            tree = _unflatten_npz(model_path)
            params, stats = tree["params"], tree["batch_stats"]
        elif os.path.isdir(model_path):
            # repo-trained orbax checkpoint: save_checkpoint stores the
            # running stats alongside params as model_state.batch_stats
            from ..train.checkpoint import restore_checkpoint

            item, _ = restore_checkpoint(model_path)
            params = item["params"]
            stats = item.get("model_state", {}).get("batch_stats")
            if stats is None:
                raise ValueError(
                    f"{model_path} holds no batch_stats; EnhancedUNet needs "
                    "the BatchNorm running stats saved with the weights")
        else:
            raise ValueError(
                "EnhancedUNet needs a .pth/.onnx/.npz checkpoint or an orbax "
                "dir (BatchNorm running stats travel with the weights)")
        model = EnhancedUNet(dtype=compute_dtype,
                             init_features=_infer_width(params, 16))

        # The returned "params" is a {params, batch_stats} BUNDLE and the
        # apply unpacks it: the running stats must travel through the traced
        # arguments, not a closure — jit bakes closed-over arrays into the
        # compiled program as constants, so a closure would silently keep
        # serving the OLD stats after a hot weight reload (serve /reload).
        def apply_fn(variables, x):
            bundle = variables["params"]
            return model.apply(
                {"params": bundle["params"],
                 "batch_stats": bundle["batch_stats"]},
                x, train=False)

        bundle = {
            "params": jax.tree_util.tree_map(jnp.asarray, params),
            "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats),
        }
        return apply_fn, bundle

    if lower.endswith(".onnx"):
        from ..modelio import (
            lightweight_unet_params_from_onnx,
            optimized_unet_params_from_onnx,
        )

        if model_arch == "optimized":
            params = optimized_unet_params_from_onnx(model_path)
        else:
            params = lightweight_unet_params_from_onnx(model_path)
    elif lower.endswith(".npz"):
        params = _unflatten_npz(model_path)
        # extractions of stateful models nest the collections; stateless
        # families may still arrive wrapped the same way
        if set(params.keys()) <= {"params", "batch_stats"}:
            params = params["params"]
    elif lower.endswith((".pth", ".pt")):
        from ..modelio import load_torch_state_dict
        from ..modelio.params_import import (
            lightweight_unet_params_from_state_dict,
            optimized_unet_params_from_state_dict,
        )

        sd = load_torch_state_dict(model_path)
        if model_arch == "optimized":
            params = optimized_unet_params_from_state_dict(sd)
        else:
            params = lightweight_unet_params_from_state_dict(sd)
    else:  # orbax checkpoint directory
        from ..train.checkpoint import restore_params

        params = restore_params(model_path)
    # module widths come from the ARTIFACT, not hard-coded defaults —
    # narrow exports (e.g. LightweightUNet features_start=4) would
    # otherwise crash at apply time with group/shape mismatches
    if model_arch == "optimized":
        model = OptimizedUNet(dtype=compute_dtype,
                              init_features=_infer_width(params, 16))
    else:
        model = LightweightUNet(dtype=compute_dtype,
                                features_start=_infer_width(params, 8))
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return model.apply, params


def _infer_width(params, default: int) -> int:
    """First-block output width of an imported param tree (enc1/conv1 is
    (3, 3, in, width) for every family). Fails loudly on a tree without
    that block — a silent default would defer the real failure to a
    confusing flax binding error at apply time."""
    try:
        return int(np.asarray(params["enc1"]["conv1"]).shape[-1])
    except (KeyError, TypeError, IndexError) as e:
        raise ValueError(
            "cannot infer the model width: the params tree has no "
            "enc1/conv1 kernel (every supported family carries one). "
            "Is this a {params, batch_stats} bundle or a non-model "
            f"artifact? ({type(e).__name__}: {e})") from e


def write_results_file(metrics: dict, model_path: str, data_dir: str,
                       model_type: str, out_dir: str | None = None) -> str:
    """evaluation_results.txt in the reference's format (reference: evaluate.py:372-379)."""
    out_dir = out_dir if out_dir is not None else (os.path.dirname(model_path) or ".")
    path = os.path.join(out_dir, "evaluation_results.txt")
    with open(path, "w") as f:
        f.write(f"Evaluation results on {data_dir}:\n")
        f.write(f"Model type: {model_type.upper()}\n")
        f.write(f"Model path: {model_path}\n")
        f.write(f"L1 Loss: {metrics['l1_loss']:.4f}\n")
        f.write(f"PSNR: {metrics['psnr']:.2f} dB\n")
        f.write(f"SSIM: {metrics['ssim']:.4f}\n")
    return path
