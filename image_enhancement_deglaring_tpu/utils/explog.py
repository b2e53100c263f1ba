"""Experiment logging: W&B-compatible API with an offline JSONL backend.

The reference logs scalars, images, and run summaries to Weights & Biases
(reference: optimized_train.py:292-305, :125-159, :334-339). This logger
keeps the same call surface (``log``, ``log_images``, ``summary``,
``save``) but writes newline-delimited JSON + PNGs locally, so training and
sweeps run without network. If the real ``wandb`` package is importable and
``use_wandb=True``, calls are mirrored to it.
"""

from __future__ import annotations

import json
import os
import time
import warnings
from typing import Any

import numpy as np


class ExperimentLogger:
    def __init__(self, run_dir: str, *, run_name: str | None = None,
                 config: dict | None = None, use_wandb: bool = False,
                 project: str | None = None, entity: str | None = None):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self.run_name = run_name or f"run-{int(time.time())}"
        self._metrics_path = os.path.join(run_dir, "metrics.jsonl")
        self._summary: dict[str, Any] = {}
        self._step = 0
        self._save_warned: set[str] = set()

        self._wandb = None
        if use_wandb:
            try:
                import wandb  # noqa: F811

                self._wandb = wandb
                wandb.init(project=project, entity=entity,
                           name=self.run_name, config=config or {})
            except Exception:
                self._wandb = None

        if config is not None:
            with open(os.path.join(run_dir, "config.json"), "w") as f:
                json.dump(_jsonable(config), f, indent=2)

    def log(self, metrics: dict[str, Any], step: int | None = None) -> None:
        step = self._step if step is None else step
        self._step = step + 1
        rec = {"_step": step, "_time": time.time(), **_jsonable(metrics)}
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_images(self, tag: str, images: dict[str, np.ndarray], step: int | None = None) -> None:
        """Save a dict of [H,W] float [0,1] or uint8 images as PNGs; when a
        wandb run is live, the same images mirror to it as a wandb.Image
        list (reference: optimized_train.py:125-159)."""
        from PIL import Image

        step = self._step if step is None else step
        img_dir = os.path.join(self.run_dir, "images", f"step_{step:06d}")
        os.makedirs(img_dir, exist_ok=True)
        as_uint8 = {}
        for name, arr in images.items():
            a = np.asarray(arr)
            if a.dtype != np.uint8:
                a = (np.clip(a, 0.0, 1.0) * 255).astype(np.uint8)
            if a.ndim == 3 and a.shape[-1] == 1:
                a = a[..., 0]
            as_uint8[name] = a
            Image.fromarray(a, mode="L" if a.ndim == 2 else None).save(
                os.path.join(img_dir, f"{tag}_{name}.png")
            )
        if self._wandb is not None:
            self._wandb.log(
                {tag: [self._wandb.Image(a, caption=name)
                       for name, a in as_uint8.items()]},
                step=step,
            )

    def log_histograms(self, tree, step: int | None = None, prefix: str = "grad") -> None:
        """Summary statistics per pytree leaf — the offline analogue of
        wandb.watch's gradient/parameter histograms
        (reference: optimized_train.py:179). With a live wandb run, each
        leaf also mirrors as a true wandb.Histogram."""
        import jax

        step = self._step if step is None else step
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        rec = {}
        wandb_rec = {}
        for path, leaf in flat:
            name = jax.tree_util.keystr(path).strip("[]'").replace("']['", "/")
            arr = np.asarray(leaf)
            rec[f"{prefix}/{name}"] = _histogram_stats(arr)
            if self._wandb is not None:
                wandb_rec[f"{prefix}/{name}"] = self._wandb.Histogram(
                    np.asarray(arr, np.float64).ravel()
                )
        if self._wandb is not None and wandb_rec:
            self._wandb.log(wandb_rec, step=step)
        self.log({f"_histograms_{prefix}": rec}, step=step)

    def save(self, path: str) -> None:
        """Mirror a training artifact (checkpoint file or orbax directory)
        to the live wandb run — the reference uploads every periodic and
        best checkpoint (reference: optimized_train.py:317,340). The
        artifact already lives on local disk either way; offline runs keep
        the same audit trail in artifacts.jsonl.

        Uploads use policy="now" (point-in-time copy), not the default
        "live" symlink: orbax rewrites the checkpoint directory with new
        content hashes on every improvement epoch, so live symlinks into
        it would go dangling and stale file entries would pile up in the
        run."""
        rec = {"_time": time.time(), "path": os.path.abspath(path)}
        with open(os.path.join(self.run_dir, "artifacts.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            try:
                if os.path.isdir(path):
                    # orbax checkpoints are directories with NESTED data
                    # payloads (d/<hash>, ocdbt.process_0/d/<hash>); a
                    # single-level glob would upload only the top-level
                    # metadata files, so walk and save every file, rooted
                    # so the run keeps the directory structure
                    base = os.path.dirname(os.path.abspath(path))
                    for dirpath, _dirs, files in os.walk(path):
                        for fname in files:
                            self._wandb.save(os.path.join(dirpath, fname),
                                             base_path=base, policy="now")
                else:
                    self._wandb.save(path, policy="now")
            except Exception as e:
                # best-effort, like the sweep's mirroring — but NOT silent:
                # a swallowed TypeError here once no-opped every upload for
                # a whole round without a trace. Warn once per EXCEPTION
                # TYPE per run (not once globally: one transient
                # ConnectionError must not consume the warning and
                # re-silence a later systematic TypeError), then stay quiet
                # — a flaky SaaS link shouldn't spam the epoch loop.
                kind = type(e).__name__
                if kind not in self._save_warned:
                    self._save_warned.add(kind)
                    warnings.warn(
                        f"wandb artifact mirroring failed ({kind}: {e}); "
                        f"further {kind} failures this run will be silent",
                        RuntimeWarning, stacklevel=2)

    def set_summary(self, **kwargs) -> None:
        self._summary.update(_jsonable(kwargs))
        with open(os.path.join(self.run_dir, "summary.json"), "w") as f:
            json.dump(self._summary, f, indent=2)
        if self._wandb is not None:
            for k, v in kwargs.items():
                self._wandb.run.summary[k] = v

    @property
    def summary(self) -> dict:
        return dict(self._summary)

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()


def _jsonable(obj):
    if isinstance(obj, (float, np.floating)) and not np.isfinite(obj):
        # bare NaN/Infinity tokens are not RFC-8259 JSON — strict consumers
        # (jq, JSON.parse, pandas) would reject the whole metrics line,
        # exactly on the diverged runs that most need inspection
        return None
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    if hasattr(obj, "item") and getattr(obj, "ndim", None) == 0:
        return obj.item()
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)


def _histogram_stats(arr: np.ndarray) -> dict:
    a = np.asarray(arr, np.float64).ravel()
    qs = np.percentile(a, [0, 5, 25, 50, 75, 95, 100])
    return {
        "count": int(a.size),
        "mean": float(a.mean()),
        "std": float(a.std()),
        "min": float(qs[0]), "p5": float(qs[1]), "p25": float(qs[2]),
        "median": float(qs[3]), "p75": float(qs[4]), "p95": float(qs[5]),
        "max": float(qs[6]),
    }
