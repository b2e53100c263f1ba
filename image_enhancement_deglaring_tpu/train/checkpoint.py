"""Orbax checkpointing with true resume.

The reference only *saves* (periodic checkpoint_epoch_N.pth, rolling
best_model.pth, final_model.pth + weights-only model_weights.pth —
reference: optimized_train.py:63-73,308-340,474-481) and cannot resume
mid-run. Here a checkpoint carries everything needed to continue exactly:
params, optimizer state, epoch, best-val tracking, LR-controller state, and
the data-epoch position.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, *, params, opt_state=None, model_state=None,
                    epoch: int = 0, val_loss: float | None = None,
                    extra: dict | None = None) -> str:
    """Save a checkpoint directory at ``path``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    item = {"params": _to_numpy_tree(params)}
    if opt_state is not None:
        item["opt_state"] = _to_numpy_tree(opt_state)
    if model_state:
        item["model_state"] = _to_numpy_tree(model_state)
    # COLLECTIVE on multi-host: orbax barriers every process and writes
    # from the primary only — callers must invoke this from ALL hosts
    ckptr.save(path, item, force=True)
    if jax.process_index() == 0:
        # record the model family so eval/serving 'auto' detection works on
        # orbax dirs (the params pytree's own module names identify it);
        # plain file write → single writer
        from ..modelio.params_import import arch_from_param_keys

        meta = {"epoch": epoch, "val_loss": val_loss,
                "model_arch": arch_from_param_keys(item["params"].keys()),
                **(extra or {})}
        with open(os.path.join(path, "train_meta.json"), "w") as f:
            json.dump(meta, f)
    return path


def restore_checkpoint(path: str):
    """Returns (item_dict, meta_dict).

    NON-collective by construction: a restore is a pure local read, but
    ``Checkpointer.restore`` wraps it in a ``sync_global_processes``
    barrier — which deadlocks any host-local read (e.g. host 0 seeding
    the best-val bar in ``train.loop`` while other hosts' disks lack the
    checkpoint). Multi-process, the barrier-free handler is used
    directly; single-process the two paths are identical."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if jax.process_count() > 1:
        from etils import epath

        item = ocp.PyTreeCheckpointHandler().restore(epath.Path(path))
    else:
        item = ocp.PyTreeCheckpointer().restore(path)
    meta_path = os.path.join(path, "train_meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return item, meta


def restore_params(path: str):
    """Params-only restore (for eval / serving)."""
    item, _ = restore_checkpoint(path)
    return item["params"] if "params" in item else item
