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


def restore_checkpoint_all_hosts(path: str, *, params_template,
                                 opt_state_template=None,
                                 model_state_template=None):
    """``(item, meta)`` with HOST-0 AUTHORITY for multi-host resume.

    Host 0 performs the local read; leaves and meta are broadcast so every
    host starts from bitwise-identical state even when ``path`` is
    host-local disk or a lagging mirror. A host-0 read failure (or a
    checkpoint whose structure does not match the current model/optimizer)
    raises the SAME error on EVERY rank — per-host barrier-free reads
    crash some ranks and leave the rest hanging in the next collective.
    Single-process this is exactly ``restore_checkpoint``.

    Templates define the broadcast leaf structure (each host contributes
    its own canonical zeros, host 0 contributes the restored leaves), so
    hosts whose disks lack the checkpoint entirely still unflatten the
    same trees in the same order as host 0.
    """
    if jax.process_count() <= 1:
        return restore_checkpoint(path)
    from jax.experimental import multihost_utils

    is0 = jax.process_index() == 0
    templates = {"params": params_template}
    if opt_state_template is not None:
        templates["opt_state"] = opt_state_template
    if model_state_template:
        templates["model_state"] = model_state_template

    item, meta, err = None, None, ""
    present: list[str] = []
    if is0:
        try:
            item, meta = restore_checkpoint(path)
            for key, tmpl in templates.items():
                if key not in item:
                    if key == "model_state":
                        continue  # legal: loop falls back to init stats
                    raise KeyError(f"checkpoint has no '{key}' tree")
                got = [np.asarray(x)
                       for x in jax.tree_util.tree_leaves(item[key])]
                want = jax.tree_util.tree_leaves(tmpl)
                if len(got) != len(want) or any(
                        g.shape != np.shape(w)
                        for g, w in zip(got, want)):
                    raise ValueError(
                        f"checkpoint '{key}' does not match the current "
                        f"model/optimizer structure ({len(got)} leaves vs "
                        f"{len(want)} expected — resumed with a different "
                        "--model?)")
                present.append(key)
        except Exception as e:  # broadcast the failure; raise on ALL ranks
            err = f"{type(e).__name__}: {e}"
            item, meta = None, None
    # phase 1: status + JSON meta ride a length-prefixed byte broadcast
    # (scalar first so the payload shape is host-uniform)
    payload = (json.dumps({"err": err} if err
                          else {"meta": meta, "present": present})
               .encode() if is0 else b"")
    n = int(multihost_utils.broadcast_one_to_all(
        np.asarray(len(payload), np.int64)))
    buf = np.zeros(n, np.uint8)
    if is0:
        buf[:] = np.frombuffer(payload, np.uint8)
    decoded = json.loads(
        bytes(np.asarray(multihost_utils.broadcast_one_to_all(buf)))
        .decode())
    if "err" in decoded:
        raise RuntimeError(
            f"multi-host resume: host 0 could not restore {path}: "
            f"{decoded['err']}")
    meta = decoded["meta"]
    # phase 2: tree leaves, cast to the template dtypes so every rank
    # contributes identically-typed buffers to the collective
    out = {}
    for key in decoded["present"]:
        flat, treedef = jax.tree_util.tree_flatten(templates[key])
        tmpl_np = [np.asarray(w) for w in flat]
        src = ([np.asarray(x).astype(w.dtype) for x, w in
                zip(jax.tree_util.tree_leaves(item[key]), tmpl_np)]
               if is0 else [np.zeros_like(w) for w in tmpl_np])
        out[key] = jax.tree_util.tree_unflatten(
            treedef,
            list(multihost_utils.broadcast_one_to_all(tuple(src))))
    return out, meta


def restore_params(path: str):
    """Params-only restore (for eval / serving)."""
    item, _ = restore_checkpoint(path)
    return item["params"] if "params" in item else item
