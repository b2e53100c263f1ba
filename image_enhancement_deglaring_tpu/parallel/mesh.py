"""Device mesh + sharding helpers.

The reference is single-process single-device (no torch.distributed
anywhere; see reference: optimized_train.py:383). Scaling here is
first-class and TPU-native: a 1-D ``data`` mesh over the chips of a slice,
parameters replicated, batches sharded on the data axis. Gradients are
averaged by XLA-inserted all-reduces over ICI — no NCCL/MPI analogue
needed. The same helpers drive multi-host slices once
``jax.distributed.initialize`` has run (each process sees its local shard).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree, mesh: Mesh):
    """Place every leaf replicated across the mesh."""
    s = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a (tuple of) NHWC array(s) with the batch dim sharded.

    Batch size must divide the mesh size; the training loop guarantees this
    via drop_last + a batch-size check.
    """
    s = batch_sharding(mesh, axis_name)

    def put(x):
        n = mesh.devices.size
        if x.shape[0] % n != 0:
            raise ValueError(
                f"batch size {x.shape[0]} not divisible by mesh size {n}"
            )
        return jax.device_put(x, s)

    return jax.tree_util.tree_map(put, batch)
