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

import functools

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


def put_global_batch(batch, sharding: NamedSharding):
    """Ship a host batch to the mesh with the leading axis sharded.

    Single-process: a plain ``device_put``. Multi-process (after
    ``jax.distributed.initialize``): ``batch`` is this PROCESS's slice of
    the global batch — the standard JAX multi-host input convention — and
    the global array is assembled from the per-host shards with
    ``jax.make_array_from_process_local_data`` (``device_put`` cannot
    place host data on another process's devices). Every host must feed
    the same local batch size; the 1-D mesh orders devices by process, so
    host ``i``'s rows land at ``parallel.distributed.process_batch_slice``
    positions of the global batch.

    With a fully REPLICATED sharding (the sweep's trial groups feed every
    device the same batch) there is no slicing convention: every host
    passes the SAME full batch and ``device_put`` replicates it across the
    global mesh directly."""
    n_proc = jax.process_count()

    def put(x):
        if n_proc > 1 and not sharding.is_fully_replicated:
            gshape = (x.shape[0] * n_proc,) + tuple(x.shape[1:])
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x), gshape)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def put_from_full(x, sharding: NamedSharding):
    """Place an array EVERY HOST HOLDS IN FULL onto a (possibly
    cross-process) sharding — the multi-host sweep's trial-axis puts:
    each host samples the same trials (same seed), so the full stacked
    array exists everywhere and each host contributes its addressable
    shards. ``device_put`` to a non-replicated cross-process sharding is
    not supported; ``make_array_from_callback`` slices the host copy
    per-shard instead. Single-process this IS ``device_put``."""
    if jax.process_count() == 1 or sharding.is_fully_replicated:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def fetch_replicated(a) -> np.ndarray:
    """``np.asarray`` for a possibly cross-process array: a multi-host
    sharded array spans non-addressable devices and cannot be fetched
    wholesale, so re-lay it out fully replicated first (one XLA
    all-gather over the mesh — every host then reads its local replica).
    Single-process (or an already fully-replicated / fully-addressable
    array) this is a plain fetch."""
    if (not isinstance(a, jax.Array) or a.is_fully_addressable
            or a.is_fully_replicated):
        return np.asarray(a)
    mesh = a.sharding.mesh
    rep = NamedSharding(mesh, P())
    return np.asarray(reshard_fn(rep)(a))


@functools.lru_cache(maxsize=32)
def reshard_fn(sharding: NamedSharding):
    """Jitted identity that re-lays its input onto ``sharding``, cached per
    sharding — a fresh ``jax.jit(lambda ...)`` per call would defeat jit's
    function-identity trace cache and recompile the all-gather every epoch
    (seconds-to-minutes through a remote-compile tunnel). Bounded cache: a
    training run uses a handful of shardings, but long-lived sweep/serving
    processes can build many meshes over their lifetime and an unbounded
    cache would pin every mesh + compiled executable forever."""
    return jax.jit(lambda x: x, out_shardings=sharding)


def local_rows(a) -> np.ndarray:
    """Process-local rows of a batch-sharded array, as numpy.

    Multi-host, a batch-sharded global ``jax.Array`` cannot be fetched
    wholesale (it spans non-addressable devices). Host-side consumers that
    only need SOME real samples (e.g. logging a couple of validation
    images) get the rows this process owns, ordered by global position —
    host 0's rows are global rows ``[0, per_host)``."""
    if jax.process_count() == 1:
        return np.asarray(a)
    shards = sorted(a.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a (tuple of) NHWC array(s) with the batch dim sharded.

    The GLOBAL batch size must divide the mesh size; the training loop
    guarantees this via drop_last + a batch-size check. Multi-process,
    ``batch`` is this host's slice of the global batch (see
    ``put_global_batch``).
    """
    s = batch_sharding(mesh, axis_name)
    n = mesh.devices.size
    n_proc = jax.process_count()

    def check(x):
        if (x.shape[0] * n_proc) % n != 0:
            raise ValueError(
                f"global batch size {x.shape[0] * n_proc} not divisible "
                f"by mesh size {n}"
            )
        return x

    return put_global_batch(jax.tree_util.tree_map(check, batch), s)
