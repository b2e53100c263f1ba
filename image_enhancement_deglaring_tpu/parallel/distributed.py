"""Multi-host (multi-slice / multi-process) initialization.

The reference has no distributed backend at all (no torch.distributed,
NCCL, or MPI anywhere). On TPU pods the equivalent is
``jax.distributed.initialize`` + compiler-scheduled collectives: each host
process sees its local chips, the global mesh spans all of them, ICI
carries intra-slice collectives and DCN carries cross-slice traffic.

Usage on each host of a pod slice (TPU VMs auto-discover coordinator):

    from image_enhancement_deglaring_tpu.parallel import distributed
    distributed.initialize()            # before any other jax call
    mesh = distributed.global_mesh()    # 1-D data mesh over ALL chips

Training code is unchanged: the train step is jitted over the global mesh;
each process feeds only its local shard of the batch
(``process_batch_slice`` gives the per-host slice bounds).
"""

from __future__ import annotations

import jax

from .mesh import make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize the distributed runtime (no-op if single-process).

    On TPU VMs all arguments are auto-detected from the environment.
    With EXPLICIT arguments a failure re-raises: swallowing a typo'd
    coordinator address would silently fall back to independent
    single-host runs that stomp each other's checkpoints.
    """
    explicit = any(a is not None
                   for a in (coordinator_address, num_processes, process_id))
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        if explicit:
            raise
        # auto-detect mode: already initialized, or single-process env
        pass
    if jax.process_count() > 1:
        # Create the cross-host collective context NOW, while every rank
        # is in lockstep (all just left initialize's coordination
        # barrier). The first collective context handshake runs under a
        # short backend deadline (~30 s for Gloo key exchange); if it is
        # instead triggered lazily by the first device_put/psum, ranks
        # can be minutes apart (compilation skew) and the handshake
        # times out spuriously.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("distributed_init_warmup")


def global_mesh(axis_name: str = "data"):
    """1-D mesh over every chip of every host."""
    return make_mesh(axis_name=axis_name)


def process_batch_slice(global_batch: int) -> tuple[int, int]:
    """[start, end) of this host's slice of a global batch."""
    n_proc = jax.process_count()
    if global_batch % n_proc != 0:
        raise ValueError(
            f"process count {n_proc} must divide global batch {global_batch}"
        )
    per = global_batch // n_proc
    i = jax.process_index()
    return i * per, (i + 1) * per


class LocalSliceLoader:
    """Wraps a deterministic GLOBAL-batch loader; yields this host's slice
    of every batch (the standard JAX multi-host input convention —
    ``parallel.mesh.put_global_batch`` reassembles the global array).

    Every host must construct an identical underlying loader (same data
    directory, seed, batch size, split): the seeded pipeline then produces
    the same global batch order everywhere, so the per-host slices are
    disjoint and cover each batch. A ragged final batch is truncated to a
    multiple of the process count (up to ``process_count - 1`` samples);
    training batches are already uniform via drop_last, so this only
    shaves the tail of a ragged validation batch.

    Decode cost: when the underlying loader supports
    ``set_batch_slice(rank, world)`` (the package's ``_Loader`` does),
    slicing happens BEFORE decode — each host decodes only its own rows
    (1/n of the work), yielding bit-identical batches because the index
    order is globally seeded and augmentation seeds are per-index.
    Loaders without that hook fall back to decode-then-slice.
    """

    def __init__(self, loader):
        self.loader = loader
        self._n = jax.process_count()
        self._i = jax.process_index()
        self._pre_sliced = hasattr(loader, "set_batch_slice")
        if self._pre_sliced:
            loader.set_batch_slice(self._i, self._n)

    def __len__(self):
        if self._pre_sliced or self._n == 1:
            # pre-sliced: the underlying _Loader's len already excludes
            # skipped sub-world batches
            return len(self.loader)
        # fallback path: batches with fewer rows than process_count are
        # skipped in __iter__; the skip rule lives in ONE place
        # (data.dataset.sliced_batch_count) so this count cannot drift
        # from _Loader's
        g = int(getattr(self.loader, "batch_size", 0) or 0)
        ns = int(getattr(self.loader, "num_samples", 0) or 0)
        if not (g and ns):
            return len(self.loader)
        from ..data.dataset import sliced_batch_count

        # drop_last is inferred: a loader already excluding the ragged
        # tail reports len == num_samples // batch_size
        return sliced_batch_count(ns, g, self._n,
                                  drop_last=len(self.loader) <= ns // g)

    @property
    def batch_size(self):
        g = int(getattr(self.loader, "batch_size", 0) or 0)
        return g // self._n if g else 0

    @property
    def num_samples(self):
        """Per-host usable sample count (global // world). Slightly lossy
        on ragged tails — rows beyond a world multiple are dropped by the
        slicer, so this is the floor, not the global count."""
        g = int(getattr(self.loader, "num_samples", 0) or 0)
        return g // self._n

    @property
    def num_workers(self):
        return getattr(self.loader, "num_workers", 0)

    def set_epoch(self, epoch: int) -> None:
        if hasattr(self.loader, "set_epoch"):
            self.loader.set_epoch(epoch)

    def __iter__(self):
        if self._pre_sliced:
            # underlying loader already yields only this host's rows
            yield from self.loader
            return
        for batch in self.loader:
            b = batch[0].shape[0]
            usable = (b // self._n) * self._n
            if usable == 0:
                continue
            per = usable // self._n
            s = self._i * per
            yield tuple(x[s:s + per] for x in batch)
