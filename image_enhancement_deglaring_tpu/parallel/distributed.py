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
