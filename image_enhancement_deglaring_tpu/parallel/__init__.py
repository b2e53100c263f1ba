from .mesh import make_mesh, replicate, shard_batch, batch_sharding, replicated_sharding
from .sweep import (
    SearchSpace,
    WandbSweepMirror,
    Trial,
    VmappedTrialGroup,
    hyperband_rungs,
    run_sweep,
    run_sweep_from_config,
    sample_random,
    sample_tpe,
)

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "batch_sharding",
    "replicated_sharding",
    "SearchSpace",
    "WandbSweepMirror",
    "Trial",
    "VmappedTrialGroup",
    "hyperband_rungs",
    "run_sweep",
    "run_sweep_from_config",
    "sample_random",
    "sample_tpe",
]
