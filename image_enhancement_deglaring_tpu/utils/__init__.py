from .seeding import set_seed
from .explog import ExperimentLogger
from .config import TrainConfig, EvalConfig, ServeConfig, SweepConfig, DataConfig

__all__ = [
    "set_seed",
    "ExperimentLogger",
    "TrainConfig",
    "EvalConfig",
    "ServeConfig",
    "SweepConfig",
    "DataConfig",
]
