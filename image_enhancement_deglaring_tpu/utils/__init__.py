from .seeding import set_seed
from .explog import ExperimentLogger
from .config import TrainConfig, EvalConfig, ServeConfig, SweepConfig, DataConfig
from .envfile import load_dotenv
from .profiling import StepTimer, start_trace_server, trace

__all__ = [
    "set_seed",
    "ExperimentLogger",
    "TrainConfig",
    "EvalConfig",
    "ServeConfig",
    "SweepConfig",
    "DataConfig",
    "load_dotenv",
    "StepTimer",
    "start_trace_server",
    "trace",
]
