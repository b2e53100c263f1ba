from .lr_control import ReduceLROnPlateau
from .loop import TrainState, make_optimizer, make_train_step, train_model
from .checkpoint import save_checkpoint, restore_checkpoint, restore_params

__all__ = [
    "ReduceLROnPlateau",
    "TrainState",
    "make_optimizer",
    "make_train_step",
    "train_model",
    "save_checkpoint",
    "restore_checkpoint",
    "restore_params",
]
