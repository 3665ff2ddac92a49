from .train import (
    TrainConfig,
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
    make_distill_step,
    schedule,
    average_params,
)
from .manager import ManagerConfig, TrainingManager

__all__ = [
    "TrainConfig",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "make_distill_step",
    "schedule",
    "average_params",
    "ManagerConfig",
    "TrainingManager",
]
