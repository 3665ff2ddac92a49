from .train import (
    TrainConfig,
    TrainState,
    create_train_state,
    make_train_step,
    schedule,
    average_params,
)

__all__ = [
    "TrainConfig",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "schedule",
    "average_params",
]
