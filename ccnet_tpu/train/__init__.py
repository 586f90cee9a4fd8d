from ccnet_tpu.train.optim import poly_schedule, make_optimizer
from ccnet_tpu.train.state import TrainState, create_train_state
from ccnet_tpu.train.step import make_train_step

__all__ = [
    "poly_schedule",
    "make_optimizer",
    "TrainState",
    "create_train_state",
    "make_train_step",
]
