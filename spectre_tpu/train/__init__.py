from spectre_tpu.train.optim import make_optimizer
from spectre_tpu.train.state import TrainState, create_train_state
from spectre_tpu.train.step import (
    cross_entropy_loss,
    distill_loss,
    make_distill_step,
    make_eval_step,
    make_train_step,
)

__all__ = [
    "make_optimizer",
    "TrainState",
    "create_train_state",
    "cross_entropy_loss",
    "distill_loss",
    "make_train_step",
    "make_eval_step",
    "make_distill_step",
]
