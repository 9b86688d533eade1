from densereg_tpu.train.state import (
    TrainState,
    create_train_state,
    loss_fn,
    weight_decay_loss,
)
from densereg_tpu.train.step import (
    make_fused_train_step,
    make_train_step,
    train_step_single,
)
from densereg_tpu.train.lr import staircase_exponential_decay

__all__ = [
    "TrainState",
    "create_train_state",
    "loss_fn",
    "weight_decay_loss",
    "make_fused_train_step",
    "make_train_step",
    "train_step_single",
    "staircase_exponential_decay",
]
