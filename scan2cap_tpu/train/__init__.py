"""Training loop: pjit step builders, schedules, solver, checkpoints."""

from scan2cap_tpu.train.step import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)

__all__ = ["TrainState", "create_train_state", "make_train_step", "make_eval_step"]
