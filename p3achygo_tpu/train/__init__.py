"""Learner: train step, optimizers, LR schedules, SWA."""
from p3achygo_tpu.train.lr_schedule import (  # noqa: F401
    constant_lr,
    cyclic_lr,
    cyclic_lr_decay,
)
from p3achygo_tpu.train.optimizer import conv_muon, sgd_nesterov  # noqa: F401
from p3achygo_tpu.train.step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
)
