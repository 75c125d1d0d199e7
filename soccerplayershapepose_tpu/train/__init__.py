"""Self-supervised distillation trainer + checkpointing."""

from soccerplayershapepose_tpu.train.distill import (  # noqa: F401
    TrainState, make_train_state, make_train_step, make_eval_step)
