from conceptattention_tpu.training.train_step import (
    flow_matching_loss,
    make_train_step,
    init_train_state,
)

from conceptattention_tpu.training.train_loop import (
    TrainConfig,
    make_optimizer,
    train_loop,
)

__all__ = [
    "flow_matching_loss", "make_train_step", "init_train_state",
    "TrainConfig", "make_optimizer", "train_loop",
]
