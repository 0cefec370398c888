from conceptattention_tpu.training.train_step import (
    flow_matching_loss,
    make_train_step,
    init_train_state,
)

__all__ = ["flow_matching_loss", "make_train_step", "init_train_state"]
