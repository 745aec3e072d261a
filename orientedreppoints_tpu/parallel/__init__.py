from .infer import data_mesh, round_up_batch, shard_infer
from .train import TrainState, build_optimizer, make_train_step, lr_schedule

__all__ = [
    "TrainState", "build_optimizer", "make_train_step", "lr_schedule",
    "data_mesh", "round_up_batch", "shard_infer",
]
