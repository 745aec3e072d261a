from .train import TrainState, build_optimizer, make_train_step, lr_schedule

__all__ = ["TrainState", "build_optimizer", "make_train_step", "lr_schedule"]
