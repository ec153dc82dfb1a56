from dmnerf_tpu.train.schedule import exp_decay_schedule
from dmnerf_tpu.train.step import TrainState, create_train_state, make_train_step

__all__ = ["exp_decay_schedule", "TrainState", "create_train_state", "make_train_step"]
