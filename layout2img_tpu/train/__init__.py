from layout2img_tpu.train.state import GANTrainState, create_train_state, TrainConfig
from layout2img_tpu.train.step import make_train_step, make_sample_fn

__all__ = [
    "GANTrainState",
    "create_train_state",
    "TrainConfig",
    "make_train_step",
    "make_sample_fn",
]
