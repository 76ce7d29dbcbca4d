"""Training subsystem: metrics, jitted train step, checkpoints, driver."""

from nerf_simple_tpu.train.metrics import img_mse, img_psnr
from nerf_simple_tpu.train.step import TrainState, make_train_state, build_train_step
from nerf_simple_tpu.train.loop import train

__all__ = [
    "img_mse",
    "img_psnr",
    "TrainState",
    "make_train_state",
    "build_train_step",
    "train",
]
