from layout2img_tpu.losses.gan import (
    hinge_d_real,
    hinge_d_fake,
    g_adv,
    masked_mean,
)
from layout2img_tpu.losses.perceptual import VGG19Features, VGGLoss

__all__ = [
    "hinge_d_real",
    "hinge_d_fake",
    "g_adv",
    "masked_mean",
    "VGG19Features",
    "VGGLoss",
]
