"""Model zoo: LostGAN-family generators/discriminators and the layout2im
CVAE-GAN family, all TPU-native."""

from layout2img_tpu.models.generators import (
    LostGANGenerator,
    BgFgGenerator,
    make_generator,
)
from layout2img_tpu.models.discriminators import (
    LayoutDiscriminator,
    make_discriminator,
)

__all__ = [
    "LostGANGenerator",
    "BgFgGenerator",
    "make_generator",
    "LayoutDiscriminator",
    "make_discriminator",
]
