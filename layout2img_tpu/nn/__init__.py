"""Flax modules: spectrally-normalized layers, TPU-native sync BN, ISLA norm,
context attention, GAN res-blocks, and mask regression."""

from layout2img_tpu.nn.spectral import SNDense, SNConv, SNEmbed, spectral_sigma
from layout2img_tpu.nn.norms import SyncBatchNorm, InstanceNorm2d, SpatialAdaptiveNorm
from layout2img_tpu.nn.attention import BoxMultiHeadedAttention, MultiHeadAttention
from layout2img_tpu.nn.mask_regress import MaskRegressNet, MaskRegressNetV2
from layout2img_tpu.nn.blocks import GenResBlock, DiscResBlock, DiscOptimizedBlock, PSPModule

__all__ = [
    "SNDense",
    "SNConv",
    "SNEmbed",
    "spectral_sigma",
    "SyncBatchNorm",
    "InstanceNorm2d",
    "SpatialAdaptiveNorm",
    "BoxMultiHeadedAttention",
    "MultiHeadAttention",
    "MaskRegressNet",
    "MaskRegressNetV2",
    "GenResBlock",
    "DiscResBlock",
    "DiscOptimizedBlock",
    "PSPModule",
]
