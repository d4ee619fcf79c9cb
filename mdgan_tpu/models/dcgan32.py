"""DCGAN pair for 32x32 images (CIFAR-10).

Rebuilds the behavior of reference ``src/datasets/CIFAR10.py:76-140``
(the primary benchmark model):

Discriminator (reference lines 83-98):
    Conv(3 ->  64, k4 s2 p1, no bias)            + LeakyReLU(0.2)
    Conv(64 -> 128, k4 s2 p1, no bias) + BN      + LeakyReLU(0.2)
    Conv(128-> 256, k4 s2 p1, no bias) + BN      + LeakyReLU(0.2)
    Conv(256->   1, k4 s1 p0, no bias)           -> scalar logit
(The reference applies sigmoid in the model; here the sigmoid lives in the
loss / inference wrapper.)

Generator (reference lines 116-133):
    ConvT(z  -> 512, k4 s1 p0, no bias) + BN + ReLU   # 1x1 -> 4x4
    ConvT(512-> 256, k4 s2 p1, no bias) + BN + ReLU   # 4 -> 8
    ConvT(256-> 128, k4 s2 p1, no bias) + BN + ReLU   # 8 -> 16
    ConvT(128->   3, k4 s2 p1, no bias) + tanh        # 16 -> 32

Layout: NHWC; init per models/layers.py (reference ``bootstrap.py:17-27``).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mdgan_tpu.models.layers import ConvBlock, ConvTransposeBlock, Dtype, dcgan_conv_init

SHAPE = (32, 32, 3)
Z_DIM = 100
NDF = 64
NGF = 64


class DCGANDiscriminator32(nn.Module):
    ndf: int = NDF
    channels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        b = x.shape[0]
        x = x.astype(self.dtype)
        x = ConvBlock(self.ndf, use_bn=False, dtype=self.dtype)(x, train)       # 32 -> 16
        x = ConvBlock(self.ndf * 2, dtype=self.dtype)(x, train)                 # 16 -> 8
        x = ConvBlock(self.ndf * 4, dtype=self.dtype)(x, train)                 # 8 -> 4
        x = nn.Conv(
            1, (4, 4), strides=(1, 1), padding="VALID", use_bias=False,
            kernel_init=dcgan_conv_init, dtype=self.dtype, param_dtype=jnp.float32,
        )(x)                                                                     # 4 -> 1
        return x.reshape(b).astype(jnp.float32)  # logits


class DCGANGenerator32(nn.Module):
    ngf: int = NGF
    channels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        b = z.shape[0]
        x = z.reshape(b, 1, 1, -1).astype(self.dtype)
        x = ConvTransposeBlock(self.ngf * 8, stride=1, padding="VALID",
                               dtype=self.dtype)(x, train)                       # 1 -> 4
        x = ConvTransposeBlock(self.ngf * 4, dtype=self.dtype)(x, train)         # 4 -> 8
        x = ConvTransposeBlock(self.ngf * 2, dtype=self.dtype)(x, train)         # 8 -> 16
        x = nn.ConvTranspose(
            self.channels, (4, 4), strides=(2, 2), padding="SAME", use_bias=False,
            kernel_init=dcgan_conv_init, dtype=self.dtype, param_dtype=jnp.float32,
        )(x)                                                                     # 16 -> 32
        return jnp.tanh(x.astype(jnp.float32))
