"""DCGAN pair for 64x64 images (CelebA).

Rebuilds the behavior of reference ``src/datasets/CelebA.py:75-142``, including
its quirks, which we preserve deliberately:

Discriminator (reference lines 75-101):
    cv1: Conv(3  ->  64, k4 s2 p1, no bias)       + LeakyReLU(**0.01**)
         (the reference calls ``F.leaky_relu(x)`` with the torch default
         slope 0.01 on this layer only)
    cv2: Conv(64 -> 128, k4 s2 p1, **bias=True**) + BN + LeakyReLU(0.2)
    cv3: Conv(128-> 256, k4 s2 p1, **bias=True**) + BN + LeakyReLU(0.2)
    cv4: Conv(256-> 512, k4 s2 p1, no bias)       + BN + LeakyReLU(0.2)
    cv5: Conv(512->   1, k4 s1 p0, no bias)       -> logit

Generator (reference lines 104-142): standard 5-stage DCGAN-64,
    ConvT(z->512, k4 s1 p0) + BN + ReLU, then 4x ConvT(k4 s2 p1) halving
    channels 512->256->128->64->3 with BN+ReLU except the tanh output stage.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mdgan_tpu.models.layers import ConvBlock, ConvTransposeBlock, Dtype, dcgan_conv_init

SHAPE = (64, 64, 3)
Z_DIM = 100
NDF = 64
NGF = 64


class DCGANDiscriminator64(nn.Module):
    ndf: int = NDF
    channels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        b = x.shape[0]
        x = x.astype(self.dtype)
        x = ConvBlock(self.ndf, use_bn=False, slope=0.01, dtype=self.dtype)(x, train)   # 64->32
        x = ConvBlock(self.ndf * 2, use_bias=True, dtype=self.dtype)(x, train)          # 32->16
        x = ConvBlock(self.ndf * 4, use_bias=True, dtype=self.dtype)(x, train)          # 16->8
        x = ConvBlock(self.ndf * 8, dtype=self.dtype)(x, train)                         # 8->4
        x = nn.Conv(
            1, (4, 4), strides=(1, 1), padding="VALID", use_bias=False,
            kernel_init=dcgan_conv_init, dtype=self.dtype, param_dtype=jnp.float32,
        )(x)                                                                             # 4->1
        return x.reshape(b).astype(jnp.float32)  # logits


class DCGANGenerator64(nn.Module):
    ngf: int = NGF
    channels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        b = z.shape[0]
        x = z.reshape(b, 1, 1, -1).astype(self.dtype)
        x = ConvTransposeBlock(self.ngf * 8, stride=1, padding="VALID",
                               dtype=self.dtype)(x, train)                               # 1->4
        x = ConvTransposeBlock(self.ngf * 4, dtype=self.dtype)(x, train)                 # 4->8
        x = ConvTransposeBlock(self.ngf * 2, dtype=self.dtype)(x, train)                 # 8->16
        x = ConvTransposeBlock(self.ngf, dtype=self.dtype)(x, train)                     # 16->32
        x = nn.ConvTranspose(
            self.channels, (4, 4), strides=(2, 2), padding="SAME", use_bias=False,
            kernel_init=dcgan_conv_init, dtype=self.dtype, param_dtype=jnp.float32,
        )(x)                                                                             # 32->64
        return jnp.tanh(x.astype(jnp.float32))
