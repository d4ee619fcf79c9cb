"""Shared layer utilities and weight initializers.

Initialization matches the reference exactly:
  * DCGAN init — conv/conv-transpose weights ~ N(0, 0.02); BatchNorm scale
    ~ N(1, 0.02), bias 0 (reference ``src/bootstrap.py:17-27``).
  * The reference's ``_weights_init`` only touches classes whose name contains
    "Conv" or "BatchNorm", so the MNIST MLP keeps torch's default Linear init:
    weight and bias ~ U(-1/sqrt(fan_in), +1/sqrt(fan_in)) (kaiming_uniform with
    a=sqrt(5) reduces to exactly this bound).

Layout is NHWC with HWIO kernels (the TPU-native layout; the reference's NCHW
is a CUDA/cuDNN convention and is converted only at the IO edges).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

DCGAN_W_STD = 0.02
# BatchNorm running-average momentum for every built-in model
# (flax momentum 0.9 == torch momentum 0.1, the torch default the reference
# models use). engine.state.apply_train_pair's chained-stats formula depends
# on this value — keep them in sync through this constant.
BN_MOMENTUM = 0.9


def dcgan_conv_init(key, shape, dtype=jnp.float32):
    """N(0, 0.02) — reference ``bootstrap.py:23-24``."""
    return jax.random.normal(key, shape, dtype) * DCGAN_W_STD


def bn_scale_init(key, shape, dtype=jnp.float32):
    """N(1, 0.02) — reference ``bootstrap.py:26``."""
    return 1.0 + jax.random.normal(key, shape, dtype) * DCGAN_W_STD


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    Flax Dense kernels are (fan_in, fan_out).
    """
    bound = 1.0 / jnp.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchLinearBiasInit:
    """torch Linear bias init needs fan_in, which flax bias init can't see;
    capture it explicitly."""

    def __init__(self, fan_in: int):
        self.fan_in = fan_in

    def __call__(self, key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(jnp.asarray(self.fan_in, dtype))
        return jax.random.uniform(key, shape, dtype, -bound, bound)


def leaky_relu(x, negative_slope: float = 0.2):
    return jnp.where(x >= 0, x, negative_slope * x)


class ConvBlock(nn.Module):
    """Conv (k4 s2 'SAME' by default) + optional BatchNorm + LeakyReLU.

    One DCGAN discriminator stage (reference ``src/datasets/CIFAR10.py:85-95``).
    'SAME' with stride 2 and kernel 4 pads (1, 1) — identical to torch p=1.
    """

    features: int
    kernel: int = 4
    stride: int = 2
    padding: str = "SAME"
    use_bias: bool = False
    use_bn: bool = True
    slope: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        # biased convs (the CelebA cv2/cv3 quirk) keep torch's default bias
        # init U(+-1/sqrt(fan_in)); the reference's _weights_init never
        # touches conv biases (bootstrap.py:22-27)
        fan_in = x.shape[-1] * self.kernel * self.kernel
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=self.padding,
            use_bias=self.use_bias,
            kernel_init=dcgan_conv_init,
            bias_init=TorchLinearBiasInit(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=1e-5,
                scale_init=bn_scale_init,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
        return leaky_relu(x, self.slope)


class ConvTransposeBlock(nn.Module):
    """ConvTranspose + optional BatchNorm + ReLU.

    One DCGAN generator stage (reference ``src/datasets/CIFAR10.py:116-129``).
    torch ConvTranspose2d(k=4, s=2, p=1) doubles spatial dims == flax 'SAME';
    (k=4, s=1, p=0) maps 1x1 -> 4x4 == flax 'VALID'.
    """

    features: int
    kernel: int = 4
    stride: int = 2
    padding: str = "SAME"
    use_bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.ConvTranspose(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=self.padding,
            use_bias=False,
            kernel_init=dcgan_conv_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=1e-5,
                scale_init=bn_scale_init,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
        return nn.relu(x)
