"""MLP GAN pair for MNIST.

Rebuilds the behavior of reference ``src/datasets/MNIST.py:74-120``:
  * Discriminator: 784 -> 1024 -> 512 -> 256 -> 1, LeakyReLU(0.2) +
    Dropout(0.3) after each hidden layer, sigmoid head.
  * Generator: 100 -> 256 -> 512 -> 1024 -> 784, LeakyReLU(0.2), tanh head.

Differences (deliberate, TPU-native):
  * The discriminator returns **logits**; the sigmoid lives in the loss
    (numerically stable softplus forms) and in the inference wrapper.
  * Images are NHWC (28, 28, 1).
  * Linear layers keep torch's *default* init (the reference's DCGAN
    ``_weights_init`` never matches ``nn.Linear`` — see models/layers.py).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mdgan_tpu.models.layers import (
    Dtype,
    TorchLinearBiasInit,
    leaky_relu,
    torch_linear_kernel_init,
)

SHAPE = (28, 28, 1)  # H, W, C
Z_DIM = 100


def _dense(features: int, fan_in: int, dtype):
    return nn.Dense(
        features,
        kernel_init=torch_linear_kernel_init,
        bias_init=TorchLinearBiasInit(fan_in),
        dtype=dtype,
        param_dtype=jnp.float32,
    )


class MLPDiscriminator(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        b = x.shape[0]
        x = x.reshape(b, -1).astype(self.dtype)
        dims = [1024, 512, 256]
        fan = x.shape[-1]
        for d in dims:
            x = _dense(d, fan, self.dtype)(x)
            x = leaky_relu(x, 0.2)
            x = nn.Dropout(0.3, deterministic=not train)(x)
            fan = d
        x = _dense(1, fan, self.dtype)(x)
        return x.reshape(b).astype(jnp.float32)  # logits


class MLPGenerator(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        b = z.shape[0]
        x = z.reshape(b, -1).astype(self.dtype)
        fan = x.shape[-1]
        for d in [256, 512, 1024]:
            x = _dense(d, fan, self.dtype)(x)
            x = leaky_relu(x, 0.2)
            fan = d
        x = _dense(SHAPE[0] * SHAPE[1] * SHAPE[2], fan, self.dtype)(x)
        x = jnp.tanh(x.astype(jnp.float32))
        return x.reshape(b, *SHAPE)
