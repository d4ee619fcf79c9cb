"""StyleGAN2-style generator/discriminator for 128x128 images (stretch model).

The reference stops at DCGAN-64; this family is the BASELINE.json stretch
config ("StyleGAN2-style FFHQ-128 multi-discriminator").  It is a compact but
faithful-to-type StyleGAN2:

  * 8-layer mapping network z -> w (512-d style space)
  * synthesis from a learned 4x4 constant through modulated 3x3 convolutions
    with exact weight demodulation (input-scale + output-demodulate form,
    mathematically identical to per-sample weight modulation), optional noise
    injection, and a skip (tRGB-sum) output path
  * residual discriminator with a minibatch-stddev layer before the head

Interface-compatible with the MD-GAN engine: G maps (b, z_dim) -> images in
[-1, 1]; D maps images -> (b,) logits.  Noise injection draws from the
``dropout`` RNG collection when provided and is skipped (deterministic
synthesis) otherwise, so the engine needs no special-casing.

Upsampling is resize+conv (a common anti-checkerboard simplification of
StyleGAN2's blur + transposed conv).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

SHAPE = (128, 128, 3)
Z_DIM = 512
W_DIM = 512

Dtype = Any


def _lrelu(x):
    # StyleGAN2 uses slope 0.2 with sqrt(2) gain
    return jnp.where(x >= 0, x, 0.2 * x) * math.sqrt(2.0)


class EqualDense(nn.Module):
    """Equalized-lr dense: unit-normal init, runtime he-scaling."""

    features: int
    lr_mul: float = 1.0
    bias_init: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        w = self.param("kernel", nn.initializers.normal(1.0 / self.lr_mul),
                       (fan_in, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.constant(self.bias_init),
                       (self.features,), jnp.float32)
        scale = self.lr_mul / math.sqrt(fan_in)
        return (x.astype(self.dtype) @ (w * scale).astype(self.dtype)
                + (b * self.lr_mul).astype(self.dtype))


class MappingNetwork(nn.Module):
    layers: int = 8
    w_dim: int = W_DIM
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        x = z.astype(self.dtype)
        x = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + 1e-8)
        for _ in range(self.layers):
            x = _lrelu(EqualDense(self.w_dim, lr_mul=0.01, dtype=self.dtype)(x))
        return x


class ModulatedConv(nn.Module):
    """3x3 modulated conv with exact demodulation.

    Per-sample weight modulation w'[k,i,o] = w[k,i,o] * s[i] followed by
    demodulation d[o] = rsqrt(sum_ki w'^2) is computed as: scale inputs by s,
    convolve with the shared kernel, scale outputs by d — identical math, no
    per-sample kernels.
    """

    features: int
    kernel: int = 3
    demodulate: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, style_w):
        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.normal(1.0),
                       (self.kernel, self.kernel, cin, self.features), jnp.float32)
        he = 1.0 / math.sqrt(self.kernel * self.kernel * cin)
        s = EqualDense(cin, bias_init=1.0, dtype=jnp.float32,
                       name="mod")(style_w.astype(jnp.float32))  # (b, cin)
        wk = (w * he).astype(jnp.float32)
        if self.demodulate:
            # d[b, o] over the modulated kernel
            d = jax.lax.rsqrt(
                jnp.einsum("klio,bi->bo", wk * wk, s * s) + 1e-8)
        x = x * s[:, None, None, :].astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), wk.astype(self.dtype), (1, 1),
            ((self.kernel // 2,) * 2, (self.kernel // 2,) * 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.demodulate:
            y = y * d[:, None, None, :].astype(y.dtype)
        return y


class SynthesisBlock(nn.Module):
    features: int
    up: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, style_w, noise_rng=None):
        if self.up:
            b, h, w_, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w_ * 2, c), "nearest")
        for i in range(2):
            x = ModulatedConv(self.features, dtype=self.dtype,
                              name=f"conv{i}")(x, style_w)
            gain = self.param(f"noise_gain{i}", nn.initializers.zeros, (), jnp.float32)
            if noise_rng is not None:
                noise = jax.random.normal(
                    jax.random.fold_in(noise_rng, i), x.shape[:3] + (1,), jnp.float32)
                x = x + (gain * noise).astype(x.dtype)
            bias = self.param(f"bias{i}", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            x = _lrelu(x + bias.astype(x.dtype))
        return x


class StyleGAN2Generator(nn.Module):
    channels: int = 3
    base_features: int = 512
    max_res: int = 128
    map_layers: int = 8
    dtype: Dtype = jnp.float32

    def feats(self, res: int) -> int:
        # base_features down to 64 as resolution grows
        return max(min(self.base_features, 16 * self.base_features // res),
                   min(64, self.base_features))

    @nn.compact
    def __call__(self, z, train: bool = True):
        b = z.shape[0]
        w_style = MappingNetwork(layers=self.map_layers, w_dim=self.base_features,
                                 dtype=self.dtype)(z)
        noise_rng = self.make_rng("dropout") if self.has_rng("dropout") else None

        const = self.param("const", nn.initializers.normal(1.0),
                           (4, 4, self.feats(4)), jnp.float32)
        x = jnp.broadcast_to(const.astype(self.dtype), (b, 4, 4, self.feats(4)))
        rgb = None
        res = 4
        block_i = 0
        while True:
            rng_i = (jax.random.fold_in(noise_rng, block_i)
                     if noise_rng is not None else None)
            x = SynthesisBlock(self.feats(res), up=res > 4, dtype=self.dtype,
                               name=f"b{res}")(x, w_style, rng_i)
            t = ModulatedConv(self.channels, kernel=1, demodulate=False,
                              dtype=self.dtype, name=f"trgb{res}")(x, w_style)
            rgb = t if rgb is None else jax.image.resize(
                rgb, t.shape, "nearest") + t
            if res == self.max_res:
                break
            res *= 2
            block_i += 1
        return jnp.tanh(rgb.astype(jnp.float32))


class ResBlock(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        skip = nn.Conv(self.features, (1, 1), strides=(2, 2), use_bias=False,
                       kernel_init=nn.initializers.normal(0.02),
                       dtype=self.dtype, param_dtype=jnp.float32)(x)
        y = _lrelu(nn.Conv(x.shape[-1], (3, 3), padding="SAME",
                           kernel_init=nn.initializers.normal(0.02),
                           dtype=self.dtype, param_dtype=jnp.float32)(x))
        y = _lrelu(nn.Conv(self.features, (3, 3), strides=(2, 2), padding="SAME",
                           kernel_init=nn.initializers.normal(0.02),
                           dtype=self.dtype, param_dtype=jnp.float32)(y))
        return (y + skip) / math.sqrt(2.0)


def minibatch_stddev(x, group_size: int = 4):
    """StyleGAN2 minibatch-stddev: append the cross-sample feature stddev as
    one constant channel (gives D a density cue against mode collapse)."""
    b, h, w, c = x.shape
    g = min(group_size, b)
    g = b // (b // g) if b % g else g
    while b % g:
        g -= 1
    y = x.reshape(g, b // g, h, w, c).astype(jnp.float32)
    y = y - y.mean(axis=0, keepdims=True)
    y = jnp.sqrt((y * y).mean(axis=0) + 1e-8).mean(axis=(1, 2, 3))  # (b//g,)
    # sample s sits at reshape position (s // (b//g), s % (b//g)), i.e. its
    # group statistic is y[s % (b//g)] -> tile, not repeat
    y = jnp.tile(y, g)[:, None, None, None]
    return jnp.concatenate([x, jnp.broadcast_to(y.astype(x.dtype), (b, h, w, 1))],
                           axis=-1)


class StyleGAN2Discriminator(nn.Module):
    channels: int = 3
    max_res: int = 128
    base_features: int = 512
    dtype: Dtype = jnp.float32

    def feats(self, res: int) -> int:
        return max(min(self.base_features, 16 * self.base_features // res),
                   min(64, self.base_features))

    @nn.compact
    def __call__(self, x, train: bool = True):
        b = x.shape[0]
        res = self.max_res
        y = _lrelu(nn.Conv(self.feats(res), (1, 1),
                           kernel_init=nn.initializers.normal(0.02),
                           dtype=self.dtype, param_dtype=jnp.float32)(x.astype(self.dtype)))
        while res > 4:
            y = ResBlock(self.feats(res // 2), dtype=self.dtype,
                         name=f"b{res}")(y)
            res //= 2
        y = minibatch_stddev(y)
        y = _lrelu(nn.Conv(self.feats(4), (3, 3), padding="SAME",
                           kernel_init=nn.initializers.normal(0.02),
                           dtype=self.dtype, param_dtype=jnp.float32)(y))
        y = y.reshape(b, -1)
        y = _lrelu(EqualDense(self.feats(4), dtype=self.dtype)(y))
        return EqualDense(1, dtype=self.dtype)(y).reshape(b).astype(jnp.float32)
