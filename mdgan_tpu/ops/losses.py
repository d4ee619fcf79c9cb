"""GAN losses and image normalization.

The reference uses ``nn.BCELoss`` (mean reduction) on sigmoid outputs
(reference ``src/actors/worker.py:96, 199-204, 220-225``).  Here discriminators
emit logits and the sigmoid is folded into numerically-stable softplus forms:

    BCE(sigmoid(x), 1) = softplus(-x)
    BCE(sigmoid(x), 0) = softplus(x)

identical in value and gradient wherever the reference doesn't saturate, and
finite where it does.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_real(logits: jax.Array) -> jax.Array:
    """mean BCE against label 1 — D should call these real."""
    return jnp.mean(jax.nn.softplus(-logits))


def bce_fake(logits: jax.Array) -> jax.Array:
    """mean BCE against label 0 — D should call these fake."""
    return jnp.mean(jax.nn.softplus(logits))


def d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    """Discriminator loss: BCE(D(real), 1) + BCE(D(fake), 0)
    (reference ``worker.py:197-204``)."""
    return bce_real(logits_real) + bce_fake(logits_fake)


def g_loss(logits_on_fake: jax.Array) -> jax.Array:
    """Generator (feedback) loss: BCE(D(X_g), 1) (reference ``worker.py:220-225``)."""
    return bce_real(logits_on_fake)


def normalize_uint8(x: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 [0, 255] -> [-1, 1].

    Equals the reference transform ``ToTensor() + Normalize(0.5, 0.5)``
    (reference ``src/datasets/CIFAR10.py:29-36``): x/255 -> (v-0.5)/0.5.
    """
    return x.astype(dtype) * (2.0 / 255.0) - 1.0


def denormalize_to_unit(x: jax.Array) -> jax.Array:
    """[-1, 1] -> [0, 1] (reference ``server.py:140, 342``)."""
    return (x + 1.0) * 0.5
