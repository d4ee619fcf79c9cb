"""Loss parity vs the reference's torch formulation.

The reference computes ``nn.BCELoss()(sigmoid_output, labels)`` (reference
``src/actors/worker.py:96, 199-225``); we compute softplus forms on logits.
Values and input-gradients must agree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdgan_tpu.ops import losses


def test_bce_values_match_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.normal(0, 3, 64).astype(np.float32)

    t = torch.tensor(logits, requires_grad=True)
    bce = torch.nn.BCELoss()
    ref_real = bce(torch.sigmoid(t), torch.ones(64))
    ref_fake = bce(torch.sigmoid(t), torch.zeros(64))

    ours_real = losses.bce_real(jnp.asarray(logits))
    ours_fake = losses.bce_fake(jnp.asarray(logits))
    np.testing.assert_allclose(float(ours_real), ref_real.item(), rtol=1e-5)
    np.testing.assert_allclose(float(ours_fake), ref_fake.item(), rtol=1e-5)


def test_bce_gradients_match_torch():
    """The error-feedback tensor IS this gradient (worker.py:218-233)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    logits = rng.normal(0, 2, 32).astype(np.float32)

    t = torch.tensor(logits, requires_grad=True)
    loss = torch.nn.BCELoss()(torch.sigmoid(t), torch.ones(32))
    loss.backward()
    ref_grad = t.grad.numpy()

    ours_grad = jax.grad(lambda x: losses.bce_real(x))(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(ours_grad), ref_grad, rtol=1e-5, atol=1e-7)


def test_bce_stable_at_saturation():
    big = jnp.asarray([100.0, -100.0, 1000.0, -1000.0])
    assert np.all(np.isfinite(np.asarray(losses.bce_real(big))))
    assert np.all(np.isfinite(np.asarray(losses.bce_fake(big))))
    assert np.all(np.isfinite(np.asarray(jax.grad(losses.bce_real)(big))))


def test_normalize_matches_totensor_normalize():
    """uint8 path == ToTensor + Normalize(0.5, 0.5) (CIFAR10.py:29-36)."""
    x = jnp.asarray(np.array([0, 51, 128, 255], np.uint8))
    out = np.asarray(losses.normalize_uint8(x))
    expected = (np.array([0, 51, 128, 255]) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(out, expected, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(losses.denormalize_to_unit(jnp.asarray(expected))),
        np.array([0, 51, 128, 255]) / 255.0, rtol=1e-6,
    )
