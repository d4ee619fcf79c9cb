"""FID / Inception Score tests.

The reference's metrics channel is torchmetrics FID/IS on 5 samples
(reference ``src/actors/server.py:20-43, 354-364``); here the math (Frechet
distance, IS KL form) is verified directly and against torchmetrics' published
formulas, with a small feature net standing in for InceptionV3 where speed
matters.
"""

import numpy as np
import pytest

from mdgan_tpu.metrics.fid import (
    activation_statistics,
    frechet_distance,
    inception_score,
    _matrix_sqrt_trace,
)


def test_frechet_identical_is_zero():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(64, 16))
    mu, sigma = activation_statistics(feats)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-8


def test_frechet_diagonal_case_closed_form():
    """For diagonal covariances FID has a closed form:
    |mu1-mu2|^2 + sum(s1 + s2 - 2 sqrt(s1 s2))."""
    rng = np.random.default_rng(1)
    d = 8
    mu1, mu2 = rng.normal(size=d), rng.normal(size=d)
    s1, s2 = rng.uniform(0.5, 2.0, d), rng.uniform(0.5, 2.0, d)
    got = frechet_distance(mu1, np.diag(s1), mu2, np.diag(s2))
    want = float(((mu1 - mu2) ** 2).sum() + (s1 + s2 - 2 * np.sqrt(s1 * s2)).sum())
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_matrix_sqrt_trace_vs_scipy_free_reference():
    """tr(sqrtm(AB)) for commuting PSD matrices == sum sqrt(eig(A)eig(B))."""
    rng = np.random.default_rng(2)
    q, _ = np.linalg.qr(rng.normal(size=(6, 6)))
    wa, wb = rng.uniform(0.1, 3, 6), rng.uniform(0.1, 3, 6)
    a = q @ np.diag(wa) @ q.T
    b = q @ np.diag(wb) @ q.T
    got = _matrix_sqrt_trace(a, b)
    np.testing.assert_allclose(got, np.sqrt(wa * wb).sum(), rtol=1e-8)


def test_frechet_increases_with_mean_shift():
    rng = np.random.default_rng(3)
    base = rng.normal(size=(128, 8))
    mu, sigma = activation_statistics(base)
    prev = 0.0
    for shift in [0.5, 1.0, 2.0]:
        mu2, sigma2 = activation_statistics(base + shift)
        d = frechet_distance(mu, sigma, mu2, sigma2)
        assert d > prev
        prev = d


def test_inception_score_bounds():
    """IS is 1 for uniform confident-free predictions, high for confident
    diverse ones; computed straight from the KL definition."""
    import mdgan_tpu.metrics.fid as fid_mod

    # monkeypatch the feature extractor: fake probs
    n, classes = 100, 10
    confident = np.eye(classes)[np.arange(n) % classes] * 0.999 + 1e-4
    confident /= confident.sum(axis=1, keepdims=True)
    uniform = np.full((n, classes), 1.0 / classes)

    orig = fid_mod.inception_features
    try:
        fid_mod.inception_features = lambda imgs, **kw: (None, imgs)
        is_conf, _ = fid_mod.inception_score(confident)
        is_unif, _ = fid_mod.inception_score(uniform)
    finally:
        fid_mod.inception_features = orig
    assert abs(is_unif - 1.0) < 1e-6
    assert is_conf > 8.0  # ~= number of classes when confident & diverse


def test_tracker_dense_fast_path_matches_generic(monkeypatch):
    """FIDTracker's cached dense route (precomputed real-side mu/Sigma/
    sqrtm(Sigma)) must equal the generic frechet_from_features on the same
    features — the cache is a per-eval cost optimization, not a different
    estimator."""
    import mdgan_tpu.metrics.fid as fid_mod
    import mdgan_tpu.metrics.inception as inc
    from mdgan_tpu.metrics.fid import FIDTracker, frechet_from_features

    monkeypatch.setattr(inc, "calibrated_variables", lambda x: None)
    monkeypatch.setattr(
        fid_mod, "inception_features",
        lambda x, batch=None, variables=None: (np.asarray(x, np.float64), None))
    rng = np.random.default_rng(5)
    f1 = rng.normal(size=(300, 16))
    f2 = rng.normal(loc=0.3, scale=1.2, size=(400, 16))
    tracker = FIDTracker(f1)
    assert tracker._dense
    np.testing.assert_allclose(tracker.score(f2),
                               frechet_from_features(f1, f2), rtol=1e-9)
    # low-sample side falls back to the generic (low-rank) route
    small = rng.normal(size=(8, 16))
    np.testing.assert_allclose(tracker.score(small),
                               frechet_from_features(f1, small), rtol=1e-9)


@pytest.mark.slow
def test_inception_network_runs():
    """End-to-end feature extraction through the Flax InceptionV3 (random
    init in this environment — flagged via feature_source())."""
    from mdgan_tpu.metrics.inception import feature_source, inception_features

    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
    feats, probs = inception_features(imgs, batch=4)
    assert feats.shape == (4, 2048)
    assert probs.shape == (4, 1000)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-4)
    assert feature_source() in ("pretrained:torchvision",
                                "pretrained:fid-compat", "random-init")
    # grayscale path (channel repeat, server.py:137-138)
    g = rng.uniform(0, 1, (2, 28, 28, 1)).astype(np.float32)
    feats_g, _ = inception_features(g, batch=2)
    assert feats_g.shape == (2, 2048)
    # the bounded fetch window (input-residency cap for large images) must
    # not change results: a window forcing a flush per batch == one fetch
    imgs10 = rng.uniform(0, 1, (10, 32, 32, 3)).astype(np.float32)
    f1, p1 = inception_features(imgs10, batch=4)
    f2, p2 = inception_features(imgs10, batch=4, window_bytes=1)
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(p1, p2)


@pytest.mark.slow
def test_fid_calibration_is_order_independent():
    """FID/IS are pure functions of (real set, fake set): building another
    tracker first must not change a tracker's scores.  Regression for the
    round-2 golden reproducibility bug: a global first-caller-wins BN
    calibration made committed FIDs depend on what the process evaluated
    first."""
    import mdgan_tpu.metrics.inception as inc
    from mdgan_tpu.metrics.fid import FIDTracker

    rng = np.random.default_rng(7)
    real_a = rng.uniform(0, 1, (3, 16, 16, 3)).astype(np.float32)
    real_b = rng.uniform(0, 1, (3, 16, 16, 3)).astype(np.float32)
    fakes = rng.uniform(0, 1, (4, 16, 16, 3)).astype(np.float32)

    inc._CALIB_CACHE.clear()
    t_first = FIDTracker(real_b)
    fid_first = t_first.score(fakes)
    is_first = t_first.inception_score(fakes, splits=1)

    inc._CALIB_CACHE.clear()
    FIDTracker(real_a)  # a different tracker calibrates first this time
    t_second = FIDTracker(real_b)
    assert t_second.score(fakes) == fid_first
    assert t_second.inception_score(fakes, splits=1) == is_first


@pytest.mark.slow
def test_fid_calibration_cap(monkeypatch):
    """Calibration uses only the first _CALIBRATION_CAP images in canonical
    order, so the caller's sample-count choice can't perturb the feature
    space (and a 10k-real standard-protocol tracker can't OOM the
    calibration pass)."""
    import jax

    import mdgan_tpu.metrics.inception as inc

    rng = np.random.default_rng(8)
    imgs = rng.uniform(0, 1, (3, 16, 16, 3)).astype(np.float32)
    monkeypatch.setattr(inc, "_CALIBRATION_CAP", 2)
    inc._CALIB_CACHE.clear()
    v1 = inc.calibrated_variables(imgs)
    imgs2 = imgs.copy()
    imgs2[2] = 0.5  # beyond the cap: must not matter
    inc._CALIB_CACHE.clear()
    v2 = inc.calibrated_variables(imgs2)
    for a, b in zip(jax.tree.leaves(v1), jax.tree.leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    inc._CALIB_CACHE.clear()


def test_low_rank_frechet_equals_dense():
    """frechet_from_features (SVD/Gram form) == the dense sqrtm formulation."""
    from mdgan_tpu.metrics.fid import frechet_from_features

    rng = np.random.default_rng(4)
    for n1, n2, d in [(5, 20, 64), (32, 32, 16), (2, 3, 8), (100, 50, 32)]:
        f1 = rng.normal(size=(n1, d))
        f2 = rng.normal(2.0, 1.5, size=(n2, d))
        mu1, s1 = activation_statistics(f1)
        mu2, s2 = activation_statistics(f2)
        dense = frechet_distance(mu1, s1, mu2, s2)
        fast = frechet_from_features(f1, f2)
        np.testing.assert_allclose(fast, dense, rtol=1e-8, atol=1e-8)
