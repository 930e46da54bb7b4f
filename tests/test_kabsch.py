"""Weighted Kabsch vs numpy reference formulas (reference: src/functions.py:12-85)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from fusion4landslide_tpu.ops import (
    transform_points,
    transformation_residuals,
    weighted_kabsch,
)


def random_rt(rng):
    R = Rotation.random(random_state=int(rng.integers(1 << 30))).as_matrix()
    t = rng.normal(size=3)
    return R, t


def test_exact_recovery(rng):
    x1 = rng.normal(size=(50, 3))
    R, t = random_rt(rng)
    x2 = x1 @ R.T + t
    R_est, t_est, res, valid = weighted_kabsch(x1, x2)
    assert bool(valid)
    np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-5)


def test_weights_reject_outliers(rng):
    x1 = rng.normal(size=(40, 3))
    R, t = random_rt(rng)
    x2 = x1 @ R.T + t
    x2_corrupt = x2.copy()
    x2_corrupt[:5] += 100.0  # gross outliers
    w = np.ones(40)
    w[:5] = 0.0
    R_est, t_est, _, valid = weighted_kabsch(x1, x2_corrupt, weights=w)
    assert bool(valid)
    np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-5)


def test_mask_equals_truncation(rng):
    """Padded rows under a mask must give the identical fit as dropping them."""
    x1 = rng.normal(size=(30, 3))
    R, t = random_rt(rng)
    x2 = x1 @ R.T + t + rng.normal(scale=0.01, size=(30, 3))
    pad = np.zeros((10, 3))
    x1p = np.concatenate([x1, pad + 123.0])
    x2p = np.concatenate([x2, pad - 7.0])
    mask = np.arange(40) < 30
    R_a, t_a, _, _ = weighted_kabsch(x1, x2)
    R_b, t_b, _, _ = weighted_kabsch(x1p, x2p, mask=mask)
    np.testing.assert_allclose(np.asarray(R_a), np.asarray(R_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_a), np.asarray(t_b), atol=1e-5)


def test_batched(rng):
    B, N = 7, 25
    x1 = rng.normal(size=(B, N, 3))
    Rs, ts = [], []
    x2 = np.zeros_like(x1)
    for b in range(B):
        R, t = random_rt(rng)
        Rs.append(R)
        ts.append(t)
        x2[b] = x1[b] @ R.T + t
    R_est, t_est, _, valid = weighted_kabsch(x1, x2)
    assert np.asarray(valid).all()
    np.testing.assert_allclose(np.asarray(R_est), np.stack(Rs), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_est), np.stack(ts), atol=1e-5)


def test_reflection_fix(rng):
    """Near-planar data must still yield a proper rotation (det=+1)."""
    x1 = rng.normal(size=(20, 3))
    x1[:, 2] *= 1e-4
    R, t = random_rt(rng)
    x2 = x1 @ R.T + t
    R_est, _, _, _ = weighted_kabsch(x1, x2)
    assert np.linalg.det(np.asarray(R_est)) == pytest.approx(1.0, abs=1e-4)


def test_degenerate_returns_identity():
    x1 = np.zeros((5, 3))
    x2 = np.zeros((5, 3))
    R, t, _, valid = weighted_kabsch(x1, x2, weights=np.zeros(5))
    assert not bool(valid)
    np.testing.assert_allclose(np.asarray(R), np.eye(3))
    np.testing.assert_allclose(np.asarray(t), 0.0)


def test_residuals_match_manual(rng):
    x1 = rng.normal(size=(15, 3))
    x2 = rng.normal(size=(15, 3))
    R, t = random_rt(rng)
    res = np.asarray(transformation_residuals(x1, x2, R, t))
    manual = np.linalg.norm(x1 @ R.T + t - x2, axis=1)
    np.testing.assert_allclose(res, manual, atol=1e-6)
    moved = np.asarray(transform_points(x1, R, t))
    np.testing.assert_allclose(moved, x1 @ R.T + t, atol=1e-6)
