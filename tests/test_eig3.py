"""Closed-form 3x3 symmetric eigensolver vs jnp.linalg.eigh."""

import numpy as np
import jax.numpy as jnp

from fusion4landslide_tpu.ops.eig3 import (
    eigvals_sym3x3,
    smallest_eigenvector_sym3x3,
)


def _random_covs(n=2000, seed=0, flat=0.05):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 30, 3)).astype(np.float32)
    x[:, :, 2] *= flat  # flattened patches: separated smallest eigenvalue
    q, _ = np.linalg.qr(rng.normal(size=(n, 3, 3)))
    xr = np.einsum("nij,nkj->nki", q.astype(np.float32), x)
    return np.einsum("nki,nkj->nij", xr, xr) / x.shape[1]


def test_eigvals_match_eigh():
    C = _random_covs()
    ref = np.linalg.eigvalsh(C)
    got = np.asarray(eigvals_sym3x3(jnp.asarray(C)))
    assert np.abs(got - ref).max() < 1e-5 * np.abs(ref).max()


def test_smallest_eigenvector_aligns():
    C = _random_covs(seed=3)
    _, vec = np.linalg.eigh(C)
    got = np.asarray(smallest_eigenvector_sym3x3(jnp.asarray(C)))
    align = np.abs(np.sum(got * vec[:, :, 0], axis=-1))
    assert align.min() > 1.0 - 1e-4
    assert np.allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-5)


def test_scale_invariance():
    C = _random_covs(seed=5)
    a = np.asarray(smallest_eigenvector_sym3x3(jnp.asarray(C)))
    b = np.asarray(smallest_eigenvector_sym3x3(jnp.asarray(C * 1e-8)))
    assert np.abs(np.sum(a * b, axis=-1)).min() > 1.0 - 1e-4


def test_degenerate_fallback_is_unit():
    iso = np.tile(np.eye(3, dtype=np.float32), (4, 1, 1))
    got = np.asarray(smallest_eigenvector_sym3x3(jnp.asarray(iso)))
    assert np.allclose(np.linalg.norm(got, axis=-1), 1.0)
    zero = np.zeros((4, 3, 3), np.float32)
    got0 = np.asarray(smallest_eigenvector_sym3x3(jnp.asarray(zero)))
    assert np.allclose(np.linalg.norm(got0, axis=-1), 1.0)
