"""Pallas kNN kernel vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from fusion4landslide_tpu.ops.knn import _knn_xla
from fusion4landslide_tpu.ops.knn_pallas import knn_pallas


@pytest.fixture
def qr(rng):
    q = rng.normal(size=(500, 64)).astype(np.float32)
    r = rng.normal(size=(700, 64)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(r)


@pytest.mark.parametrize("k", [1, 4])
def test_matches_xla_path(qr, k):
    q, r = qr
    mask = np.ones(700, bool)
    mask[650:] = False
    d0, i0 = _knn_xla(q, r, k, jnp.asarray(mask))
    d1, i1 = knn_pallas(q, r, k, jnp.asarray(mask), interpret=True)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-4)


def test_exclude_self(qr):
    q, _ = qr
    _, idx = knn_pallas(q, q, 1, exclude_self=True, interpret=True)
    assert not np.any(np.asarray(idx)[:, 0] == np.arange(q.shape[0]))


def test_all_masked(qr):
    q, r = qr
    d, i = knn_pallas(q, r, 1, jnp.zeros(700, bool), interpret=True)
    assert np.all(~np.isfinite(np.asarray(d)))
    assert np.all(np.asarray(i) == 0)


def test_k_larger_than_valid_refs(qr):
    q, r = qr
    mask = np.zeros(700, bool)
    mask[:3] = True
    d, i = knn_pallas(q, r, 8, jnp.asarray(mask), interpret=True)
    d = np.asarray(d)
    assert np.all(np.isfinite(d[:, :3]))
    assert np.all(~np.isfinite(d[:, 3:]))


def test_nonaligned_sizes(rng):
    # n, m deliberately off tile boundaries
    q = jnp.asarray(rng.normal(size=(131, 16)).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(77, 16)).astype(np.float32))
    d0, i0 = _knn_xla(q, r, 2)
    d1, i1 = knn_pallas(q, r, 2, interpret=True)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-4)
