"""Window-DMA Pallas grid kNN vs the XLA gather join (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from fusion4landslide_tpu.ops.hashgrid import build_hash_grid, _hash_grid_knn_xla
from fusion4landslide_tpu.ops.hashgrid_pallas import hash_grid_knn_window

RADIUS = 0.8


@pytest.fixture
def setup(rng):
    n, m = 4000, 5000
    ref = rng.uniform(0, 30, size=(m, 3)).astype(np.float32)
    q = rng.uniform(0, 30, size=(n, 3)).astype(np.float32)
    mask = np.ones(m, bool)
    mask[4500:] = False
    grid = build_hash_grid(jnp.asarray(ref), RADIUS, jnp.asarray(mask))
    return q, grid


@pytest.mark.parametrize("k", [1, 3])
def test_matches_xla_join(setup, k):
    q, grid = setup
    d0, i0, _ = _hash_grid_knn_xla(jnp.asarray(q), grid, RADIUS, k, cap=64)
    d1, i1, ov = hash_grid_knn_window(
        jnp.asarray(q), grid, RADIUS, k,
        block=128, window=4096, chunk=512, interpret=True,
    )
    assert int(ov) == 0
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    fin0 = np.isfinite(np.asarray(d0))
    np.testing.assert_array_equal(fin0, np.isfinite(np.asarray(d1)))
    np.testing.assert_allclose(
        np.asarray(d0)[fin0], np.asarray(d1)[fin0], atol=1e-3
    )


def test_exclude_self(setup, rng):
    q, _ = setup
    grid = build_hash_grid(jnp.asarray(q), RADIUS)
    d, i, _ = hash_grid_knn_window(
        jnp.asarray(q), grid, RADIUS, 1,
        block=128, window=4096, chunk=512,
        exclude_self=True, interpret=True,
    )
    hit = np.isfinite(np.asarray(d)[:, 0])
    assert hit.any()
    assert not np.any(np.asarray(i)[hit, 0] == np.arange(len(q))[hit])


def test_overflow_reported(setup):
    q, grid = setup
    # A window too small for a 4000-point cloud must flag, not mis-report.
    _, _, ov = hash_grid_knn_window(
        jnp.asarray(q), grid, RADIUS, 1,
        block=2048, window=256, chunk=128, interpret=True,
    )
    assert int(ov) > 0
