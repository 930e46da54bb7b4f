"""Multi-device tile sharding on the 8-device virtual CPU mesh."""

import sys

import jax
import numpy as np
import pytest

needs_mesh = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


@needs_mesh
def test_dryrun_multichip_entrypoint():
    sys.path.insert(0, "/root/repo")
    try:
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(8)
    finally:
        sys.path.remove("/root/repo")


@needs_mesh
def test_sharded_step_matches_single_device(rng):
    import jax.numpy as jnp

    from fusion4landslide_tpu.models.dips import PointNetFeature
    from fusion4landslide_tpu.parallel import (
        sharded_displacement_step,
        tile_mesh,
    )

    model = PointNetFeature()
    params = model.init(jax.random.PRNGKey(0), np.zeros((2, 16, 3), np.float32))
    tiles, n_pts = 8, 64
    src = rng.normal(size=(tiles, n_pts, 3)).astype(np.float32)
    tgt = src + 0.02
    ones = np.ones((tiles, n_pts), bool)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(tiles, dtype=jnp.uint32))

    disp8, mag8 = sharded_displacement_step(
        tile_mesh(8), params, k_max=8, patch_points=8, chunk=16
    )(src, tgt, ones, ones, keys)
    disp1, mag1 = sharded_displacement_step(
        tile_mesh(1), params, k_max=8, patch_points=8, chunk=16
    )(src, tgt, ones, ones, keys)
    np.testing.assert_allclose(
        np.asarray(disp8), np.asarray(disp1), atol=1e-5
    )
    np.testing.assert_allclose(float(mag8), float(mag1), rtol=1e-5)
