"""Mesh construction and the sharded multi-tile displacement step.

The reference has no distributed layer at all (single process, ``cuda:0`` —
utils/common.py:97-99; serial tile loop, main_fusion.py:134). Its spatial
tiling with a ±20 m halo (cpp_core/pcd_tiling/pcd_tiling.cpp:295-330) is,
however, exactly a halo-exchange domain decomposition — so the TPU-native
scale-out story is:

- tiles are embarrassingly parallel shards; the halo makes per-tile matching
  exact with **zero** cross-tile communication during compute,
- a batch of padded tiles is laid out (T, N, 3) and sharded over the mesh's
  ``tiles`` axis with ``shard_map``; each device runs the identical per-tile
  program on its shard,
- the only collectives are the final result reductions (psum of magnitude
  statistics here; DVF gather happens at host writeback), which ride ICI.

Model parameters (the small inference nets) are replicated.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fusion4landslide_tpu.ops.kabsch import weighted_kabsch
from fusion4landslide_tpu.ops.knn import knn
from fusion4landslide_tpu.pipelines.f2s3 import compute_dips_features

__all__ = ["tile_mesh", "sharded_displacement_step"]


def tile_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over all (or the first n) devices; axis name ``tiles``."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("tiles",))


def sharded_displacement_step(
    mesh: Mesh,
    dips_params,
    *,
    k_max: int = 64,
    patch_points: int = 32,
    chunk: int = 64,
):
    """Build the jitted multi-tile displacement step.

    Returns a function (src_tiles, tgt_tiles, src_mask, tgt_mask, keys) ->
    (displacements, magnitudes_mean) where the leading tile axis is sharded
    across the mesh. Per tile: DIPs descriptors for source and target, exact
    feature-space 1-NN, Kabsch fit of the matched pairs — the F2S3 core loop
    — entirely device-resident.
    """

    def per_tile(src, tgt, smask, tmask, key):
        k1, k2 = jax.random.split(key)
        radius = jnp.asarray(2.0, src.dtype)
        fs = compute_dips_features(
            dips_params, src, src, radius, k1,
            k_max=k_max, patch_points=patch_points, chunk=chunk,
            halo_mask=smask,
        )
        ft = compute_dips_features(
            dips_params, tgt, tgt, radius, k2,
            k_max=k_max, patch_points=patch_points, chunk=chunk,
            halo_mask=tmask,
        )
        sqd, idx = knn(fs, ft, 1, tmask)
        matched = jnp.take(tgt, idx[:, 0], axis=0)
        ok = smask & jnp.isfinite(sqd[:, 0])
        R, t, _, _ = weighted_kabsch(src, matched, ok.astype(src.dtype))
        disp = matched - src
        disp = jnp.where(ok[:, None], disp, 0.0)
        mag = jnp.linalg.norm(disp, axis=-1)
        return disp, jnp.sum(mag), jnp.sum(ok)

    def step(src_tiles, tgt_tiles, src_mask, tgt_mask, keys):
        # Each device holds a slab of tiles; vmap over its local tiles.
        disp, mag_sum, cnt = jax.vmap(per_tile)(
            src_tiles, tgt_tiles, src_mask, tgt_mask, keys
        )
        # Global mean displacement magnitude: the one cross-tile reduction,
        # a psum over the ICI ring.
        total_mag = jax.lax.psum(jnp.sum(mag_sum), "tiles")
        total_cnt = jax.lax.psum(jnp.sum(cnt), "tiles")
        return disp, total_mag / jnp.maximum(total_cnt, 1)

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P("tiles"), P("tiles"), P("tiles"), P("tiles"), P("tiles")),
        out_specs=(P("tiles"), P()),
        # The kNN scan seeds its carry with constants, which the varying-
        # manual-axes checker flags against the device-varying outputs;
        # the per-tile program is trivially SPMD, so skip the check.
        check_vma=False,
    )
    return jax.jit(sharded)
