"""Mesh construction for tile data-parallelism.

The reference has no distributed layer at all (single process, ``cuda:0`` —
utils/common.py:97-99; serial tile loop, main_fusion.py:134). Its spatial
tiling with a ±20 m halo (cpp_core/pcd_tiling/pcd_tiling.cpp:295-330) is,
however, exactly a halo-exchange domain decomposition — so the TPU-native
scale-out story is:

- tiles are embarrassingly parallel shards; the halo makes per-tile matching
  exact with **zero** cross-tile communication during compute,
- a batch of padded tiles is laid out (T, N, 3) and sharded over the mesh's
  ``tiles`` axis with ``shard_map``; each device runs the identical
  device-resident per-tile pipeline on its slab
  (see ``parallel.pipeline``),
- the only cross-device data movement is the host gather of per-tile DVF
  tables at writeback.

Model parameters (the small inference nets) are replicated.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["tile_mesh"]


def tile_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over all (or the first n) devices; axis name ``tiles``."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("tiles",))
