"""Device-mesh parallelism: tiles are the data-parallel axis."""

from fusion4landslide_tpu.parallel.mesh import tile_mesh
from fusion4landslide_tpu.parallel.pipeline import (
    make_sharded_f2s3_step,
    make_sharded_fusion3d_step,
    make_sharded_piecewise_step,
    make_sharded_rgb_guided_step,
    run_f2s3_tiles_sharded,
    run_fusion3d_tiles_sharded,
    run_piecewise_tiles_sharded,
    run_rgb_guided_tiles_sharded,
)

__all__ = [
    "tile_mesh",
    "make_sharded_f2s3_step",
    "run_f2s3_tiles_sharded",
    "make_sharded_fusion3d_step",
    "run_fusion3d_tiles_sharded",
    "make_sharded_piecewise_step",
    "run_piecewise_tiles_sharded",
    "make_sharded_rgb_guided_step",
    "run_rgb_guided_tiles_sharded",
]
