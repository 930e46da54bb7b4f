"""Device-mesh parallelism: tiles are the data-parallel axis."""

from fusion4landslide_tpu.parallel.mesh import (
    sharded_displacement_step,
    tile_mesh,
)

__all__ = ["tile_mesh", "sharded_displacement_step"]
