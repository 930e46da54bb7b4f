"""Fixed-shape, jit-compiled geometry/search kernels (the TPU compute core)."""

from fusion4landslide_tpu.ops.kabsch import (
    rt_to_transform,
    transform_points,
    transformation_residuals,
    weighted_kabsch,
)
from fusion4landslide_tpu.ops.knn import (
    knn,
    median_nn_distance,
    nn1,
    pairwise_sqdist,
    radius_neighbors,
)
from fusion4landslide_tpu.ops.voxel import (
    grid_cells,
    group_by_cells,
    segment_mean,
    voxel_downsample,
)

__all__ = [
    "weighted_kabsch",
    "transform_points",
    "transformation_residuals",
    "rt_to_transform",
    "knn",
    "nn1",
    "pairwise_sqdist",
    "median_nn_distance",
    "radius_neighbors",
    "grid_cells",
    "group_by_cells",
    "segment_mean",
    "voxel_downsample",
]
