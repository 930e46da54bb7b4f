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
from fusion4landslide_tpu.ops.hashgrid import build_hash_grid, hash_grid_knn
from fusion4landslide_tpu.ops.icp import ICPResult, icp_point2point
from fusion4landslide_tpu.ops.normals import pca_normals
from fusion4landslide_tpu.ops.registration import (
    colored_icp,
    icp_point2plane,
    ransac_registration,
)
from fusion4landslide_tpu.ops.segments import bucket_size, label_members
from fusion4landslide_tpu.ops.supervoxel import supervoxel_segmentation

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
    "build_hash_grid",
    "hash_grid_knn",
    "ICPResult",
    "icp_point2point",
    "icp_point2plane",
    "colored_icp",
    "ransac_registration",
    "pca_normals",
    "supervoxel_segmentation",
    "label_members",
    "bucket_size",
]
