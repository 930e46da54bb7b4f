"""Inference-only neural models (Flax) + torch checkpoint conversion."""

from fusion4landslide_tpu.models.dips import PointNetFeature
from fusion4landslide_tpu.models.filtering import FilteringNetwork, filter_correspondences
from fusion4landslide_tpu.models.aggregation import ClusterFeatureNet, aggregate_superpoints
from fusion4landslide_tpu.models.convert import (
    load_torch_checkpoint,
    torch_to_aggregation_params,
    torch_to_dips_params,
    torch_to_filtering_params,
)

__all__ = [
    "PointNetFeature",
    "FilteringNetwork",
    "filter_correspondences",
    "ClusterFeatureNet",
    "aggregate_superpoints",
    "load_torch_checkpoint",
    "torch_to_dips_params",
    "torch_to_filtering_params",
    "torch_to_aggregation_params",
]
