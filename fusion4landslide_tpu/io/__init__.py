"""Host-side file I/O: PLY/LAS point clouds, images, DVF result tables."""

from fusion4landslide_tpu.io.images import load_image
from fusion4landslide_tpu.io.ply import PointCloud, read_ply, write_ply

__all__ = ["PointCloud", "read_ply", "write_ply", "load_image"]
