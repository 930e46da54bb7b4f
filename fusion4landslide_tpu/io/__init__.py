"""Host-side file I/O: PLY point clouds and DVF result tables."""

from fusion4landslide_tpu.io.ply import PointCloud, read_ply, write_ply

__all__ = ["PointCloud", "read_ply", "write_ply"]
