"""Method pipelines: thin compositions of the ops layer.

Each pipeline is a pure per-tile device function plus a host wrapper that
handles file I/O and the tile loop/sharding. Mirrors the reference's four
methods (main_fusion.py, main_rgb_guided.py, main_f2s3.py,
main_piecewise_icp.py) without the class-per-pipeline state-dict design.
"""

from fusion4landslide_tpu.pipelines.piecewise_icp import (
    piecewise_icp_core,
    run_piecewise_icp,
)

__all__ = ["piecewise_icp_core", "run_piecewise_icp"]
