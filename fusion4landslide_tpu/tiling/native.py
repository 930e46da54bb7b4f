"""ctypes binding for the native host tiler (cpp/tiler.cpp).

The native tiler replaces the reference's SWIG-wrapped PCL module
(cpp_core/pcd_tiling) for large epochs where Python-side masking costs
matter; :func:`tile_point_clouds_native` falls back to the numpy tiler when
the shared library hasn't been built (``make -C cpp``).
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp

__all__ = ["native_available", "tile_point_clouds_native", "build_native"]

_LIB_PATH = osp.join(
    osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))),
    "cpp",
    "libf4lhost.so",
)
_lib = None


def _load():
    global _lib
    if _lib is None and osp.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.f4l_tile_point_clouds.restype = ctypes.c_int
        lib.f4l_tile_point_clouds.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_double,
            ctypes.c_char_p,
        ]
        lib.f4l_last_error.restype = ctypes.c_char_p
        _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def build_native() -> bool:
    """Compile the shared library in-tree; returns success."""
    import subprocess

    cpp_dir = osp.dirname(_LIB_PATH)
    try:
        subprocess.run(["make", "-C", cpp_dir], check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    global _lib
    _lib = None
    return native_available()


def tile_point_clouds_native(
    src_path: str,
    tgt_path: str,
    max_pts: int,
    min_pts: int,
    save_dir: str,
    halo: float = 20.0,
) -> int:
    """Tile via the native core; raises RuntimeError with the native error
    message on failure. Output layout matches the Python tiler."""
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native tiler not built — run `make -C cpp` or use the numpy "
            "tiler (fusion4landslide_tpu.tiling.tile_point_clouds)"
        )
    os.makedirs(save_dir, exist_ok=True)
    n = lib.f4l_tile_point_clouds(
        src_path.encode(),
        tgt_path.encode(),
        max_pts,
        min_pts,
        halo,
        save_dir.encode(),
    )
    if n < 0:
        raise RuntimeError(lib.f4l_last_error().decode())
    return n
