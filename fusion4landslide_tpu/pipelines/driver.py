"""Shared CLI-driver plumbing for the four method entry points.

Mirrors the per-driver boilerplate of the reference (main_piecewise_icp.py:
20-102 and siblings): config → output dirs → logger → tile the epochs if no
tiles exist → enumerate tile files. Kept here once instead of four copies.
"""

from __future__ import annotations

import glob
import os
import os.path as osp
import re
import time

from fusion4landslide_tpu.config import Config, load_yaml
from fusion4landslide_tpu.utils.logging import get_logger

__all__ = [
    "setup_run",
    "ensure_tiles",
    "list_tiles",
    "log_config",
    "skip_completed_tiles",
    "load_or_compute_features",
]


def setup_run(config_path: str, method: str, keep_sub_directory: bool = False):
    """Load config, create output/log dirs, return (cfg, logger)."""
    cfg = load_yaml(config_path, keep_sub_directory=keep_sub_directory)
    cfg.output_root = osp.join(cfg.output_dir, cfg.get("output_folder", "run"))
    log_dir = osp.join(cfg.output_root, "logs")
    os.makedirs(log_dir, exist_ok=True)
    logger = get_logger(f"fusion4landslide_tpu.{method}", log_dir)
    cfg.tile_dir = osp.join(cfg.output_root, "tiled_data")
    return cfg, logger


def log_config(cfg: Config, logger) -> None:
    logger.info("-" * 70)
    msg = "Config:\n" + "\n".join(
        f"{k}={v}" for k, v in cfg.items() if not isinstance(v, Config)
    )
    logger.info(msg)
    logger.info("-" * 70)


def ensure_tiles(cfg: Config, logger) -> None:
    """Tile the raw epoch pair unless ``tile_dir`` already has tiles
    (artifact-level resume, main_piecewise_icp.py:60-75)."""
    from fusion4landslide_tpu.tiling import tile_point_clouds

    os.makedirs(cfg["tile_dir"], exist_ok=True)
    if any(os.listdir(cfg["tile_dir"])):
        # Resume takes precedence over the tiling_type guard below: a run
        # with pre-generated (or externally provided) tiles never tiles,
        # whatever tiling_type says.
        logger.info("Skip tiling; tiles loaded from %s", cfg["tile_dir"])
        return
    tiling_type = str(cfg.get("tiling_type", "xy_tiling"))
    if tiling_type != "xy_tiling":
        # The reference dispatches on tiling_type but its hv_tiling /
        # python_based_tiling branches are stubs returning None
        # (src/functions.py:170-173); fail loudly instead.
        raise ValueError(
            f"tiling_type={tiling_type!r} is not implemented (the reference "
            "only ships xy_tiling, src/functions.py:147-173)"
        )
    data_dir = cfg.get("input_root") or cfg.get("data_dir")
    src_name = cfg.get("src_pcd") or cfg.get("src_name")
    tgt_name = cfg.get("tgt_pcd") or cfg.get("tgt_name")
    src_path = osp.join(data_dir, "raw_pcd", src_name)
    if not osp.exists(src_path):
        src_path = osp.join(data_dir, src_name)
    tgt_path = osp.join(data_dir, "raw_pcd", tgt_name)
    if not osp.exists(tgt_path):
        tgt_path = osp.join(data_dir, tgt_name)
    voxel = float(cfg.get("voxel_size", cfg.get("voxel_size_init", 0.0)) or 0.0)
    t0 = time.time()
    n = tile_point_clouds(
        src_path,
        tgt_path,
        int(cfg.max_pts_per_tile),
        int(cfg.min_pts_per_tile),
        bool(voxel),
        voxel,
        0.0,
        -1,
        cfg.tile_dir,
        verbose=bool(cfg.get("verbose", True)),
        # Reference parity: fixed ±20 m (pcd_tiling.cpp:297-301). A smaller
        # halo is sound when max_magnitude is small — the target halo only
        # has to cover the largest admissible displacement plus patch
        # context — so it is exposed as a config knob.
        halo=float(cfg.get("tile_halo", 20.0)),
    )
    logger.info("Tiled into %d tiles in %.1fs", n, time.time() - t0)


def list_tiles(cfg: Config, overlap: bool = True) -> list[tuple[str, str, str]]:
    """Sorted [(tile_id, src_path, tgt_path)] from the tile directory."""
    sub = "overlap" if overlap else "non_overlap"
    pattern = osp.join(cfg.tile_dir, sub, "source_tile_*")
    paths = sorted(
        glob.glob(pattern),
        key=lambda x: int(re.search(r"\d+", osp.basename(x)).group()),
    )
    out = []
    for p in paths:
        tid = re.findall(r"\d+", osp.basename(p))[0]
        out.append((tid, p, p.replace("source_tile_", "target_tile_")))
    return out


def skip_completed_tiles(
    cfg: Config,
    tiles: list[tuple[str, str, str]],
    marker: str,
    logger,
) -> list[tuple[str, str, str]]:
    """Tile-level resume: drop tiles whose result file already exists.

    Replaces the reference's hand-edited ``continue_tile`` pointer
    (main_fusion.py:133) with an automatic check; ``continue_tile: N`` in
    the config additionally skips every tile with id < N, and
    ``overwrite_results: True`` disables resume entirely. ``marker`` is the
    result filename pattern with ``{tile}``, e.g.
    ``c2f_dvfms_src2tgt_tile_{tile}.txt``.

    Multi-host scale-out: tiles are communication-free (±20 m halo
    decomposition), so epochs larger than one host's mesh shard across
    hosts WITHOUT any DCN collective — set ``tile_shard_count: H`` and a
    per-host ``tile_shard_index`` and each process keeps the tiles whose
    integer id ≡ index (mod count). Hosts share nothing but the output
    directory; the per-tile result files and this resume check make the
    union restartable.
    """
    count = int(cfg.get("tile_shard_count", 1) or 1)
    if count > 1:
        index = int(cfg.get("tile_shard_index", 0) or 0)
        tiles = [t for t in tiles if int(t[0]) % count == index]
        logger.info(
            "Tile shard %d/%d: %d tile(s) owned by this host",
            index, count, len(tiles),
        )
    if bool(cfg.get("overwrite_results", False)):
        return tiles
    start = int(cfg.get("continue_tile", 0) or 0)
    results = osp.join(cfg.output_root, "results")
    kept = []
    for tid, s, t in tiles:
        if int(tid) < start:
            logger.info("Tile %s skipped (continue_tile=%d)", tid, start)
            continue
        if osp.exists(osp.join(results, marker.format(tile=tid))):
            logger.info("Tile %s already complete; skipping (resume)", tid)
            continue
        kept.append((tid, s, t))
    return kept


def load_or_compute_features(
    cfg: Config, tile_id, name: str, compute_fn, logger=None
):
    """Artifact-level feature cache (reference ``features_tile_N.npz``,
    base:2039-2049, f2s3.py:139-149): when ``point_feat_compute`` is False
    and the cache exists, load it; otherwise compute and save.

    ``compute_fn()`` must return a dict of numpy arrays.
    """
    import numpy as np

    out_root = cfg.get("output_root") or osp.join(
        str(cfg.get("output_dir", ".")), str(cfg.get("output_folder", "run"))
    )
    interim = osp.join(out_root, "interim")
    os.makedirs(interim, exist_ok=True)
    path = osp.join(interim, f"{name}_tile_{tile_id}.npz")
    if not bool(cfg.get("point_feat_compute", True)) and osp.exists(path):
        if logger:
            logger.info("Loading cached features from %s", path)
        with np.load(path) as z:
            return dict(z)
    out = compute_fn()
    # Compressing ~50 MB of descriptors costs seconds of single-core CPU
    # per tile; only persist the cache when interim artifacts are wanted
    # (the reference always writes, base:2039-2049 — save_interim: True
    # restores that).
    if bool(cfg.get("save_interim", True)):
        np.savez_compressed(path, **out)
        if logger:
            logger.info("Saved feature cache to %s", path)
    return out


def iter_tile_clouds(tiles, *, prefetch: int = 2):
    """Yield (tile_id, src_cloud, tgt_cloud) with background prefetch.

    While the device crunches tile i, a reader thread parses tile i+1's
    PLY pair — the host-IO double buffering the serial reference loop
    lacks (main_fusion.py:134 reads synchronously per tile).
    """
    from concurrent.futures import ThreadPoolExecutor

    from fusion4landslide_tpu.io import read_point_cloud

    def load(entry):
        tile_id, src_path, tgt_path = entry
        return tile_id, read_point_cloud(src_path), read_point_cloud(tgt_path)

    with ThreadPoolExecutor(max_workers=1) as pool:
        futures = [pool.submit(load, e) for e in tiles[:prefetch]]
        nxt = prefetch
        for _ in range(len(tiles)):
            result = futures.pop(0).result()
            if nxt < len(tiles):
                futures.append(pool.submit(load, tiles[nxt]))
                nxt += 1
            yield result


def tile_size_buckets(tiles) -> tuple[int, int]:
    """(src_bucket, tgt_bucket) padded sizes for a tile list, read from the
    PLY headers only — lets the sharded runners stream tiles lazily instead
    of materialising every cloud up front."""
    from fusion4landslide_tpu.io.ply import ply_vertex_count
    from fusion4landslide_tpu.ops.segments import bucket_size

    n = max(ply_vertex_count(sp) for _, sp, _ in tiles)
    m = max(ply_vertex_count(tp) for _, _, tp in tiles)
    return bucket_size(n), bucket_size(m)
