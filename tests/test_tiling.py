"""BSP tiling invariants."""

import numpy as np

from fusion4landslide_tpu.tiling import tile_epoch_pair, tile_point_clouds
from fusion4landslide_tpu.io import read_ply, write_ply


def make_pair(rng, n=5000, extent=200.0):
    src = rng.uniform(0, extent, size=(n, 3))
    src[:, 2] *= 0.05  # flat-ish terrain: z is the projection axis
    tgt = src + np.array([0.1, -0.05, 0.02])
    return src, tgt


def test_tiles_cover_and_respect_max(rng):
    src, tgt = make_pair(rng)
    tiles, src_f, tgt_f, _, _, proj = tile_epoch_pair(src, tgt, max_pts=800)
    assert proj == 2  # z has the largest overlap face
    assert len(tiles) >= 2
    covered = np.zeros(src_f.shape[0], bool)
    for tp in tiles:
        assert max(tp.src_idx.size, tp.tgt_idx.size) <= 800
        covered[tp.src_idx] = True
        # core is a subset of halo
        assert np.isin(tp.src_idx, tp.src_halo_idx).all()
        assert np.isin(tp.tgt_idx, tp.tgt_halo_idx).all()
    # Every cropped source point lands in >= 1 tile core (up to boundary-eps
    # double counting, none missing).
    assert covered.all()


def test_halo_buffer(rng):
    src, tgt = make_pair(rng)
    tiles, src_f, _, _, _, _ = tile_epoch_pair(src, tgt, max_pts=800)
    tp = tiles[0]
    halo_pts = src_f[tp.src_halo_idx]
    # halo points stay within the core box expanded by 20 m in-plane
    lo = tp.bbox_min.copy()
    hi = tp.bbox_max.copy()
    lo[:2] -= 20.0 + 1e-9
    hi[:2] += 20.0 + 1e-9
    assert ((halo_pts >= lo) & (halo_pts <= hi)).all()
    # and the halo is strictly larger than the core for an interior tile
    assert tp.src_halo_idx.size >= tp.src_idx.size


def test_voxel_filter_reduces(rng):
    src, tgt = make_pair(rng, n=3000, extent=50.0)
    tiles, src_f, tgt_f, _, _, _ = tile_epoch_pair(
        src, tgt, max_pts=10_000, voxel_size=5.0
    )
    assert src_f.shape[0] < 3000
    assert tgt_f.shape[0] < 3000


def test_file_level_api(tmp_path, rng):
    src, tgt = make_pair(rng, n=2000)
    write_ply(str(tmp_path / "src.ply"), src)
    write_ply(str(tmp_path / "tgt.ply"), tgt)
    n = tile_point_clouds(
        str(tmp_path / "src.ply"),
        str(tmp_path / "tgt.ply"),
        max_pts=600,
        min_pts=5,
        voxel_flag=False,
        voxel_size=0.0,
        overlap=0.0,
        proj_dir=-1,
        save_dir=str(tmp_path / "tiled_data"),
    )
    assert n >= 2
    tile0 = read_ply(str(tmp_path / "tiled_data/non_overlap/source_tile_0.ply"))
    halo0 = read_ply(
        str(tmp_path / "tiled_data/overlap/source_tile_0_overlap.ply")
    )
    assert 0 < len(tile0) <= 600
    assert len(halo0) >= len(tile0)


def test_unknown_tiling_type_raises(tmp_path):
    """tiling_type other than xy_tiling fails loudly (the reference's
    hv/python branches are stubs returning None, functions.py:170-173)."""
    import logging

    import pytest

    from fusion4landslide_tpu.pipelines.driver import ensure_tiles

    cfg = {"tiling_type": "hv_tiling", "tile_dir": str(tmp_path / "t")}
    with pytest.raises(ValueError, match="hv_tiling"):
        ensure_tiles(cfg, logging.getLogger("t"))


def test_resume_takes_precedence_over_tiling_type_guard(tmp_path):
    """Pre-generated tiles resume BEFORE the tiling_type guard: a config
    carrying an unimplemented tiling_type but shipping its tiles must run
    (artifact-level resume, main_piecewise_icp.py:60-75)."""
    import logging

    from fusion4landslide_tpu.pipelines.driver import ensure_tiles

    td = tmp_path / "tiles"
    (td / "non_overlap").mkdir(parents=True)
    cfg = {"tiling_type": "hv_tiling", "tile_dir": str(td)}
    ensure_tiles(cfg, logging.getLogger("t"))  # must not raise


def test_tile_shard_partitions_tiles(tmp_path):
    """``tile_shard_count``/``tile_shard_index`` partition the tile list by
    tile-id modulo — the multi-host scale-out path (tiles are
    communication-free, so hosts share only the output directory)."""
    import logging

    from fusion4landslide_tpu.config import Config
    from fusion4landslide_tpu.pipelines.driver import skip_completed_tiles

    tiles = [(str(i), f"s{i}", f"t{i}") for i in range(10)]
    log = logging.getLogger("t")
    shards = []
    for idx in range(3):
        cfg = Config(
            output_root=str(tmp_path),
            tile_shard_count=3,
            tile_shard_index=idx,
        )
        shards.append(skip_completed_tiles(cfg, tiles, "r_{tile}.txt", log))
    ids = sorted(int(t[0]) for s in shards for t in s)
    assert ids == list(range(10))  # disjoint union covers every tile
    assert all(int(t[0]) % 3 == i for i, s in enumerate(shards) for t in s)
