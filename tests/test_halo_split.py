"""Core/halo query split: the driver crops each tile's ±halo overlap cloud
to core bbox + margin on the source (query) side and a larger margin on the
target (support) side (pipelines.driver.halo_split_spec). The reference
instead recomputes every halo point redundantly in every tile
(/root/reference/main_fusion.py:128-144, halo pcd_tiling.cpp:297-301); the
split keeps the merged field's coverage (each point is core in exactly one
tile) while cutting per-tile work.

Covers: the margin helpers, the bucket estimate, the driver crop iterator,
and the device step under asymmetric src/tgt buckets + superpoint caps —
including core-field agreement between the split and full-overlap runs.
"""

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusion4landslide_tpu.config import Config
from fusion4landslide_tpu.pipelines.driver import (
    crop_cloud_to_core,
    halo_split_spec,
)


def test_halo_split_spec_defaults():
    cfg = Config({"max_magnitude": 5.0})
    assert halo_split_spec(cfg) == (5.0, 10.0)
    # Margins clamp to the halo; both at the halo == no split.
    cfg = Config({"max_magnitude": 50.0, "tile_halo": 20.0})
    assert halo_split_spec(cfg) is None
    cfg = Config({"max_magnitude": 5.0, "halo_query_split": False})
    assert halo_split_spec(cfg) is None
    cfg = Config(
        {"max_magnitude": 5.0, "halo_src_margin": 2.0, "halo_tgt_margin": 30.0}
    )
    assert halo_split_spec(cfg) == (2.0, 20.0)
    # F2S3 spells its gate max_disp_magnitude.
    assert halo_split_spec(Config({"max_disp_magnitude": 3.0})) == (3.0, 6.0)
    # No displacement gate and no explicit margin -> no safe split.
    assert halo_split_spec(Config({})) is None
    # Explicit src margin without a gate: tgt margin defaults >= src.
    cfg = Config({"halo_src_margin": 4.0})
    assert halo_split_spec(cfg) == (4.0, 4.0)


def test_crop_cloud_to_core_budget(rng):
    from fusion4landslide_tpu.io.ply import PointCloud

    pts = rng.uniform(-10, 10, size=(2000, 3))
    cloud = PointCloud(points=pts, colors=None)
    lo = np.full(3, -2.0)
    hi = np.full(3, 2.0)
    out = crop_cloud_to_core(cloud, lo, hi, 1.0)
    excess = np.maximum(np.maximum(lo - pts, pts - hi), 0.0).max(axis=1)
    assert len(out) == int((excess <= 1.0).sum())
    # Budget keeps the nearest-to-core points; the core itself always fits.
    n_core = int((excess == 0.0).sum())
    budget = n_core + 10
    out_b = crop_cloud_to_core(cloud, lo, hi, 5.0, budget=budget)
    assert len(out_b) == budget
    kept_excess = np.maximum(
        np.maximum(lo - out_b.points, out_b.points - hi), 0.0
    ).max(axis=1)
    assert (kept_excess == 0.0).sum() == n_core
    assert kept_excess.max() <= np.partition(excess, budget)[budget] + 1e-12


def test_split_count_estimate_bounds():
    from fusion4landslide_tpu.pipelines.driver import _split_count_estimate

    # Uniform-density square model: core 100x100 m at 100 pts/m^2, 20 m halo.
    n_core = 1_000_000
    n_olap = int(100.0 * 140 * 140)
    est = _split_count_estimate(n_core, n_olap, 20.0, 5.0)
    true = int(100.0 * 110 * 110)
    assert true <= est <= int(true * 1.2)
    # Degenerate inputs fall back to the overlap count.
    assert _split_count_estimate(10, 10, 20.0, 5.0) == 10
    assert _split_count_estimate(100, 500, 20.0, 25.0) == 500


def _terrain_tile(n_core=1500, density=200.0, halo=2.0, seed=0):
    """Core + halo ring terrain with a planted half-plane shift (the bench
    scene at test scale). Returns (src, tgt, core_mask, moving_mask, side)."""
    rng = np.random.default_rng(seed)
    side = float(np.sqrt(n_core / density))
    full = side + 2.0 * halo
    n_total = int(round(density * full * full))
    xy = rng.uniform(0, full, size=(n_total, 2))
    z = (
        np.sin(xy[:, 0] * 2.1) * 0.3
        + np.cos(xy[:, 1] * 1.7) * 0.4
        + rng.normal(scale=0.002, size=n_total)
    )
    src = np.column_stack([xy, z]).astype(np.float32)
    core = (
        (xy[:, 0] >= halo)
        & (xy[:, 0] < halo + side)
        & (xy[:, 1] >= halo)
        & (xy[:, 1] < halo + side)
    )
    moving = src[:, 0] > full / 2
    tgt = src.copy()
    tgt[moving] += np.array([0.02, -0.01, 0.005], np.float32)
    return src, tgt, core, moving


STATICS = dict(
    levels=(1, 2),
    k_max=16,
    patch_points=16,
    chunk=64,
    k_neighbors=8,
    member_cap=128,
    agg_max_points=32,
    small_patch=3,
    icp_max_iter=8,
    fine_max_matches=64,
    with_sparse=False,
    with_tgt2src=False,
)


def _run_step(dips, agg, src, tgt, sv_cap, sv_cap_tgt, m_bucket=None):
    from fusion4landslide_tpu.ops.segments import bucket_size
    from fusion4landslide_tpu.pipelines.fusion_device import fusion3d_tile_step

    n, m = len(src), len(tgt)
    N, M = bucket_size(n), m_bucket or bucket_size(m)
    c = src.mean(axis=0)
    sb = np.zeros((N, 3), np.float32)
    sb[:n] = src - c
    tb = np.zeros((M, 3), np.float32)
    tb[:m] = tgt - c
    out = fusion3d_tile_step(
        dips,
        agg,
        jnp.asarray(sb),
        jnp.arange(N) < n,
        jnp.asarray(tb),
        jnp.arange(M) < m,
        jax.random.PRNGKey(0),
        max_magnitude=0.5,
        icp_threshold=0.05,
        voxel_size_init=0.0,
        sv_cap=sv_cap,
        sv_cap_tgt=sv_cap_tgt,
        **STATICS,
    )
    disp = np.asarray(out.moved)[:n] - sb[:n]
    return disp, np.asarray(out.valid)[:n]


@pytest.mark.slow
def test_split_step_matches_full_on_core():
    """The device step under the query split (asymmetric buckets + caps)
    recovers the planted field, and its CORE displacement field agrees with
    the full-overlap run — the redundancy the split removes is not
    semantics.

    The test's DIPs weights are random-init, so descriptor matching only
    works where src/tgt geometry+support are bit-identical — production
    crops use asymmetric margins (trained descriptors are sampling-robust;
    the reference's epochs are different scans), but here both sides crop
    at the same margin and the asymmetric SHAPES (target bucket 2x the
    source bucket, separate superpoint caps) are exercised via padding."""
    from fusion4landslide_tpu.models.aggregation import ClusterFeatureNet
    from fusion4landslide_tpu.models.dips import PointNetFeature
    from fusion4landslide_tpu.ops.segments import bucket_size

    dips = PointNetFeature().init(
        jax.random.PRNGKey(0), np.zeros((2, 16, 3), np.float32)
    )
    agg = ClusterFeatureNet().init(
        jax.random.PRNGKey(1),
        np.zeros((2, 8, 64), np.float32),
        np.ones((2, 8), bool),
    )
    halo = 2.0
    src, tgt, core, moving = _terrain_tile(halo=halo)
    shift = np.array([0.02, -0.01, 0.005], np.float32)

    # Full-overlap run (halo_query_split: false — reference redundancy).
    disp_full, ok_full = _run_step(dips, agg, src, tgt, 512, None)

    # Split run: both sides cropped to core+0.9 m (see docstring), target
    # padded to a 2x bucket with its own superpoint cap.
    side = float(np.sqrt(1500 / 200.0))
    lo, hi = halo, halo + side

    def crop(margin):
        xy = src[:, :2]
        return (
            (xy[:, 0] >= lo - margin)
            & (xy[:, 0] < hi + margin)
            & (xy[:, 1] >= lo - margin)
            & (xy[:, 1] < hi + margin)
        )

    ks = kt = crop(0.9)
    disp_sp, ok_sp = _run_step(
        dips, agg, src[ks], tgt[kt], 256, 512,
        m_bucket=bucket_size(2 * int(kt.sum())),
    )

    # Index of each core point inside the cropped source array.
    core_in_crop = core[ks]
    assert ok_sp[core_in_crop].mean() > 0.9
    assert ok_full[core].mean() > 0.9

    # Both runs recover the planted field on the core.
    mov_crop = moving[ks]
    err = np.linalg.norm(
        disp_sp[core_in_crop & mov_crop & ok_sp] - shift, axis=1
    )
    assert np.median(err) < 2e-3
    err0 = np.linalg.norm(disp_sp[core_in_crop & ~mov_crop & ok_sp], axis=1)
    assert np.median(err0) < 2e-3

    # Core-field agreement split vs full: same points, both assigned.
    both = core_in_crop & ok_sp & ok_full[ks]
    assert both.sum() > 0.8 * core_in_crop.sum()
    d = np.linalg.norm(disp_sp[both] - disp_full[ks][both], axis=1)
    assert np.median(d) < 1e-3


def test_driver_split_iterates_cropped_tiles(tmp_path, rng):
    from fusion4landslide_tpu.io.ply import write_ply
    from fusion4landslide_tpu.pipelines.driver import (
        iter_tile_clouds,
        tile_size_buckets,
    )

    pts = rng.uniform(0, 10, size=(4000, 3))
    core_mask = np.all((pts >= 3.0) & (pts <= 7.0), axis=1)
    core = pts[core_mask]
    tile_dir = tmp_path / "tiled_data"
    (tile_dir / "non_overlap").mkdir(parents=True)
    (tile_dir / "overlap").mkdir()
    write_ply(str(tile_dir / "non_overlap" / "source_tile_0.ply"), core)
    write_ply(str(tile_dir / "non_overlap" / "target_tile_0.ply"), core)
    write_ply(str(tile_dir / "overlap" / "source_tile_0_overlap.ply"), pts)
    write_ply(str(tile_dir / "overlap" / "target_tile_0_overlap.ply"), pts)
    tiles = [
        (
            "0",
            str(tile_dir / "overlap" / "source_tile_0_overlap.ply"),
            str(tile_dir / "overlap" / "target_tile_0_overlap.ply"),
        )
    ]
    (tid, s, t), = list(iter_tile_clouds(tiles, split=(1.0, 2.0)))
    lo, hi = core.min(axis=0), core.max(axis=0)
    exc = np.maximum(np.maximum(lo - pts, pts - hi), 0.0).max(axis=1)
    assert len(s) == int((exc <= 1.0).sum())
    assert len(t) == int((exc <= 2.0).sum())
    # Un-split iteration returns the full overlap clouds.
    (_, s0, t0), = list(iter_tile_clouds(tiles))
    assert len(s0) == len(pts) and len(t0) == len(pts)
    # Bucket estimate covers the actual crops.
    nb, mb = tile_size_buckets(tiles, split=(1.0, 2.0), halo=3.0)
    assert nb >= len(s) and mb >= len(t)
