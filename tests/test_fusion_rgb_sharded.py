"""RGB 2D-match channel of the device-resident fusion step.

Unit parity of the traced helpers against the host implementations
(coarse_match_2d_votes, chain_2d_matches_to_3d), plus the full RGB+3D
fusion method (use_2d_matches=True) end-to-end through
``run_fusion3d_tiles_sharded`` on the 8-device virtual CPU mesh —
including a coarse_matching_only_2d drive where ALL patch pairs come from
the 2D pixel votes, so recovery proves the image channel works.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusion4landslide_tpu.models.aggregation import ClusterFeatureNet
from fusion4landslide_tpu.models.dips import PointNetFeature

needs_mesh = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)

IMAGE_SIZE = (512, 512)
INTRINSIC = np.array(
    [[500.0, 0.0, 256.0], [0.0, 500.0, 256.0], [0.0, 0.0, 1.0]], np.float32
)
# Camera 5 m above the scene looking straight down +z (world→cam adds +5 z).
EXTRINSIC = np.eye(4, dtype=np.float32)
EXTRINSIC[2, 3] = 5.0


def test_vote_2d_matches_host(rng):
    from fusion4landslide_tpu.pipelines.fusion import coarse_match_2d_votes
    from fusion4landslide_tpu.pipelines.fusion_device import _vote_2d_device

    # Asymmetric label counts: the core/halo query split gives the target
    # (support) cloud more superpoints than the source (query) cloud.
    V, W, n_lab_s, n_lab_t = 400, 520, 16, 24
    lab_s = rng.integers(-1, n_lab_s, size=V).astype(np.int32)
    lab_t = rng.integers(-1, n_lab_t, size=W).astype(np.int32)
    c2d_idx = rng.integers(0, W, size=V).astype(np.int32)
    c2d_valid = rng.random(V) < 0.7

    want_tgt, want_ok = coarse_match_2d_votes(
        lab_s, lab_t, c2d_idx, c2d_valid, n_lab_s, n_lab_t
    )
    got_tgt, got_cnt = jax.jit(
        _vote_2d_device, static_argnames=("n_lab_s", "n_lab_t")
    )(lab_s, lab_t, c2d_idx, c2d_valid, n_lab_s=n_lab_s, n_lab_t=n_lab_t)
    got_ok = np.asarray(got_cnt) >= 1
    np.testing.assert_array_equal(got_ok, want_ok)
    np.testing.assert_array_equal(
        np.asarray(got_tgt)[want_ok], want_tgt[want_ok]
    )


@pytest.mark.parametrize("mode", ["nn_src_only", "nn_mutual", "nn_union"])
def test_chain_2d_matches_host(rng, mode):
    from fusion4landslide_tpu.image.geometry import chain_2d_matches_to_3d
    from fusion4landslide_tpu.pipelines.fusion_device import _chain_2d_device

    Ns, Nt, P = 300, 280, 150
    uv_s = rng.uniform(0, 512, size=(Ns, 2)).astype(np.float32)
    uv_t = rng.uniform(0, 512, size=(Nt, 2)).astype(np.float32)
    # Matches: src endpoints near a subset of src projections, tgt
    # endpoints near random tgt projections.
    si = rng.integers(0, Ns, size=P)
    ti = rng.integers(0, Nt, size=P)
    pix = np.concatenate(
        [
            uv_s[si] + rng.normal(scale=1.0, size=(P, 2)),
            uv_t[ti] + rng.normal(scale=1.0, size=(P, 2)),
        ],
        axis=1,
    ).astype(np.float32)
    pv_s = rng.random(Ns) < 0.9
    pv_t = rng.random(Nt) < 0.9
    pmask = np.ones(P, bool)
    thr = 5.0

    want_idx, want_ok = chain_2d_matches_to_3d(
        jnp.asarray(pix), jnp.asarray(uv_s), jnp.asarray(uv_t), thr,
        corres_mask=jnp.asarray(pmask), src_valid=jnp.asarray(pv_s),
        tgt_valid=jnp.asarray(pv_t), mode=mode,
    )
    got_idx, got_ok = jax.jit(
        _chain_2d_device, static_argnames=("mode",)
    )(uv_s, pv_s, uv_t, pv_t, pix, pmask, thr, mode=mode)
    np.testing.assert_array_equal(np.asarray(got_ok), np.asarray(want_ok))
    ok = np.asarray(want_ok)
    np.testing.assert_array_equal(
        np.asarray(got_idx)[ok], np.asarray(want_idx)[ok]
    )


def _fusion_params(rng_key=0):
    dips = PointNetFeature().init(
        jax.random.PRNGKey(rng_key), np.zeros((2, 16, 3), np.float32)
    )
    agg = ClusterFeatureNet().init(
        jax.random.PRNGKey(rng_key + 1),
        np.zeros((2, 8, 64), np.float32),
        np.ones((2, 8), bool),
    )
    return dips, agg


def _scene(rng, n=220, shift=(0.02, -0.015, 0.01)):
    """Synthetic epoch pair + ideal pixel matches through the cameras."""
    from fusion4landslide_tpu.image.geometry import project_points

    base = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    shift = np.asarray(shift, np.float32)
    tgt = base + shift
    sub = np.arange(0, n, 2)
    uv_s, _, ok_s = project_points(
        jnp.asarray(base[sub]), jnp.asarray(EXTRINSIC),
        jnp.asarray(INTRINSIC), IMAGE_SIZE, v_flip=True,
    )
    uv_t, _, ok_t = project_points(
        jnp.asarray(tgt[sub]), jnp.asarray(EXTRINSIC),
        jnp.asarray(INTRINSIC), IMAGE_SIZE, v_flip=True,
    )
    keep = np.asarray(ok_s & ok_t)
    pix = np.concatenate(
        [np.asarray(uv_s)[keep], np.asarray(uv_t)[keep]], axis=1
    ).astype(np.float32)
    return base, tgt, shift, pix


def _rgb_cfg(tmp_path, **extra):
    from fusion4landslide_tpu.config import Config

    cfg = {
        "output_dir": str(tmp_path),
        "output_folder": "run",
        "feat_k_max": 16,
        "feat_patch_points": 16,
        "feat_chunk": 32,
        "sv_cap": 64,
        "member_cap": 64,
        "agg_max_points": 32,
        "num_min_matches_for_small_patch": 3,
        "level_of_superpoint": [1],
        "max_magnitude": 10.0,
        "icp_threshold": 0.1,
        "image_size": list(IMAGE_SIZE),
        "pixel_thres": 5.0,
        "dataset": "brienz_tls",  # v_flip on, matching the generated pix
        "output_tgt2src": True,
    }
    cfg.update(extra)
    return Config(cfg)


@needs_mesh
@pytest.mark.slow  # r5 fast-suite trim: matches_host_tile[nn_search] keeps
# the fast-lane RGB-sharded coverage; recovery also asserted by bench.py
@pytest.mark.parametrize(
    "coarse_only_2d",
    [False, pytest.param(True, marks=pytest.mark.slow)],
)
def test_sharded_fusion_rgb_recovers_shift(rng, tmp_path, coarse_only_2d):
    from fusion4landslide_tpu.parallel import (
        run_fusion3d_tiles_sharded,
        tile_mesh,
    )

    dips, agg = _fusion_params()
    base, tgt, shift, pix = _scene(rng)
    tiles = [(i, base + i * 0.001, tgt + i * 0.001) for i in range(8)]
    kit = {
        "pix": [pix],
        "intrinsic": INTRINSIC,
        "src_extrinsics": [EXTRINSIC],
        "tgt_extrinsics": [EXTRINSIC],
    }
    cfg = _rgb_cfg(
        tmp_path, coarse_matching_only_2d=coarse_only_2d,
    )
    res = run_fusion3d_tiles_sharded(
        cfg, dips, agg, tiles, mesh=tile_mesh(8), rng_seed=0,
        image_kit_fn=lambda tid, s, t: kit, pix_cap=256, n_image_pairs=1,
    )
    assert set(res) == set(range(8))
    got = np.loadtxt(
        tmp_path / "run" / "results" / "c2f_dvfs_src2tgt_tile_3.txt"
    )
    assert got.shape[0] > 50
    np.testing.assert_allclose(
        got[:, 3:6] - got[:, :3],
        np.tile(shift, (got.shape[0], 1)),
        atol=1e-3,
    )


@needs_mesh
@pytest.mark.parametrize(
    "lifting",
    ["nn_search", pytest.param("interpolation", marks=pytest.mark.slow)],
)
def test_sharded_fusion_rgb_matches_host_tile(rng, tmp_path, lifting):
    """Mesh on/off consistency for the full RGB+3D method: the sharded
    runner and the serial host tile produce the same displacement field
    (both consume the same injected pixel matches; the device path's
    grid-bounded pixel NN and deterministic pair-union are equivalent on
    a clean scene). Covers both lifting types: pixel-space NN chaining
    (nn_search) and depth-map interpolation lifting (base:664-728)."""
    from fusion4landslide_tpu.config import Config
    from fusion4landslide_tpu.parallel import (
        run_fusion3d_tiles_sharded,
        tile_mesh,
    )
    from fusion4landslide_tpu.pipelines.fusion import run_fusion_tile

    dips, agg = _fusion_params()
    base, tgt, shift, pix = _scene(rng)
    common = {
        "feat_k_max": 16,
        "feat_patch_points": 16,
        "feat_chunk": 32,
        "agg_max_points": 32,
        "num_min_matches_for_small_patch": 3,
        "level_of_superpoint": [1],
        "max_magnitude": 10.0,
        "icp_threshold": 0.1,
        "image_size": list(IMAGE_SIZE),
        "pixel_thres": 5.0,
        "dataset": "brienz_tls",
        "lifting_type": lifting,
    }
    host_cfg = dict(
        common, output_dir=str(tmp_path), output_folder="host"
    )
    dummy = np.zeros((*IMAGE_SIZE, 3), np.uint8)
    host = run_fusion_tile(
        host_cfg, dips, agg, base, tgt, dummy, dummy,
        INTRINSIC, EXTRINSIC, EXTRINSIC, corres_2d=pix, tile_id=0,
    )
    kit = {
        "pix": [pix],
        "intrinsic": INTRINSIC,
        "src_extrinsics": [EXTRINSIC],
        "tgt_extrinsics": [EXTRINSIC],
    }
    sh_cfg = Config(
        dict(common, output_dir=str(tmp_path), output_folder="sharded",
             sv_cap=64, member_cap=64)
    )
    sh = run_fusion3d_tiles_sharded(
        sh_cfg, dips, agg, [("0", base, tgt)], mesh=tile_mesh(8),
        rng_seed=0, image_kit_fn=lambda tid, s, t: kit, pix_cap=256,
        n_image_pairs=1,
    )
    h_dvfs = host["dvfs"]
    s_dvfs = sh["0"]["dvfs"]
    assert abs(len(h_dvfs) - len(s_dvfs)) <= 0.1 * max(len(h_dvfs), 1)
    # Compare displacement vectors on commonly-assigned source points.
    h_map = {tuple(np.round(r[:3], 5)): r[3:6] - r[:3] for r in h_dvfs}
    deltas = [
        np.linalg.norm((r[3:6] - r[:3]) - h_map[tuple(np.round(r[:3], 5))])
        for r in s_dvfs
        if tuple(np.round(r[:3], 5)) in h_map
    ]
    assert len(deltas) > 0.8 * len(s_dvfs)
    assert np.median(deltas) < 1e-3


@pytest.mark.slow
@needs_mesh
def test_sharded_fusion_rgb_multi_image_fill_in(rng, tmp_path):
    """num_sub_img > 1 on the mesh: two image pairs whose pixel-match
    tables each cover HALF the scene only recover the full field when the
    per-pair channels fill-in merge (base:1940-1953) — drive with
    coarse_matching_only_2d so coverage comes from the 2D channel alone."""
    from fusion4landslide_tpu.config import Config
    from fusion4landslide_tpu.parallel import (
        run_fusion3d_tiles_sharded,
        tile_mesh,
    )

    dips, agg = _fusion_params()
    base, tgt, shift, pix = _scene(rng, n=300)
    # Split the matches spatially: pair 0 sees the left half (src u below
    # the median), pair 1 the right half.
    left = pix[:, 0] < np.median(pix[:, 0])
    kit = {
        "pix": [pix[left], pix[~left]],
        "intrinsic": INTRINSIC,
        "src_extrinsics": [EXTRINSIC, EXTRINSIC],
        "tgt_extrinsics": [EXTRINSIC, EXTRINSIC],
    }
    cfg = _rgb_cfg(tmp_path, coarse_matching_only_2d=True)
    res = run_fusion3d_tiles_sharded(
        cfg, dips, agg, [(i, base, tgt) for i in range(8)],
        mesh=tile_mesh(8), rng_seed=0,
        image_kit_fn=lambda tid, s, t: kit, pix_cap=256, n_image_pairs=2,
    )
    got = np.loadtxt(
        tmp_path / "run" / "results" / "c2f_dvfs_src2tgt_tile_0.txt"
    )
    assert got.shape[0] > 50
    np.testing.assert_allclose(
        got[:, 3:6] - got[:, :3],
        np.tile(shift, (got.shape[0], 1)),
        atol=1e-3,
    )
    # Both halves of the scene recovered (fill-in across the two pairs).
    xs = got[:, 0]
    assert (xs < np.median(base[:, 0])).sum() > 20
    assert (xs > np.median(base[:, 0])).sum() > 20


@pytest.mark.slow
@needs_mesh
def test_sharded_fusion_rgb_with_superpoint_partitions(rng, tmp_path):
    """The flagship fusion_brienz combination: partition_type=superpoint
    (host-generated per-point labels fed into the step) together with the
    RGB 2D-match channel, both through the sharded runner."""
    from fusion4landslide_tpu.config import Config
    from fusion4landslide_tpu.parallel import (
        run_fusion3d_tiles_sharded,
        tile_mesh,
    )

    dips, agg = _fusion_params()
    base, tgt, shift, pix = _scene(rng)
    tiles = [(i, base, tgt) for i in range(8)]
    kit = {
        "pix": [pix],
        "intrinsic": INTRINSIC,
        "src_extrinsics": [EXTRINSIC],
        "tgt_extrinsics": [EXTRINSIC],
    }
    cfg = _rgb_cfg(
        tmp_path,
        partition_type="superpoint",
        level_of_superpoint=[1, 2],
        sv_cap=64,
        member_cap=64,
    )
    res = run_fusion3d_tiles_sharded(
        cfg, dips, agg, tiles, mesh=tile_mesh(8), rng_seed=0,
        image_kit_fn=lambda tid, s, t: kit, pix_cap=256, n_image_pairs=1,
    )
    assert set(res) == set(range(8))
    part = tmp_path / "run" / "superpoint_partition"
    assert (part / "partition_of_input_src_tile_2.txt").exists()
    got = np.loadtxt(
        tmp_path / "run" / "results" / "c2f_dvfs_src2tgt_tile_2.txt"
    )
    assert got.shape[0] > 50
    np.testing.assert_allclose(
        got[:, 3:6] - got[:, :3],
        np.tile(shift, (got.shape[0], 1)),
        atol=1e-3,
    )


@needs_mesh
@pytest.mark.slow  # r5 fast-suite trim: the driver runs dryrun_multichip
# (8 virtual devices, full RGB step) every round
def test_sharded_fusion_rgb_step_8dev_matches_1dev(rng):
    from fusion4landslide_tpu.parallel import (
        make_sharded_fusion3d_step,
        tile_mesh,
    )

    dips, agg = _fusion_params()
    base, tgt, shift, pix = _scene(rng, n=96)
    T = 8
    N = 96
    src_b = np.stack([base + i * 0.001 for i in range(T)])
    tgt_b = np.stack([tgt + i * 0.001 for i in range(T)])
    mask = np.ones((T, N), bool)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(T, dtype=jnp.uint32))
    scal = lambda v, dt=np.float32: np.full((T,), v, dt)  # noqa: E731
    Pc = 128
    pixb = np.zeros((T, 1, Pc, 4), np.float32)
    pixb[:, 0, : min(len(pix), Pc)] = pix[:Pc]
    cntb = np.full((T, 1), min(len(pix), Pc), np.int32)
    args = (
        src_b, mask, tgt_b, mask, keys, scal(10.0), scal(0.1), scal(0.0),
        scal(10, np.int32), scal(10, np.int32), scal(0.5), scal(0.15),
        pixb, cntb,
        np.tile(INTRINSIC, (T, 1, 1)),
        np.tile(EXTRINSIC, (T, 1, 1, 1)).reshape(T, 1, 4, 4),
        np.tile(EXTRINSIC, (T, 1, 1, 1)).reshape(T, 1, 4, 4),
        np.zeros((T, 3), np.float32),
        scal(5.0),
    )
    statics = dict(
        levels=(1,),
        k_max=16,
        patch_points=16,
        chunk=32,
        k_neighbors=8,
        sv_cap=64,
        member_cap=64,
        agg_max_points=32,
        small_patch=3,
        icp_max_iter=8,
        fine_max_matches=64,
        with_sparse=True,
        with_tgt2src=True,
        image_size=IMAGE_SIZE,
        v_flip=True,
    )
    out8 = make_sharded_fusion3d_step(
        tile_mesh(8), dips, agg, with_image_inputs=True, **statics
    )(*args)
    out1 = make_sharded_fusion3d_step(
        tile_mesh(1), dips, agg, with_image_inputs=True, **statics
    )(*args)
    np.testing.assert_allclose(
        np.asarray(out8.moved), np.asarray(out1.moved), atol=2e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out8.valid), np.asarray(out1.valid)
    )
