"""2D→3D lifting/matching modes and multi-image camera selection
(reference base:387-470 + 1599-1620 matches_from_2d_type, base:320-384 +
664-728 interpolation lifting, base:730-858 image selection,
base:1940-1953 multi-image fill-in merge)."""

import numpy as np
import jax.numpy as jnp

from fusion4landslide_tpu.image.geometry import (
    bilinear_depth,
    chain_2d_matches_to_3d,
    lift_matches_to_3d,
    project_points,
    rasterize_depth,
)


def _chain(mode, corres, src_uv, tgt_uv, thr=3.0):
    t_idx, valid = chain_2d_matches_to_3d(
        jnp.asarray(corres, jnp.float32),
        jnp.asarray(src_uv, jnp.float32),
        jnp.asarray(tgt_uv, jnp.float32),
        thr,
        mode=mode,
    )
    return np.asarray(t_idx), np.asarray(valid)


def test_matches_from_2d_modes():
    # Two source points near the SAME match src-endpoint: the reverse chain
    # can only map back to one of them -> the other is valid under
    # nn_src_only but fails nn_mutual.
    src_uv = np.array([[10.0, 10.0], [11.0, 10.0], [50.0, 50.0]])
    tgt_uv = np.array([[30.0, 10.0], [70.0, 50.0]])
    corres = np.array(
        [
            [10.0, 10.0, 30.0, 10.0],  # links src 0/1 -> tgt 0
            [50.0, 50.0, 70.0, 50.0],  # links src 2 -> tgt 1
        ]
    )
    idx_src, v_src = _chain("nn_src_only", corres, src_uv, tgt_uv)
    assert v_src.tolist() == [True, True, True]
    np.testing.assert_array_equal(idx_src, [0, 0, 1])

    idx_m, v_m = _chain("nn_mutual", corres, src_uv, tgt_uv)
    # Reverse: tgt 0 -> match 0 -> nearest src = src 0 (exact), so only
    # src 0 is mutual; src 1 loses. src 2 <-> tgt 1 mutual.
    assert v_m.tolist() == [True, False, True]

    idx_u, v_u = _chain("nn_union", corres, src_uv, tgt_uv)
    # Union still requires the back-pointer (tgt2src[i] == n).
    assert v_u.tolist() == [True, False, True]

    # A source point whose forward hop fails but whose target maps back:
    # src 0 moved just beyond the pixel threshold of the match endpoint.
    src_uv2 = src_uv.copy()
    src_uv2[0] = [14.0, 10.0]  # 4 px from match endpoint, thr = 3 -> fails fwd
    _, v_src2 = _chain("nn_src_only", corres, src_uv2, tgt_uv)
    assert not v_src2[0]
    _, v_u2 = _chain("nn_union", corres, src_uv2, tgt_uv)
    # Reverse chain: tgt 0 -> match 0 src endpoint (10,10) -> nearest src is
    # still point 0 at 4 px < thr? No: 4 px > 3 px, reverse hop2 fails too.
    assert not v_u2[0]
    # Loosen the reverse threshold by moving the point to 2.5 px: forward
    # uses the same threshold, so use asymmetric geometry instead — the
    # match endpoint *on the tgt side* stays exact, making the reverse
    # chain valid while the forward one fails only by the order of hops.
    src_uv3 = src_uv.copy()
    src_uv3[0] = [12.5, 10.0]
    src_uv3[1] = [80.0, 80.0]  # move the competing point away
    _, v_fwd3 = _chain("nn_src_only", corres, src_uv3, tgt_uv)
    assert v_fwd3[0]  # 2.5 px < 3 px: both directions fine
    _, v_m3 = _chain("nn_mutual", corres, src_uv3, tgt_uv)
    assert v_m3[0]


def test_interpolation_lifting_roundtrip(rng):
    # Pinhole camera at origin looking +z; points on a grid at z ~ 5.
    K = np.array([[100.0, 0, 32.0], [0, 100.0, 32.0], [0, 0, 1.0]])
    image_size = (64, 64)
    g = np.stack(
        np.meshgrid(np.linspace(-1, 1, 12), np.linspace(-1, 1, 12)),
        axis=-1,
    ).reshape(-1, 2)
    pts = np.column_stack([g, 5.0 + 0.1 * rng.normal(size=len(g))]).astype(
        np.float32
    )
    ext = np.eye(4, dtype=np.float32)
    uv, depth, valid = project_points(
        jnp.asarray(pts), jnp.asarray(ext), jnp.asarray(K), image_size,
        v_flip=False,
    )
    assert bool(np.asarray(valid).all())
    dmap, _ = rasterize_depth(uv, depth, valid, image_size)

    d_at, ok = bilinear_depth(dmap, uv)
    assert bool(np.asarray(ok).all())
    np.testing.assert_allclose(np.asarray(d_at), np.asarray(depth), atol=1e-5)

    # Matches: point i in "src" matched to point i in "tgt" (same camera).
    n = len(pts)
    corres = np.hstack([np.asarray(uv), np.asarray(uv)]).astype(np.float32)
    p3d, ok3 = lift_matches_to_3d(
        jnp.asarray(corres), dmap, dmap, jnp.asarray(ext), jnp.asarray(ext),
        jnp.asarray(K), image_size, v_flip=False,
    )
    p3d = np.asarray(p3d)
    ok3 = np.asarray(ok3)
    assert ok3.all()
    # The floor-pixel depth lookup ('single_closest', the reference's
    # executed path) reconstructs each point to sub-voxel accuracy here
    # (points are > 1 px apart so each owns its pixel).
    np.testing.assert_allclose(p3d[:, :3], pts, atol=0.15)
    np.testing.assert_allclose(p3d[:, 3:6], pts, atol=0.15)


def test_select_best_images(rng):
    from fusion4landslide_tpu.image.cameras import select_best_images

    K = np.array([[100.0, 0, 32.0], [0, 100.0, 32.0], [0, 0, 1.0]])
    pts = rng.uniform(-1, 1, size=(500, 3)).astype(np.float32)
    pts[:, 2] += 5.0
    look_at = np.eye(4)  # sees the cloud
    look_away = np.eye(4)
    look_away[:3, :3] = np.diag([1.0, -1.0, -1.0])  # rotated 180° about x
    shifted = np.eye(4)
    shifted[0, 3] = 50.0  # cloud far outside the frustum
    entries = [("away", look_away), ("good", look_at), ("shifted", shifted)]
    best = select_best_images(pts, entries, K, (64, 64), num=2, v_flip=False)
    assert best[0][0] == "good"
    assert len(best) == 2


import pytest


@pytest.mark.slow
def test_multi_image_fill_in(tmp_path, rng):
    """Two image pairs: the first camera only sees half the tile, the
    second sees the other half; the fill-in merge recovers matches over
    both halves (base:1940-1953)."""
    import jax

    from fusion4landslide_tpu.models.aggregation import ClusterFeatureNet
    from fusion4landslide_tpu.models.dips import PointNetFeature
    from fusion4landslide_tpu.pipelines.fusion import run_fusion_tile

    dips_params = PointNetFeature().init(
        jax.random.PRNGKey(0), np.zeros((2, 16, 3), np.float32)
    )
    agg_params = ClusterFeatureNet().init(
        jax.random.PRNGKey(1),
        np.zeros((2, 8, 64), np.float32),
        np.ones((2, 8), bool),
    )
    n = 400
    pts = rng.uniform(-1, 1, size=(n, 3)).astype(np.float64)
    pts[:, 2] += 5.0
    src = pts
    tgt = pts.copy()  # zero displacement; only the 2D channel is probed

    # Narrow FOV: the ZNCC margin (patch/2 + search = 40 px) leaves a
    # central band u in (40, 56) -> world x of about +-0.13 around each
    # camera's pan, so the two cameras cover disjoint halves.
    K = np.array([[300.0, 0, 48.0], [0, 300.0, 64.0], [0, 0, 1.0]])
    image_size = (128, 96)
    ext_left = np.eye(4)
    ext_left[0, 3] = 0.55  # pans towards the x < 0 half
    ext_right = np.eye(4)
    ext_right[0, 3] = -0.55
    img = rng.uniform(0, 255, size=image_size).astype(np.float32)

    cfg = {
        "max_magnitude": 5.0,
        "icp_threshold": 0.3,
        "level_of_superpoint": [1],
        "num_min_fine_match": 5,
        "num_min_matches_for_small_patch": 3,
        "voxel_size_init": 0.05,
        "assign_type": "assign",
        "output_dir": str(tmp_path),
        "output_folder": "run",
        "dataset": "rockfall_simulator",  # v_flip off
        "image_size": list(image_size),
        "pixel_thres": 3,
        "img_matching_type": "zncc",
        "feat_k_max": 16,
        "feat_patch_points": 16,
        "feat_chunk": 64,
    }
    kw = dict(tile_id=0, logger=None)
    single = run_fusion_tile(
        cfg, dips_params, agg_params, src, tgt,
        img, img, K, ext_left, ext_left, **kw,
    )
    both = run_fusion_tile(
        cfg, dips_params, agg_params, src, tgt,
        img, img, K, ext_left, ext_left,
        src_images=[img, img],
        tgt_images=[img, img],
        src_extrinsics=[ext_left, ext_right],
        tgt_extrinsics=[ext_left, ext_right],
        **kw,
    )
    # The second camera pair adds matches the first could not see.
    assert both["n_2d_matches"] > single["n_2d_matches"] > 0
