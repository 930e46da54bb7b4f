"""F2S3 pipeline stages on synthetic deformation scenes.

Runs with *random* DIPs weights: descriptors of identical local geometry are
identical regardless of weights, so a rigidly moved region still matches its
counterpart in feature space; the supervoxel-wise robust Kabsch re-fit then
recovers the motion. (Checkpoint parity of the nets themselves is covered by
test_models.py.)
"""

import jax
import numpy as np
import pytest

from fusion4landslide_tpu.models.dips import PointNetFeature
from fusion4landslide_tpu.models.filtering import FilteringNetwork
from fusion4landslide_tpu.pipelines.f2s3 import (
    compute_dips_features,
    prune_supervoxel_correspondences,
    run_f2s3_tile,
)


@pytest.fixture(scope="module")
def dips():
    model = PointNetFeature()
    params = model.init(
        jax.random.PRNGKey(0), np.zeros((2, 64, 3), np.float32)
    )
    return model, params


@pytest.fixture(scope="module")
def filt():
    model = FilteringNetwork(num_layers=2)
    params = model.init(
        jax.random.PRNGKey(1), np.zeros((16, 6), np.float32), np.ones(16, bool)
    )
    return model, params


def rough_surface(rng, n=700, extent=12.0):
    xy = rng.uniform(0, extent, size=(n, 2))
    z = (
        np.sin(xy[:, 0] * 1.7) * 0.6
        + np.cos(xy[:, 1] * 2.3) * 0.4
        + rng.normal(scale=0.05, size=n)
    )
    return np.column_stack([xy, z]).astype(np.float32)


def test_descriptors_shift_invariant(dips, rng):
    """Identical local geometry at a different absolute position gives the
    same descriptor (the LRF centres patches)."""
    _, params = dips
    pts = rough_surface(rng, n=400)
    shifted = pts + np.array([100.0, -50.0, 10.0], np.float32)
    f1 = np.asarray(
        compute_dips_features(
            params, pts, pts, 3.0, jax.random.PRNGKey(2),
            k_max=128, patch_points=64, chunk=128,
        )
    )
    f2 = np.asarray(
        compute_dips_features(
            params, shifted, shifted, 3.0, jax.random.PRNGKey(2),
            k_max=128, patch_points=64, chunk=128,
        )
    )
    np.testing.assert_allclose(f1, f2, atol=1e-3)
    assert np.abs(np.linalg.norm(f1, axis=1) - 1.0).max() < 1e-4


def test_prune_recovers_rigid_shift(filt, rng):
    """Correspondences with outliers per supervoxel -> robust re-fit."""
    _, params = filt
    n = 300
    src = rng.normal(size=(n, 3)).astype(np.float32)
    shift = np.array([0.2, -0.1, 0.05], np.float32)
    tgt = src + shift
    # corrupt 10% with moderate outliers. (The robust re-fit gate requires
    # the initial residual median < 0.5, outlier_classifier.py:91; with
    # random net weights the initial fit is near-unweighted, so keep the
    # contamination small enough for that gate — the trained checkpoint
    # handles grosser contamination by downweighting.)
    bad = rng.random(n) < 0.1
    tgt_corrupt = tgt.copy()
    tgt_corrupt[bad] += rng.normal(scale=1.0, size=(bad.sum(), 3)).astype(
        np.float32
    )
    corr = np.hstack([src, tgt_corrupt])
    labels = (np.arange(n) % 3).astype(np.int32)  # 3 supervoxels of 100
    out, keep = prune_supervoxel_correspondences(params, corr, labels)
    assert keep.sum() > 0.9 * n  # robust path keeps all points
    est = out[:, 3:6] - out[:, :3]
    np.testing.assert_allclose(
        np.median(est, axis=0), shift, atol=0.02
    )


@pytest.mark.slow
def test_run_f2s3_tile_end_to_end(dips, filt, tmp_path, rng):
    _, dips_params = dips
    _, filt_params = filt
    src = rough_surface(rng, n=700)
    shift = np.array([0.15, 0.0, 0.1], np.float32)
    moving = src[:, 0] > 6.0
    tgt = src.copy()
    tgt[moving] += shift

    cfg = {
        "voxel_size": 0.1,
        "max_disp_magnitude": 5.0,
        "filter_median_magnitude": False,
        "fill_gaps_c2c": True,
        "refine_results": True,
        "n_normals": 15,
        "small_patch_removal": True,
        "output_dir": str(tmp_path),
        "output_folder": "run",
        "dataset": "brienz_tls",
    }
    out = run_f2s3_tile(
        cfg,
        dips_params,
        filt_params,
        src.astype(np.float64) + 500.0,
        tgt.astype(np.float64) + 500.0,
        tile_id=0,
    )
    results = tmp_path / "run" / "results"
    assert (results / "f2s3_dvfs_of_tile_0.txt").exists()
    assert (results / "f2s3_dvfms_of_tile_0.txt").exists()
    assert (results / "f2s3_dvfms_without_pruning_of_tile_0.txt").exists()
    assert (results / "combined_with_c2c").is_dir()
    dvfs = out["dvfs"]
    assert dvfs.shape[0] > 0.5 * len(src)
    # outputs restored to the original georeferenced frame
    assert 500.0 < dvfs[:, 0].mean() < 520.0
    # displacement signal: moving-region magnitudes exceed stable-region ones
    mags = out["magnitudes"]
    kept_src = dvfs[:, :3] - 500.0
    kept_moving = kept_src[:, 0] > 7.0
    kept_stable = kept_src[:, 0] < 5.0
    if kept_moving.sum() > 20 and kept_stable.sum() > 20:
        assert np.median(mags[kept_moving]) > np.median(mags[kept_stable])


def test_dips_padding_skip_interior_hole_mask(rng):
    """The network-skip gate uses last-valid-index+1, so masks with
    interior holes keep bitwise-identical descriptors for every valid row
    (a mask-sum gate would zero valid rows past the sum)."""
    import jax
    import jax.numpy as jnp

    from fusion4landslide_tpu.models.dips import PointNetFeature
    from fusion4landslide_tpu.pipelines.f2s3_device import (
        dips_features_device,
    )

    n = 64
    pts = rng.uniform(0, 3, size=(n, 3)).astype(np.float32)
    mask = np.ones(n, bool)
    mask[8:24] = False  # interior hole: sum(mask)=44 < last valid row 47
    mask[48:] = False
    params = PointNetFeature().init(
        jax.random.PRNGKey(0), np.zeros((2, 16, 3), np.float32)
    )
    kw = dict(k_max=16, patch_points=16, chunk=16)
    radius = jnp.asarray(1.0, jnp.float32)
    key = jax.random.PRNGKey(1)
    qc = jnp.max(jnp.where(jnp.asarray(mask), jnp.arange(n) + 1, 0))
    assert int(qc) == 48 and int(np.sum(mask)) < int(qc)
    gated = np.asarray(
        dips_features_device(
            params, pts, pts, mask, radius, key, query_count=qc, **kw
        )
    )
    full = np.asarray(
        dips_features_device(params, pts, pts, mask, radius, key, **kw)
    )
    np.testing.assert_array_equal(gated[:48], full[:48])
    assert np.all(gated[48:] == 0)
