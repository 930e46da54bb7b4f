"""gated_feature_nn1: banded magnitude-gated feature 1-NN vs a numpy brute
reference (gate-then-search). Banding must be exact — it only excludes
targets that the magnitude gate excludes anyway."""

import numpy as np

from fusion4landslide_tpu.ops.gated_match import gated_feature_nn1


def _brute(qf, rf, qx, rx, mm, qv, rv):
    d2 = ((qf[:, None, :] - rf[None, :, :]) ** 2).sum(-1)
    c2 = ((qx[:, None, :] - rx[None, :, :]) ** 2).sum(-1)
    bad = (c2 > mm * mm) | ~rv[None, :] | ~qv[:, None]
    d2 = np.where(bad, np.inf, d2)
    idx = d2.argmin(axis=1)
    best = d2[np.arange(len(qf)), idx]
    return best, idx, np.isfinite(best)


def test_gated_matches_brute(rng):
    N, M, D = 700, 900, 16
    qx = rng.uniform(0, 30, size=(N, 3)).astype(np.float32)
    rx = rng.uniform(0, 30, size=(M, 3)).astype(np.float32)
    qx[:, 2] *= 0.05
    rx[:, 2] *= 0.05
    qf = rng.normal(size=(N, D)).astype(np.float32)
    rf = rng.normal(size=(M, D)).astype(np.float32)
    qv = rng.random(N) < 0.9
    rv = rng.random(M) < 0.9
    mm = 4.0

    want_d, want_i, want_ok = _brute(qf, rf, qx, rx, mm, qv, rv)
    got_d, got_i, got_ok = gated_feature_nn1(
        qf, rf, qx, rx, mm, qv, rv, query_block=128, chunk=256, n_bands=6
    )
    got_d = np.asarray(got_d)
    got_i = np.asarray(got_i)
    np.testing.assert_array_equal(np.asarray(got_ok), want_ok)
    np.testing.assert_allclose(got_d[want_ok], want_d[want_ok], rtol=2e-4)
    # Indices agree wherever distances aren't near-ties (random floats: all).
    np.testing.assert_array_equal(got_i[want_ok], want_i[want_ok])


def test_gated_empty_and_degenerate(rng):
    N, M, D = 64, 96, 8
    qx = rng.uniform(0, 5, size=(N, 3)).astype(np.float32)
    rx = rng.uniform(100, 105, size=(M, 3)).astype(np.float32)  # out of gate
    qf = rng.normal(size=(N, D)).astype(np.float32)
    rf = rng.normal(size=(M, D)).astype(np.float32)
    _, _, ok = gated_feature_nn1(qf, rf, qx, rx, 2.0)
    assert not np.asarray(ok).any()
    # All-masked references.
    _, _, ok2 = gated_feature_nn1(
        qf, rf, qx, rx, 2.0, ref_valid=np.zeros(M, bool)
    )
    assert not np.asarray(ok2).any()


def test_gated_matches_global_semantics_on_clean_scene(rng):
    """Where the GLOBAL feature-NN is in-gate (a well-matched clean scene),
    gate-then-search equals the reference's search-then-gate — the
    production default's deviation is confined to reference-unmatched
    voxels."""
    from fusion4landslide_tpu.pipelines.fusion import global_matches_3d

    N, D = 800, 16
    x = rng.uniform(0, 20, size=(N, 3)).astype(np.float32)
    f = rng.normal(size=(N, D)).astype(np.float32)
    # Target = same cloud, tiny shift; features nearly identical.
    rx = x + np.float32(0.01)
    rf = f + rng.normal(scale=1e-3, size=(N, D)).astype(np.float32)
    g_idx, g_ok = global_matches_3d(f, rf, x, rx, 1.0)
    _, s_idx, s_ok = gated_feature_nn1(
        f, rf, x, rx, 1.0, query_block=256, chunk=512, n_bands=8
    )
    g_idx, g_ok = np.asarray(g_idx), np.asarray(g_ok)
    s_idx, s_ok = np.asarray(s_idx), np.asarray(s_ok)
    assert g_ok.all()
    np.testing.assert_array_equal(s_ok, g_ok)
    np.testing.assert_array_equal(s_idx, g_idx)
