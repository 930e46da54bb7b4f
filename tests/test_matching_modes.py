"""Cross-crop pairing + search-bound handling in match_epoch_images
(reference cross-pairing loop base:1125-1233; the round-1 silent failure
mode: flows beyond the ZNCC search window or crop overlap produced zero
matches with no diagnostic)."""

import logging

import numpy as np
import pytest

from fusion4landslide_tpu.image import matching as M


def _textured(rng, h, w):
    img = rng.uniform(0, 255, size=(h, w)).astype(np.float32)
    # Smooth a little so ZNCC has gradients, keep texture.
    img = (img + np.roll(img, 1, 0) + np.roll(img, 1, 1)) / 3
    return img


def test_zncc_search_widens_with_max_flow(rng):
    # Small image + small widened window: the widened ZNCC kernel compile
    # dominated the suite at 160px/52px (347 s); 96px/24px checks the same
    # widening logic in seconds.
    img0 = _textured(rng, 96, 96)
    shift = 13  # beyond the search window passed below
    img1 = np.roll(img0, shift, axis=1)
    near_default = M.match_epoch_images(
        img0, img1, matcher="zncc", search=6, min_score=0.8
    )
    # With a too-small search bound the true flow is unreachable: no match
    # reports the actual displacement.
    if near_default.size:
        assert np.abs(near_default[:, 2] - near_default[:, 0]).max() < shift
    widened = M.match_epoch_images(
        img0, img1, matcher="zncc", search=6, min_score=0.8,
        max_flow_px=shift + 3,
    )
    assert widened.shape[0] > 10
    flow = widened[:, 2] - widened[:, 0]
    assert abs(np.median(flow) - shift) < 0.5


def test_zncc_near_bound_warning(rng, caplog):
    img0 = _textured(rng, 128, 128)
    img1 = np.roll(img0, 14, axis=1)  # median flow ~14 vs bound 16
    logger = logging.getLogger("test_zncc_bound")
    with caplog.at_level(logging.WARNING, logger="test_zncc_bound"):
        M.match_epoch_images(
            img0, img1, matcher="zncc", search=16, min_score=0.5,
            logger=logger,
        )
    assert any("search bound" in r.message for r in caplog.records)


def test_cross_crop_pairing_finds_large_motion(rng, monkeypatch):
    """A flow larger than the crop overlap yields zero matches with
    same-position pairing and is recovered by cross_crops pairing."""
    h = w = 96
    crop = (48, 48)
    overlap = (16, 16)
    shift = 32  # = crop step; content moves one full crop to the right
    img0 = _textured(rng, h, w)
    img1 = np.roll(img0, shift, axis=1)

    calls = []

    def fake_matcher(c0, c1, **kw):
        calls.append((c0.shape, c1.shape))
        # "Learned" matcher stub: match iff the crops show the same content
        # (used to isolate the crop-pairing geometry from matcher quality).
        if c0.shape == c1.shape and np.allclose(c0, c1):
            return np.asarray([[8.0, 8.0, 8.0, 8.0]], np.float32)
        return np.zeros((0, 4), np.float32)

    monkeypatch.setitem(M.MATCHERS, "fake", fake_matcher)

    same_pos = M.match_epoch_images(
        img0, img1, matcher="fake", crop_size=crop, overlap_size=overlap
    )
    assert same_pos.shape[0] == 0  # round-1 failure mode

    crossed = M.match_epoch_images(
        img0, img1, matcher="fake", crop_size=crop, overlap_size=overlap,
        cross_crops=True,
    )
    assert crossed.shape[0] > 0
    flow = crossed[:, 2] - crossed[:, 0]
    assert np.all(flow == shift)

    # max_flow_px beyond half the overlap auto-enables cross pairing.
    auto = M.match_epoch_images(
        img0, img1, matcher="fake", crop_size=crop, overlap_size=overlap,
        max_flow_px=float(shift),
    )
    assert auto.shape[0] > 0


def test_zncc_matches_brute_force(rng):
    """The grouped-conv ZNCC core computes exactly the per-patch
    zero-normalised correlation: argmax offset and score agree with a
    direct numpy evaluation over every candidate patch."""
    import fusion4landslide_tpu.image.matching as M

    h = w = 64
    img0 = rng.normal(size=(h, w)).astype(np.float32) * 20 + 100
    img1 = rng.normal(size=(h, w)).astype(np.float32) * 20 + 100
    patch, search, step = 8, 5, 4
    centers, fy, fx, score, _tex = (
        np.asarray(a)
        for a in M._zncc_core(img0, img1, step, patch, search)
    )
    half = patch // 2
    for i in range(0, len(centers), 7):
        cy, cx = centers[i]
        t = img0[cy - half : cy - half + patch,
                 cx - half : cx - half + patch].reshape(-1)
        t = t - t.mean()
        t = t / (np.linalg.norm(t) + 1e-6)
        surf = np.full((2 * search + 1, 2 * search + 1), -np.inf)
        for dy in range(-search, search + 1):
            for dx in range(-search, search + 1):
                c = img1[cy + dy - half : cy + dy - half + patch,
                         cx + dx - half : cx + dx - half + patch].reshape(-1)
                c = c - c.mean()
                c = c / (np.linalg.norm(c) + 1e-6)
                surf[dy + search, dx + search] = float(t @ c)
        best = surf.max()
        arg = np.unravel_index(surf.argmax(), surf.shape)
        arg = (arg[0] - search, arg[1] - search)
        assert abs(score[i] - best) < 1e-4
        # On pure noise the surface can hold near-ties that float-order
        # differences flip; only pin the offset when the peak is isolated.
        second = np.partition(surf.reshape(-1), -2)[-2]
        if best - second > 1e-3:
            # The sub-pixel parabola delta is clipped to +-1 px around
            # the brute-force argmax offset.
            assert abs(fy[i] - arg[0]) <= 1.0 + 1e-6
            assert abs(fx[i] - arg[1]) <= 1.0 + 1e-6


@pytest.mark.slow
def test_zncc_production_search_size(rng):
    """The widened ±50 px search at a production 960x1280 crop used to
    OOM at compile time (a 21.4 GB (B, O, p², 2) gather-index tensor) and
    later fault the tunnelled TPU worker; the grouped-conv core bounds
    live memory to the (B, win²) windows. Grid thinned for CPU runtime —
    the memory shape under test is the (patch², offsets) product, which
    is production-exact."""
    import fusion4landslide_tpu.image.matching as M

    h, w = 960, 1280
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img0 = (
        np.sin(xx * 0.37) * 40 + np.cos(yy * 0.23) * 40
        + rng.normal(scale=6.0, size=(h, w))
    ).astype(np.float32)
    flow = 25
    img1 = np.roll(img0, (0, flow), axis=(0, 1))
    m = M.zncc_grid_match(
        img0, img1, grid_step=64, search=50, min_score=0.7
    )
    assert m.shape[0] > 50
    med = np.median(m[:, 2] - m[:, 0])
    assert abs(med - flow) < 0.5
