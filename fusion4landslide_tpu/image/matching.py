"""Dense 2D image matching for epoch pairs.

The reference consumes external learned matchers — EfficientLoFTR or RoMa,
vendored as (empty-in-this-checkout) submodules and invoked per crop pair
(src/coarse_to_fine_matching_base.py:1059-1233, src/rgb_guided.py:2063) —
producing (u0, v0, u1, v1) pixel correspondences. This module provides:

- a matcher *registry* with the same output contract, so learned matchers
  drop in as they are ported,
- ``zncc_grid_match``: a TPU-native zero-normalised cross-correlation
  grid matcher (classical digital image correlation, the standard tool of
  geodetic deformation monitoring). For co-registered epoch pairs with
  near-identical viewpoints — exactly the reference's setting, where the
  same camera re-scans the scene — ZNCC over a local search window recovers
  the dense pixel flow directly. All candidate displacements of all grid
  points are scored with one batched matmul: (G, offsets, p²) x (G, p², 1)
  rides the MXU; sub-pixel refinement by parabola fit on the correlation
  surface,
- ``match_epoch_images``: sliding-window crop pairing mirroring the
  reference's crop loop (base:1109-1121, crop/overlap sizes from
  fusion_brienz.yaml:34-35) — but batched over crops instead of a Python
  loop per pair.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["zncc_grid_match", "match_epoch_images", "get_matcher", "MATCHERS"]


def _to_gray(img: jax.Array) -> jax.Array:
    if img.ndim == 3:
        w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
        return jnp.einsum("hwc,c->hw", img[..., :3], w)
    return img


@functools.partial(
    jax.jit,
    static_argnames=("grid_step", "patch", "search", "g_block", "o_chunk"),
)
def _zncc_core(
    img0: jax.Array,
    img1: jax.Array,
    grid_step: int,
    patch: int,
    search: int,
    g_block: int = 512,
    o_chunk: int = 128,  # kept for call compatibility; unused
):
    h, w = img0.shape
    half = patch // 2
    margin = half + search
    ys = jnp.arange(margin, h - margin, grid_step)
    xs = jnp.arange(margin, w - margin, grid_step)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    centers = jnp.stack([gy.reshape(-1), gx.reshape(-1)], axis=1)  # (G, 2)
    G = centers.shape[0]

    n_off = 2 * search + 1
    win = patch + 2 * search  # local img1 window per centre

    py, px = jnp.meshgrid(
        jnp.arange(-half, patch - half), jnp.arange(-half, patch - half),
        indexing="ij",
    )
    prel = jnp.stack([py.reshape(-1), px.reshape(-1)], axis=1)  # (p², 2)
    wrel_y = jnp.arange(-half - search, -half - search + win)
    ones_k = jnp.ones((1, 1, patch, patch), img1.dtype)
    np2 = float(patch * patch)

    def one_block(cblock):
        B = cblock.shape[0]
        # Template vectors from img0: (B, p²), zero-mean unit-norm.
        pos0 = cblock[:, None, :] + prel[None, :, :]
        t = img0[pos0[..., 0], pos0[..., 1]]
        t = t - jnp.mean(t, axis=1, keepdims=True)
        t_norm = jnp.sqrt(jnp.sum(t * t, axis=1, keepdims=True)) + 1e-6
        t = t / t_norm

        # Local img1 window per centre: (B, win, win) — contiguous rows,
        # one bounded gather (the earlier formulation gathered every
        # candidate patch of every offset independently: a (B, O, p², 2)
        # index tensor that hit 21 GB at the production ±50 px search and
        # faulted the TPU worker at exactly the shapes where the fallback
        # matcher is needed).
        wy = cblock[:, 0:1] + wrel_y[None, :]  # (B, win)
        wx = cblock[:, 1:2] + wrel_y[None, :]
        w1 = img1[wy[:, :, None], wx[:, None, :]]  # (B, win, win)

        # All candidate offsets at once as convolutions (MXU path):
        # numerator: each centre's window correlated with ITS OWN template
        # — a feature-grouped conv with B groups: input (1, B, win, win),
        # kernels (B, 1, p, p) -> (1, B, n_off, n_off);
        # candidate means / energies: box sums with a shared ones kernel.
        tk = t.reshape(B, 1, patch, patch)
        num = jax.lax.conv_general_dilated(
            w1[None], tk, (1, 1), "VALID",
            feature_group_count=B,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
        )[0]  # (B, n_off, n_off): sum_p t̂(p) * c(d + p)
        c_sum = jax.lax.conv_general_dilated(
            w1[:, None], ones_k, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
        )[:, 0]  # (B, n_off, n_off)
        c_sq = jax.lax.conv_general_dilated(
            (w1 * w1)[:, None], ones_k, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
        )[:, 0]
        # ZNCC = t̂ · (c - mean c)/||c - mean c||; t̂ is zero-mean, so the
        # numerator's mean term vanishes and the candidate norm is
        # sqrt(Σc² - (Σc)²/p²) — identical math to the per-patch
        # normalisation, without materialising any candidate patch.
        c_norm = jnp.sqrt(jnp.maximum(c_sq - c_sum * c_sum / np2, 0.0))
        corr = (num / (c_norm + 1e-6)).reshape(B, -1)  # (B, O)
        best = jnp.argmax(corr, axis=1)
        score = jnp.take_along_axis(corr, best[:, None], axis=1)[:, 0]

        # Sub-pixel parabola refinement along y and x of the O = n x n grid.
        by = best // n_off
        bx = best % n_off

        def parab(cm, c0, cp):
            denom = cm - 2.0 * c0 + cp
            return jnp.where(
                jnp.abs(denom) > 1e-9,
                jnp.clip(0.5 * (cm - cp) / denom, -1.0, 1.0),
                0.0,
            )

        corr2 = corr.reshape(-1, n_off, n_off)
        bi = jnp.arange(corr2.shape[0])
        bys = jnp.clip(by, 1, n_off - 2)
        bxs = jnp.clip(bx, 1, n_off - 2)
        sub_y = parab(
            corr2[bi, bys - 1, bxs], corr2[bi, bys, bxs], corr2[bi, bys + 1, bxs]
        )
        sub_x = parab(
            corr2[bi, bys, bxs - 1], corr2[bi, bys, bxs], corr2[bi, bys, bxs + 1]
        )
        flow_y = (by - search).astype(jnp.float32) + sub_y
        flow_x = (bx - search).astype(jnp.float32) + sub_x
        return flow_y, flow_x, score, t_norm[:, 0]

    pad = (-G) % g_block
    cpad = jnp.pad(centers, ((0, pad), (0, 0)))
    nb = cpad.shape[0] // g_block
    fy, fx, sc, tn = jax.lax.map(
        one_block, cpad.reshape(nb, g_block, 2)
    )
    fy = fy.reshape(-1)[:G]
    fx = fx.reshape(-1)[:G]
    sc = sc.reshape(-1)[:G]
    tn = tn.reshape(-1)[:G]
    return centers, fy, fx, sc, tn


def zncc_grid_match(
    img0: np.ndarray,
    img1: np.ndarray,
    *,
    grid_step: int = 8,
    patch: int = 16,
    search: int = 32,
    min_score: float = 0.6,
    min_texture: float = 1.0,
) -> np.ndarray:
    """Dense grid matches between two co-registered epoch images.

    Returns an (M, 4) array of [u0, v0, u1, v1] (the reference matchers'
    txt contract, base:1210-1211), filtered by ZNCC score and a minimum
    template contrast (texture) so flat regions don't emit noise matches.
    """
    g0 = np.asarray(_to_gray(jnp.asarray(img0, jnp.float32)))
    g1 = np.asarray(_to_gray(jnp.asarray(img1, jnp.float32)))
    centers, fy, fx, score, texture = _zncc_core(
        jnp.asarray(g0), jnp.asarray(g1), grid_step, patch, search
    )
    centers = np.asarray(centers)
    fy, fx = np.asarray(fy), np.asarray(fx)
    score, texture = np.asarray(score), np.asarray(texture)
    keep = (score >= min_score) & (texture >= min_texture)
    u0 = centers[:, 1].astype(np.float32)
    v0 = centers[:, 0].astype(np.float32)
    u1 = u0 + fx
    v1 = v0 + fy
    return np.stack([u0, v0, u1, v1], axis=1)[keep]


def match_epoch_images(
    img0: np.ndarray,
    img1: np.ndarray,
    *,
    matcher: str = "zncc",
    crop_size: tuple[int, int] | None = None,
    overlap_size: tuple[int, int] | None = None,
    cross_crops: bool = False,
    max_flow_px: float | None = None,
    logger=None,
    **kw,
) -> np.ndarray:
    """Match two (possibly large) epoch images.

    When ``crop_size`` is given, images are matched over a sliding-window
    grid of crop pairs (step = crop - overlap, mirroring base:1109-1121)
    and results are merged in full-image coordinates. By default each img0
    crop is paired with the same-position img1 crop — sufficient when the
    pixel motion is smaller than the crop overlap. ``cross_crops=True``
    reproduces the reference's cross-pairing loop (base:1125-1233) for
    learned matchers: every img0 crop is additionally matched against the
    8-neighbour img1 crops, so flows up to a full crop are found.
    ``max_flow_px`` (e.g. the config's max_magnitude projected to pixels)
    auto-enables cross pairing and, for the ZNCC matcher, widens the search
    window to cover it.

    A diagnostic is logged when the measured median flow approaches the
    matcher's search bound (the silent-zero-matches failure mode).

    Learned matchers ('eloftr'/'loftr') need converted checkpoint weights
    (``weights=`` or an auto-probed ``weights/`` location); without them the
    call falls back to ZNCC with a warning rather than silently matching
    with random-initialised networks. Pass ``allow_random=True`` to force
    the random-weight learned path (tests/benchmarks only).
    """
    if (
        matcher.lower() in ("eloftr", "loftr", "roma", "romav2")
        and kw.get("params") is None
    ):
        paths = (
            ROMA_WEIGHT_SEARCH_PATHS
            if matcher.lower() in ("roma", "romav2")
            else WEIGHT_SEARCH_PATHS
        )
        resolved = resolve_learned_weights(kw.get("weights"), paths)
        if resolved is None and not kw.pop("allow_random", False):
            if logger is not None:
                logger.warning(
                    "no converted %s weights found (checked weights/ and "
                    "the 'weights' option) — falling back to the ZNCC "
                    "matcher. Fetch + convert the upstream checkpoint "
                    "(huggingface 'zju-community/efficientloftr' -> "
                    "image.eloftr.load_torch_eloftr, see ARCHITECTURE.md) "
                    "to enable the learned matcher.", matcher,
                )
            matcher = "zncc"
            kw.pop("weights", None)
        elif resolved is not None:
            kw["weights"] = resolved
    kw.pop("allow_random", None)
    fn = get_matcher(matcher)
    is_zncc = matcher.lower() == "zncc"
    if is_zncc:
        # Learned-matcher-only kwargs (checkpoint path) don't apply to the
        # correlation matcher; drop them so callers can pass a uniform set.
        kw.pop("weights", None)
    if is_zncc and max_flow_px is not None:
        # Widen the correlation search to cover the expected motion.
        search = int(kw.get("search", 32))
        if max_flow_px > search:
            kw["search"] = int(np.ceil(max_flow_px))
    if max_flow_px is not None and crop_size is not None:
        oh, ow = overlap_size or (crop_size[0] // 2, crop_size[1] // 2)
        if max_flow_px > min(oh, ow) / 2:
            cross_crops = True

    def _warn_near_bound(merged):
        if merged.shape[0] == 0 or not is_zncc:
            return
        flow = np.abs(merged[:, 2:4] - merged[:, 0:2])
        med = float(np.median(np.max(flow, axis=1)))
        bound = float(kw.get("search", 32))
        if med > 0.8 * bound and logger is not None:
            logger.warning(
                "median pixel flow %.1f px is within 20%% of the ZNCC "
                "search bound %d px — matches beyond the bound are silently "
                "lost; raise 'search' or set max_flow_px",
                med, int(bound),
            )

    def _fallback_if_empty(merged):
        """RoMa's per-crop self-check can empty every crop (the compact
        model is measured unreliable at production shapes) — fall back to
        the classical ZNCC matcher instead of returning an empty channel."""
        if merged.shape[0] or matcher.lower() not in ("roma", "romav2"):
            return merged
        if logger is not None:
            logger.warning(
                "img_matching_type=%s produced no self-check-consistent "
                "matches — falling back to the ZNCC matcher", matcher,
            )
        zkw = {
            k: v
            for k, v in kw.items()
            if k in ("grid_step", "patch", "search", "min_score",
                     "min_texture")
        }
        return match_epoch_images(
            img0, img1, matcher="zncc", crop_size=crop_size,
            overlap_size=overlap_size, cross_crops=cross_crops,
            max_flow_px=max_flow_px, logger=logger, **zkw,
        )

    if crop_size is None:
        out = fn(img0, img1, **kw)
        _warn_near_bound(out)
        return _fallback_if_empty(out)
    ch, cw = crop_size
    oh, ow = overlap_size or (ch // 2, cw // 2)
    sh, sw = max(ch - oh, 1), max(cw - ow, 1)
    h, w = img0.shape[:2]
    ys = list(range(0, max(h - ch, 0) + 1, sh))
    xs = list(range(0, max(w - cw, 0) + 1, sw))
    out = []
    for y0 in ys:
        for x0 in xs:
            c0 = img0[y0 : y0 + ch, x0 : x0 + cw]
            if cross_crops:
                # Reference cross-pairing (base:1125-1233), restricted to
                # the 8-neighbour crops (full cross is quadratic and adds
                # nothing within the max-flow bound). Works for ZNCC too:
                # the per-pair crop offsets are added to the match
                # coordinates below, so cross-position flows come out in
                # full-image coordinates.
                pairs = [
                    (y1, x1)
                    for y1 in ys
                    for x1 in xs
                    if abs(y1 - y0) <= sh and abs(x1 - x0) <= sw
                ]
            else:
                pairs = [(y0, x0)]
            for y1, x1 in pairs:
                c1 = img1[y1 : y1 + ch, x1 : x1 + cw]
                m = fn(c0, c1, **kw)
                if m.size:
                    m = m + np.asarray([x0, y0, x1, y1], np.float32)
                    out.append(m)
    if not out:
        return _fallback_if_empty(np.zeros((0, 4), np.float32))
    merged = np.concatenate(out, axis=0)
    # Dedup overlapping-crop duplicates by (u0, v0) pixel cell.
    key = (merged[:, 1].round().astype(np.int64) * (w + 1)
           + merged[:, 0].round().astype(np.int64))
    _, first = np.unique(key, return_index=True)
    merged = merged[np.sort(first)]
    _warn_near_bound(merged)
    return _fallback_if_empty(merged)


LOFTR_WEIGHT_SEARCH_PATHS = (
    "weights/outdoor_ds.ckpt",
    "weights/indoor_ds.ckpt",
    "weights/loftr.ckpt",
)


def _loftr_matcher(img0, img1, *, params=None, weights=None,
                   match_threshold=0.2, **_):
    """Learned LoFTR-family matcher.

    With a provisioned upstream checkpoint (zju3dv/LoFTR
    ``indoor/outdoor_ds.ckpt``; common locations probed automatically),
    runs the faithful :class:`~.loftr_classic.ClassicLoFTR` conversion.
    Without weights, the compact in-environment architecture runs
    random-initialised — functional but weak; prefer 'zncc' or a trained
    matcher until weights are supplied.
    """
    import jax

    from fusion4landslide_tpu.image.loftr import (
        LoFTRMatcher,
        load_torch_loftr,
        loftr_match,
    )

    if params is None:
        weights = resolve_learned_weights(weights, LOFTR_WEIGHT_SEARCH_PATHS)
    if weights is not None or params is not None:
        if params is None:
            key = ("loftr", weights)
            if key not in _ELOFTR_CACHE:
                _ELOFTR_CACHE[key] = load_torch_loftr(weights)
            params, cfg = _ELOFTR_CACHE[key]
        else:
            params, cfg = params
        from fusion4landslide_tpu.image.loftr_classic import (
            ClassicLoFTR,
            ClassicLoFTRConfig,
            classic_loftr_match,
        )

        if isinstance(cfg, ClassicLoFTRConfig):
            uv, _conf = classic_loftr_match(
                params, img0, img1, model=ClassicLoFTR(cfg),
                match_threshold=match_threshold,
            )
            return uv
        from fusion4landslide_tpu.image.eloftr import (
            EfficientLoFTRFlax,
            eloftr_match,
        )

        uv, _conf = eloftr_match(
            params, img0, img1, model=EfficientLoFTRFlax(cfg)
        )
        return uv

    import warnings

    warnings.warn(
        "loftr matcher running with random-initialised weights; convert "
        "an upstream checkpoint (image.loftr.load_torch_loftr) for "
        "production matching", stacklevel=2,
    )
    model = LoFTRMatcher()
    dummy = np.zeros((64, 64), np.float32)
    params = model.init(jax.random.PRNGKey(0), dummy, dummy)
    uv, _conf = loftr_match(
        params, img0, img1, model=model, match_threshold=match_threshold
    )
    return uv


_ELOFTR_CACHE: dict = {}

#: Auto-probed locations for converted learned-matcher checkpoints
#: (the transformers EfficientLoFTR export of the upstream
#: eloftr_outdoor.ckpt, reference README.md:85; RoMa weights trained
#: in-environment by image.roma_train).
WEIGHT_SEARCH_PATHS = (
    "weights/efficientloftr",
    "weights/eloftr.safetensors",
    "weights/eloftr_outdoor.ckpt",
    "weights/eloftr_tiny.npz",
)

ROMA_WEIGHT_SEARCH_PATHS = (
    "weights/roma_tiny.npz",
    "weights/roma.npz",
)


def resolve_learned_weights(weights=None, paths=WEIGHT_SEARCH_PATHS):
    """Resolve a learned-matcher checkpoint path: the explicit ``weights``
    argument (must exist) or the first hit among ``paths``, probed both
    relative to the cwd and to the repository root (so weights shipped
    alongside the package are found regardless of cwd).
    Returns None when nothing is provisioned."""
    import os.path as osp

    if weights is not None:
        if not osp.exists(str(weights)):
            raise FileNotFoundError(
                f"learned matcher weights not found: {weights}"
            )
        return str(weights)
    pkg_root = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
    for cand in paths:
        for base in ("", pkg_root):
            p = osp.join(base, cand) if base else cand
            if osp.exists(p):
                return p
    return None


def _eloftr_matcher(img0, img1, *, params=None, weights=None, **_):
    """EfficientLoFTR (image.eloftr): the reference's production matcher
    (base:1065). ``weights`` may point to a converted torch checkpoint
    (``transformers`` EfficientLoFTR layout — the published conversion of
    the upstream ``eloftr_outdoor.ckpt``); common locations are probed
    automatically. Without weights the architecture runs random-initialised
    (functional but weak) with a warning."""
    import os.path as osp

    import jax

    from fusion4landslide_tpu.image.eloftr import (
        EfficientLoFTRFlax,
        ELoFTRConfig,
        eloftr_match,
        load_eloftr_weights,
        load_torch_eloftr,
    )

    if params is None:
        weights = resolve_learned_weights(weights)
        key = weights or "__random__"
        if key not in _ELOFTR_CACHE:
            if weights is not None and str(weights).endswith(".npz"):
                # In-environment trained checkpoint (image.eloftr_train).
                _ELOFTR_CACHE[key] = load_eloftr_weights(weights)
            elif weights is not None:
                _ELOFTR_CACHE[key] = load_torch_eloftr(weights)
            else:
                import warnings

                warnings.warn(
                    "eloftr matcher running with random-initialised weights; "
                    "convert an upstream checkpoint "
                    "(image.eloftr.load_torch_eloftr) for production "
                    "matching",
                    stacklevel=2,
                )
                cfg = ELoFTRConfig(
                    stage_num_blocks=(1, 1, 2, 2),
                    out_features=(32, 32, 64, 128),
                    hidden_size=128,
                    num_attention_layers=2,
                )
                model = EfficientLoFTRFlax(cfg)
                dummy = np.zeros((64, 64), np.float32)
                _ELOFTR_CACHE[key] = (
                    model.init(jax.random.PRNGKey(0), dummy, dummy),
                    cfg,
                )
        params, cfg = _ELOFTR_CACHE[key]
    else:
        params, cfg = params
    uv, _conf = eloftr_match(
        params, img0, img1, model=EfficientLoFTRFlax(cfg)
    )
    return uv


_ROMA_CACHE: dict = {}


def _roma_matcher(
    img0,
    img1,
    *,
    params=None,
    weights=None,
    num_matches: int = 5000,
    min_certainty: float = 0.3,
    work_size: int = 224,
    fb_px: float = 6.0,
    fb_min_frac: float = 0.15,
    logger=None,
    **_,
):
    """RoMa-family dense matcher (image.roma): the reference's
    ``img_matching_type: RoMA`` role (base:1093-1098, rgb_guided.py:
    2097-2229 — match → certainty-weighted sample → pixel coordinates).
    Images are resized to ``work_size`` for the GP coarse stage (the
    published model fixes 560 px the same way); matches are mapped back
    to full-image coordinates.

    Every call self-checks by forward-backward warp consistency
    (``roma_fb_error_px``): matches whose round-trip error exceeds
    ``fb_px`` (at work resolution) are dropped, and when fewer than
    ``fb_min_frac`` of certainty-weighted pixels survive the whole crop is
    declared unmatched (empty result + warning) — the compact
    in-environment model is measured unreliable outside its training
    distribution, and silently emitting noise matches would poison the RGB
    channel. ``match_epoch_images`` falls back to ZNCC when every crop
    comes back empty. Threshold calibration (measured): the trained
    compact model in-distribution scores ~0.36 certainty-weighted
    consistency at 6 px, while the same weights at production 960x1280
    crops (the r4 EPE-737px failure) score 0.002 and a random init 0.013
    — fb_min_frac=0.15 separates them by >10x on both sides."""
    import jax

    from fusion4landslide_tpu.image.roma import (
        RoMaMatcher,
        load_roma_weights,
        roma_fb_error_px,
        roma_sample,
        roma_to_pixel_coordinates,
    )

    if params is None:
        weights = resolve_learned_weights(weights, ROMA_WEIGHT_SEARCH_PATHS)
        if weights is None:
            raise FileNotFoundError(
                "no RoMa weights provisioned; train the compact model "
                "(python -m fusion4landslide_tpu.image.roma_train) or pass "
                "weights="
            )
        if weights not in _ROMA_CACHE:
            _ROMA_CACHE[weights] = load_roma_weights(weights)
        params, cfg = _ROMA_CACHE[weights]
    else:
        params, cfg = params
    model = RoMaMatcher(cfg)
    h0, w0 = img0.shape[:2]
    h1, w1 = img1.shape[:2]
    import jax.numpy as jnp

    g0 = jnp.asarray(img0, jnp.float32)
    g1 = jnp.asarray(img1, jnp.float32)
    if g0.ndim == 3:
        g0 = g0.mean(axis=-1)
    if g1.ndim == 3:
        g1 = g1.mean(axis=-1)
    r0 = jax.image.resize(g0, (work_size, work_size), "bilinear")
    r1 = jax.image.resize(g1, (work_size, work_size), "bilinear")
    warp, cert, err_px = roma_fb_error_px(params, r0, r1, model=model)
    consistent = err_px <= fb_px
    cert_sum = float(jnp.sum(cert))
    frac = float(
        jnp.sum(cert * consistent) / max(cert_sum, 1e-9)
    )
    if frac < fb_min_frac:
        import warnings

        msg = (
            f"roma self-check failed: only {100 * frac:.1f}% of "
            f"certainty-weighted pixels are forward-backward consistent "
            f"within {fb_px} px at work resolution — returning no matches "
            "for this crop (the matcher is unreliable at these shapes)"
        )
        if logger is not None:
            logger.warning(msg)
        else:
            warnings.warn(msg, stacklevel=2)
        return np.zeros((0, 4), np.float32)
    matches, c = roma_sample(warp, cert * consistent, num=num_matches)
    ka, kb = roma_to_pixel_coordinates(matches, h0, w0, h1, w1)
    ka = np.asarray(ka)
    kb = np.asarray(kb)
    c = np.asarray(c)
    keep = c >= min_certainty
    return np.concatenate([ka[keep], kb[keep]], axis=1).astype(np.float32)


MATCHERS = {
    "zncc": zncc_grid_match,
    "loftr": _loftr_matcher,
    # Reference config spellings (fusion_brienz.yaml img_matching_type,
    # base:1093 'RoMA').
    "eloftr": _eloftr_matcher,
    "roma": _roma_matcher,
    "romav2": _roma_matcher,
}


def get_matcher(name: str):
    """Look up a matcher by name: 'zncc' (classical DIC),
    'loftr'/'eloftr' (learned coarse-to-fine; reference's ELoFTR role),
    or 'roma'/'romav2' (dense GP matcher; reference's RoMa role)."""
    key = name.lower()
    try:
        return MATCHERS[key]
    except KeyError as e:
        raise NotImplementedError(
            f"image matcher '{name}' is not available; options: "
            f"{sorted(MATCHERS)}"
        ) from e
