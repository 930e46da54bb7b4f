"""Synthetic landslide scene: epoch pair + textured imagery with a known
planted displacement.

Shared by the dress rehearsal (tools/dress_rehearsal.py) and the
production-crop matcher evaluation (tools/matcher_eval.py). The scene is a
procedural terrain (same analytic surface as bench.py's synth epochs) with a
moving half shifted by a known vector, photographed by a nadir pinhole
camera whose projection convention exactly matches
``fusion4landslide_tpu.image.geometry.project_points`` (v_flip=True, the
reference's bottom-up image convention, base:1365). The rendered target
image shows the *moved* terrain, so dense image matching on the pair should
recover the planted pixel flow.
"""

from __future__ import annotations

import numpy as np

DEFAULT_DENSITY = 100.0  # pts / m^2 (median resolution ~0.1 m, Brienz-like)


def terrain_z(x: np.ndarray, y: np.ndarray, noise: float = 0.0, rng=None):
    z = np.sin(x * 0.31) * 2.0 + np.cos(y * 0.17) * 3.0
    if noise and rng is not None:
        z = z + rng.normal(scale=noise, size=np.shape(x))
    return z


def make_epoch_pair(
    n: int,
    shift=(0.05, -0.02, 0.01),
    density: float = DEFAULT_DENSITY,
    seed: int = 0,
):
    """Epoch pair over a square extent; the x > extent/2 half moves by
    ``shift``. Returns (src, tgt, extent, moving_mask)."""
    rng = np.random.default_rng(seed)
    extent = float(np.sqrt(n / density))
    xy = rng.uniform(0, extent, size=(n, 2))
    z = terrain_z(xy[:, 0], xy[:, 1], noise=0.02, rng=rng)
    src = np.column_stack([xy, z]).astype(np.float32)
    moving = src[:, 0] > extent / 2
    tgt = src.copy()
    tgt[moving] += np.asarray(shift, np.float32)
    return src, tgt, extent, moving


def texture(x: np.ndarray, y: np.ndarray, seed: int = 3) -> np.ndarray:
    """Procedural multi-scale texture over WORLD coordinates in [0, 1].

    A sum of random-direction sinusoids per octave (0.05..10 cycles/m), so
    both epochs sample one consistent world texture and the planted surface
    motion translates into exactly the planted pixel flow.
    """
    rng = np.random.default_rng(seed)
    val = np.zeros(np.broadcast(x, y).shape, np.float32)
    for freq in (0.05, 0.1, 0.2, 0.5, 1.0, 2.0, 5.0, 10.0):
        amp = 1.0 / np.sqrt(freq / 0.05)
        for _ in range(4):
            ang = rng.uniform(0, 2 * np.pi)
            ph = rng.uniform(0, 2 * np.pi)
            k = 2 * np.pi * freq
            val += amp * np.sin(
                k * (x * np.cos(ang) + y * np.sin(ang)) + ph
            ).astype(np.float32)
    val -= val.min()
    val /= max(val.max(), 1e-6)
    return val


def nadir_camera(extent: float, image_size, margin: float = 1.05):
    """(K, extrinsic 4x4, altitude) for a straight-down camera over the
    [0, extent]^2 terrain, framed so the whole extent is just inside the
    image. ``image_size`` is (height, width), reference ordering."""
    h, w = image_size
    alt = 3.0 * extent  # comfortably above terrain relief
    cx, cy = extent / 2.0, extent / 2.0
    # Focal so the extent spans min(h, w)/margin pixels.
    f = min(h, w) * alt / (extent * margin)
    K = np.array([[f, 0, w / 2.0], [0, f, h / 2.0], [0, 0, 1.0]], np.float64)
    # Camera→world axes: x_cam=+x, y_cam=-y, z_cam=-z (looking down).
    Rcw = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float64)
    C = np.array([cx, cy, alt], np.float64)
    pose = np.eye(4)
    pose[:3, :3] = Rcw
    pose[:3, 3] = C
    extrinsic = np.linalg.inv(pose)  # world→camera
    return K, extrinsic, alt


def render_image(
    image_size,
    K: np.ndarray,
    extrinsic: np.ndarray,
    extent: float,
    *,
    shift=None,
    seed: int = 3,
    v_flip: bool = True,
    iters: int = 6,
) -> np.ndarray:
    """Render the terrain texture seen by the camera, uint8 (h, w).

    With ``shift`` the x > extent/2 half of the terrain has moved by that
    world vector (the target epoch's image): surface point p' = p + shift,
    so the texture at p' is the source texture at p' - shift.

    Ray-marches each pixel onto z = terrain_z(x, y) by fixed-point
    iteration (the surface relief is tiny relative to the camera altitude,
    so a handful of iterations converge to sub-mm).
    """
    h, w = image_size
    pose = np.linalg.inv(extrinsic)
    Rcw = pose[:3, :3]
    C = pose[:3, 3]
    Kinv = np.linalg.inv(K)
    u = np.arange(w, dtype=np.float64) + 0.5
    v_img = np.arange(h, dtype=np.float64) + 0.5
    uu, vv = np.meshgrid(u, v_img)
    v = (h - vv) if v_flip else vv  # invert project_points' v_flip
    d_cam = np.stack([uu, v, np.ones_like(uu)], axis=-1) @ Kinv.T
    d_w = d_cam @ Rcw.T  # world ray direction per unit camera depth
    # p = C + s * d_w with s = camera depth; solve pz = terrain_z(px, py).
    s = np.full((h, w), C[2], np.float64)
    for _ in range(iters):
        px = C[0] + s * d_w[..., 0]
        py = C[1] + s * d_w[..., 1]
        gz = terrain_z(px, py)
        s = (C[2] - gz) / np.maximum(-d_w[..., 2], 1e-9)
    px = C[0] + s * d_w[..., 0]
    py = C[1] + s * d_w[..., 1]
    pz = C[2] + s * d_w[..., 2]
    if shift is not None:
        sx, sy, sz = shift
        moving = px > extent / 2.0
        # The moved surface at (px, py) carries the texture from
        # (px - sx, py - sy); its height is terrain(px-sx, py-sy) + sz —
        # the height delta is negligible for the nadir texture lookup.
        px = np.where(moving, px - sx, px)
        py = np.where(moving, py - sy, py)
    tex = texture(px.astype(np.float32), py.astype(np.float32), seed=seed)
    return np.clip(tex * 255.0, 0, 255).astype(np.uint8)


def planted_flow(
    uv_src: np.ndarray,
    image_size,
    K: np.ndarray,
    extrinsic: np.ndarray,
    extent: float,
    shift,
    *,
    v_flip: bool = True,
) -> np.ndarray:
    """Ground-truth target-image pixel positions for source pixels.

    For each source pixel: backproject onto the source terrain, apply the
    planted world shift where moving, reproject. Returns (n, 2) target
    (u, v) pixels aligned with ``uv_src``.
    """
    h, w = image_size
    pose = np.linalg.inv(extrinsic)
    Rcw = pose[:3, :3]
    C = pose[:3, 3]
    Kinv = np.linalg.inv(K)
    uu = uv_src[:, 0].astype(np.float64)
    vv = uv_src[:, 1].astype(np.float64)
    v = (h - vv) if v_flip else vv
    d_cam = np.stack([uu, v, np.ones_like(uu)], axis=-1) @ Kinv.T
    d_w = d_cam @ Rcw.T
    # FIRST terrain hit (correct for oblique cameras with occluding
    # relief; reduces to the old fixed-point answer for nadir views).
    s_max = 2.0 * np.linalg.norm(
        np.array([extent, extent, 0.0]) - C
    ) + 4.0 * extent
    s, _hit = _first_hit(C, d_w, float(s_max))
    p = np.stack(
        [C[0] + s * d_w[:, 0], C[1] + s * d_w[:, 1], C[2] + s * d_w[:, 2]],
        axis=-1,
    )
    moving = p[:, 0] > extent / 2.0
    p_t = p + moving[:, None] * np.asarray(shift, np.float64)
    cam = p_t @ extrinsic[:3, :3].T + extrinsic[:3, 3]
    pix = cam @ K.T
    u_t = pix[:, 0] / pix[:, 2]
    v_t = pix[:, 1] / pix[:, 2]
    if v_flip:
        v_t = h - v_t
    return np.stack([u_t, v_t], axis=-1)


# ---------------------------------------------------------------------------
# Hard-mode scene (round-5): the friendly scene above cannot fail — uniform
# density, pure-translation motion, nadir camera, no occlusion. These
# variants exercise the failure modes real TLS landslide data has
# (reference ground-truth practice: Rockfall Simulator + two real sites,
# /root/reference/README.md:83).
# ---------------------------------------------------------------------------


def make_epoch_pair_hard(
    n: int,
    shift=(0.05, -0.02, 0.01),
    rot_deg: float = 0.5,
    density: float = DEFAULT_DENSITY,
    seed: int = 0,
    scanner=None,
):
    """Epoch pair with TLS-like variable density and a ROTATING moving
    block.

    - Density falls off with range from a corner ``scanner`` position as
      1/(1 + r/extent) (terrestrial scans thin with distance), so voxel
      sizes, patch populations, and kNN radii vary across the tile.
    - The moving region is a DISC (curved boundary through supervoxels),
      rotated by ``rot_deg`` about the vertical axis through its centre
      and then translated by ``shift`` — per-point displacement varies
      over the block, so a matcher that only recovers translations fails.

    Returns (src, tgt, extent, moving_mask, true_disp (n, 3)).
    """
    rng = np.random.default_rng(seed)
    extent = float(np.sqrt(n / density))
    scanner = np.asarray(
        scanner if scanner is not None else (0.0, 0.0), np.float64
    )
    # Rejection-sample the range-falloff density (acceptance >= 1/3).
    pts = []
    need = n
    while need > 0:
        cand = rng.uniform(0, extent, size=(int(need * 3.5) + 64, 2))
        r = np.linalg.norm(cand - scanner, axis=1)
        accept = rng.random(len(cand)) < 1.0 / (1.0 + 2.0 * r / extent)
        cand = cand[accept]
        pts.append(cand[:need])
        need -= len(cand[:need])
    xy = np.concatenate(pts, axis=0)[:n]
    z = terrain_z(xy[:, 0], xy[:, 1], noise=0.02, rng=rng)
    src = np.column_stack([xy, z]).astype(np.float32)

    centre = np.array([0.68 * extent, 0.55 * extent], np.float64)
    radius = 0.22 * extent
    moving = np.linalg.norm(xy - centre, axis=1) < radius
    th = np.deg2rad(rot_deg)
    R = np.array(
        [[np.cos(th), -np.sin(th), 0.0],
         [np.sin(th), np.cos(th), 0.0],
         [0.0, 0.0, 1.0]],
        np.float64,
    )
    c3 = np.array([centre[0], centre[1], 0.0], np.float64)
    tgt = src.astype(np.float64).copy()
    tgt[moving] = (tgt[moving] - c3) @ R.T + c3 + np.asarray(shift, np.float64)
    true_disp = (tgt - src).astype(np.float32)
    return src, tgt.astype(np.float32), extent, moving, true_disp


def oblique_camera(
    extent: float,
    image_size,
    elev_deg: float = 40.0,
    azim_deg: float = 25.0,
    margin: float = 1.25,
):
    """(K, extrinsic 4x4, camera centre) for an OBLIQUE camera looking at
    the terrain centre from elevation ``elev_deg`` above the horizon at
    azimuth ``azim_deg`` — the reference's real camera stations are
    terrestrial obliques, not nadir drones. Conventions match
    ``image.geometry.project_points`` (+z camera depth; v_flip handled by
    the caller exactly as for ``nadir_camera``)."""
    h, w = image_size
    el = np.deg2rad(elev_deg)
    az = np.deg2rad(azim_deg)
    target = np.array([extent / 2.0, extent / 2.0, 0.0], np.float64)
    dist = 2.2 * extent
    C = target + dist * np.array(
        [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)],
        np.float64,
    )
    fwd = target - C
    fwd /= np.linalg.norm(fwd)
    up_w = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up_w)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)  # camera +y (image v grows downward pre-flip)
    Rcw = np.stack([right, down, fwd], axis=1)  # camera→world columns
    f = min(h, w) * dist / (extent * margin)
    K = np.array([[f, 0, w / 2.0], [0, f, h / 2.0], [0, 0, 1.0]], np.float64)
    pose = np.eye(4)
    pose[:3, :3] = Rcw
    pose[:3, 3] = C
    return K, np.linalg.inv(pose), C


def _first_hit(C, d_w, s_max, coarse: int = 192, refine: int = 25):
    """FIRST terrain intersection along rays p = C + s*d (hidden-surface
    removal): coarse sign-change scan over ``coarse`` samples of s, then
    bisection. Returns (s_hit, hit_mask)."""
    shape = d_w.shape[:-1]
    s_lo = np.zeros(shape)
    s_hi = np.full(shape, s_max)
    found = np.zeros(shape, bool)
    prev_s = np.full(shape, 1e-3)
    prev_f = (
        C[2] + prev_s * d_w[..., 2]
        - terrain_z(C[0] + prev_s * d_w[..., 0], C[1] + prev_s * d_w[..., 1])
    )
    for i in range(1, coarse + 1):
        s = 1e-3 + (s_max - 1e-3) * i / coarse
        px = C[0] + s * d_w[..., 0]
        py = C[1] + s * d_w[..., 1]
        f = C[2] + s * d_w[..., 2] - terrain_z(px, py)
        cross = ~found & (prev_f > 0) & (f <= 0)
        s_lo = np.where(cross, prev_s, s_lo)
        s_hi = np.where(cross, s, s_hi)
        found |= cross
        prev_s, prev_f = np.full(shape, s), f
    for _ in range(refine):
        mid = 0.5 * (s_lo + s_hi)
        f = (
            C[2] + mid * d_w[..., 2]
            - terrain_z(
                C[0] + mid * d_w[..., 0], C[1] + mid * d_w[..., 1]
            )
        )
        s_hi = np.where(f <= 0, mid, s_hi)
        s_lo = np.where(f <= 0, s_lo, mid)
    return 0.5 * (s_lo + s_hi), found


def render_image_occluded(
    image_size,
    K: np.ndarray,
    extrinsic: np.ndarray,
    extent: float,
    *,
    shift=None,
    seed: int = 3,
    v_flip: bool = True,
):
    """Like :func:`render_image` but with hidden-surface removal — correct
    for oblique cameras where near relief occludes far terrain. Pixels
    whose ray never crosses the terrain (sky) render as 0. The planted
    ``shift`` applies to the x > extent/2 half as in :func:`render_image`
    (texture advection; the metre-scale shifts do not change visibility
    at these relief/altitude ratios)."""
    h, w = image_size
    pose = np.linalg.inv(extrinsic)
    Rcw = pose[:3, :3]
    C = pose[:3, 3]
    Kinv = np.linalg.inv(K)
    u = np.arange(w, dtype=np.float64) + 0.5
    v_img = np.arange(h, dtype=np.float64) + 0.5
    uu, vv = np.meshgrid(u, v_img)
    v = (h - vv) if v_flip else vv
    d_cam = np.stack([uu, v, np.ones_like(uu)], axis=-1) @ Kinv.T
    d_w = d_cam @ Rcw.T
    s_max = 2.0 * np.linalg.norm(
        np.array([extent, extent, 0.0]) - C
    ) + 4.0 * extent
    s, hit = _first_hit(C, d_w, s_max)
    px = C[0] + s * d_w[..., 0]
    py = C[1] + s * d_w[..., 1]
    if shift is not None:
        sx, sy, _ = shift
        moving = px > extent / 2.0
        px = np.where(moving, px - sx, px)
        py = np.where(moving, py - sy, py)
    tex = texture(px.astype(np.float32), py.astype(np.float32), seed=seed)
    return np.clip(tex * 255.0 * hit, 0, 255).astype(np.uint8)


def visible_in_view(
    points: np.ndarray,
    K: np.ndarray,
    extrinsic: np.ndarray,
    extent: float,
    tol: float = 0.05,
) -> np.ndarray:
    """True where each world point is the FIRST terrain hit along its
    viewing ray (not occluded by nearer relief) — the shadowing mask an
    oblique view induces."""
    pose = np.linalg.inv(extrinsic)
    C = pose[:3, 3]
    d = points - C
    dist = np.linalg.norm(d, axis=1)
    d_w = d / dist[:, None]
    s, hit = _first_hit(C, d_w, float(dist.max()) * 1.05)
    return hit & (np.abs(s - dist) <= tol * dist.clip(min=1.0))
