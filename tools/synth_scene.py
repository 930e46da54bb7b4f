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
    s = np.full(len(uu), C[2], np.float64)
    for _ in range(6):
        px = C[0] + s * d_w[:, 0]
        py = C[1] + s * d_w[:, 1]
        gz = terrain_z(px, py)
        s = (C[2] - gz) / np.maximum(-d_w[:, 2], 1e-9)
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
