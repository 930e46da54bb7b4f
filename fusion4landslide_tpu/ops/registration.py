"""Additional registration solvers: point-to-plane ICP, colored ICP,
correspondence-based RANSAC.

Capability parity with the reference's Open3D toolbox
(utils/o3d_tools.py):

- ``icp_point2plane`` ↔ ``icp_registration(..., icp_type='point2plane')``
  (o3d_tools.py:12-71): each iteration solves the linearised 6-DoF normal
  equation for residual (R p + t - q)·n_q,
- ``colored_icp`` ↔ the multiscale colored-ICP wrapper (o3d_tools.py:74-128):
  coarse-to-fine voxel scales, each refined with the joint geometric +
  photometric Gauss-Newton of Park et al. 2017 — per-point tangent-plane
  colour gradients (``color_gradients``) linearise the target colour field,
  exactly the objective behind o3d ``registration_colored_icp``,
- ``ransac_registration`` ↔ ``ransac_registration`` (o3d_tools.py:148-177):
  correspondence-based RANSAC — re-designed for TPU as a *batched hypothesis
  tournament*: K minimal 3-point samples are fitted and scored fully in
  parallel (one vmapped Kabsch + one distance matrix), best hypothesis
  refit on its inliers. No sequential trial loop.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fusion4landslide_tpu.ops.icp import ICPResult, icp_point2point
from fusion4landslide_tpu.ops.kabsch import transform_points, weighted_kabsch
from fusion4landslide_tpu.ops.knn import knn
from fusion4landslide_tpu.ops.normals import pca_normals

__all__ = [
    "icp_point2plane",
    "icp_generalized",
    "colored_icp",
    "color_gradients",
    "ransac_registration",
    "icp_by_type",
]

#: Reference ``icp_type`` names (utils/o3d_tools.py:33-56) -> solver.
_ICP_TYPES = ("point2point", "point2plane", "generalized_icp", "generalized")


def icp_by_type(
    icp_type: str,
    src: jax.Array,
    tgt: jax.Array,
    max_dist,
    *,
    src_mask=None,
    tgt_mask=None,
    max_iter: int = 30,
    R_init=None,
    t_init=None,
) -> ICPResult:
    """Dispatch on the reference's ``icp_type`` config value
    (utils/o3d_tools.py:33-56: point2point / point2plane / generalized_icp).

    ``icp_type`` must be a static Python string (it selects which solver is
    traced). Raises ``ValueError`` for unknown names, like the reference's
    o3d wrapper falling through would."""
    if icp_type not in _ICP_TYPES:
        raise ValueError(
            f"unknown icp_type {icp_type!r}; expected one of {_ICP_TYPES}"
        )
    kw = dict(
        src_mask=src_mask,
        tgt_mask=tgt_mask,
        max_iter=max_iter,
        R_init=R_init,
        t_init=t_init,
    )
    if icp_type == "point2plane":
        return icp_point2plane(src, tgt, max_dist, **kw)
    if icp_type in ("generalized_icp", "generalized"):
        return icp_generalized(src, tgt, max_dist, **kw)
    return icp_point2point(src, tgt, max_dist, **kw)


def _solve_point2plane(src, tgt, normals, w):
    """One linearised point-to-plane step: minimise sum w ((Rp+t-q)·n)^2
    over small rotations r (R ≈ I + [r]x). Returns (R, t) of the update."""
    hp = jax.lax.Precision.HIGHEST
    c = jnp.cross(src, normals)  # (n, 3)
    J = jnp.concatenate([c, normals], axis=1)  # (n, 6)
    r = jnp.sum((src - tgt) * normals, axis=1)  # (n,)
    Jw = J * w[:, None]
    A = jnp.einsum("ni,nj->ij", Jw, J, precision=hp) + 1e-6 * jnp.eye(6)
    b = -jnp.einsum("ni,n->i", Jw, r, precision=hp)
    x = jnp.linalg.solve(A, b)
    rx, tx = x[:3], x[3:]
    # Rodrigues for the small rotation.
    theta = jnp.linalg.norm(rx) + 1e-12
    k = rx / theta
    K = jnp.array(
        [[0.0, -k[2], k[1]], [k[2], 0.0, -k[0]], [-k[1], k[0], 0.0]]
    )
    R = (
        jnp.eye(3)
        + jnp.sin(theta) * K
        + (1.0 - jnp.cos(theta)) * (K @ K)
    )
    return R.astype(src.dtype), tx.astype(src.dtype)


@functools.partial(jax.jit, static_argnames=("max_iter", "normals_k"))
def icp_point2plane(
    src: jax.Array,
    tgt: jax.Array,
    max_dist: jax.Array | float,
    src_mask: jax.Array | None = None,
    tgt_mask: jax.Array | None = None,
    *,
    tgt_normals: jax.Array | None = None,
    max_iter: int = 30,
    rel_tol: float = 1e-6,
    normals_k: int = 16,
    color_weight: jax.Array | None = None,
    R_init: jax.Array | None = None,
    t_init: jax.Array | None = None,
) -> ICPResult:
    """Point-to-plane ICP of ``src`` onto ``tgt``.

    ``color_weight``: optional (n_src, n_tgt)-free per-pair weighting hook —
    pass per-point colours as (n, 3) arrays via :func:`colored_icp` instead.
    ``R_init``/``t_init`` seed the iteration (the reference seeds ICP with
    the SVD fit, base:3341-3360).
    """
    n = src.shape[0]
    smask = jnp.ones((n,), bool) if src_mask is None else src_mask.astype(bool)
    n_valid = jnp.maximum(jnp.sum(smask), 1)
    if tgt_normals is None:
        tgt_normals = pca_normals(tgt, normals_k, tgt_mask)
    max_d2 = jnp.asarray(max_dist, src.dtype) ** 2

    def correspondences(R, t):
        moved = transform_points(src, R, t)
        sqd, idx = knn(moved, tgt, 1, tgt_mask)
        sqd, idx = sqd[:, 0], idx[:, 0]
        inlier = smask & jnp.isfinite(sqd) & (sqd <= max_d2)
        return idx, inlier, sqd

    def metrics(inlier, sqd):
        cnt = jnp.sum(inlier)
        fit = cnt / n_valid
        rmse = jnp.sqrt(jnp.sum(jnp.where(inlier, sqd, 0.0)) / jnp.maximum(cnt, 1))
        return fit, rmse, cnt

    def cond(state):
        *_, it, done = state
        return (~done) & (it < max_iter)

    def body(state):
        R, t, fit_p, rmse_p, it, _ = state
        idx, inlier, _ = correspondences(R, t)
        q = jnp.take(tgt, idx, axis=0)
        nq = jnp.take(tgt_normals, idx, axis=0)
        w = inlier.astype(src.dtype)
        if color_weight is not None:
            w = w * jnp.take(color_weight, idx)
        moved = transform_points(src, R, t)
        dR, dt = _solve_point2plane(moved, q, nq, w)
        R_new = dR @ R
        t_new = dR @ t + dt
        ok = jnp.all(jnp.isfinite(R_new)) & jnp.all(jnp.isfinite(t_new))
        R = jnp.where(ok, R_new, R)
        t = jnp.where(ok, t_new, t)
        _, inl2, sqd2 = correspondences(R, t)
        fit, rmse, _ = metrics(inl2, sqd2)
        done = (jnp.abs(fit - fit_p) < rel_tol) & (jnp.abs(rmse - rmse_p) < rel_tol)
        return (R, t, fit, rmse, it + 1, done | ~ok)

    R0 = jnp.eye(3, dtype=src.dtype) if R_init is None else R_init
    t0 = jnp.zeros((3,), src.dtype) if t_init is None else t_init
    _, inl0, sqd0 = correspondences(R0, t0)
    f0, r0, _ = metrics(inl0, sqd0)
    state = (R0, t0, f0, r0, jnp.int32(0), jnp.bool_(False))
    R, t, fit, rmse, _, _ = jax.lax.while_loop(cond, body, state)
    idx, inlier, sqd = correspondences(R, t)
    fit, rmse, cnt = metrics(inlier, sqd)
    return ICPResult(R, t, fit, rmse, cnt.astype(jnp.int32), idx, inlier)


@functools.partial(jax.jit, static_argnames=("k",))
def color_gradients(
    points: jax.Array,
    gray: jax.Array,
    normals: jax.Array,
    mask: jax.Array | None = None,
    *,
    k: int = 16,
) -> jax.Array:
    """(n, 3) per-point in-tangent-plane intensity gradients d such that
    C(u) ≈ c_q + d·(u - q) for u near q on q's tangent plane — the
    precomputation of Park et al. 2017 colored ICP (o3d
    ``registration_colored_icp``'s internal color-gradient estimation)."""
    hp = jax.lax.Precision.HIGHEST
    sqd, idx = knn(points, points, k, mask, exclude_self=True)
    valid = jnp.isfinite(sqd)
    nb = jnp.take(points, idx, axis=0)  # (n, k, 3)
    cb = jnp.take(gray, idx)  # (n, k)
    # Project neighbours onto the tangent plane.
    diff = nb - points[:, None, :]
    along = jnp.einsum("nki,ni->nk", diff, normals, precision=hp)
    proj = diff - along[..., None] * normals[:, None, :]
    w = valid.astype(points.dtype)
    dc = (cb - gray[:, None]) * w
    # Normal equations A d = b with the n n^T constraint row (d·n = 0).
    A = jnp.einsum("nki,nkj->nij", proj * w[..., None], proj, precision=hp)
    A = A + jnp.einsum("ni,nj->nij", normals, normals, precision=hp)
    A = A + 1e-6 * jnp.eye(3, dtype=points.dtype)
    b = jnp.einsum("nki,nk->ni", proj, dc, precision=hp)
    return jnp.linalg.solve(A, b[..., None])[..., 0]


@functools.partial(
    jax.jit, static_argnames=("max_iter", "normals_k", "gradient_k")
)
def _colored_icp_scale(
    src,
    tgt,
    gray_s,
    gray_t,
    max_dist,
    src_mask,
    tgt_mask,
    R0,
    t0,
    *,
    max_iter: int = 30,
    rel_tol: float = 1e-6,
    lambda_geometric: float = 0.968,
    normals_k: int = 16,
    gradient_k: int = 16,
):
    """One scale of colored ICP: joint geometric (point-to-plane) +
    photometric (tangent-plane colour) Gauss-Newton (Park et al. 2017, the
    objective behind o3d ``registration_colored_icp``)."""
    n = src.shape[0]
    f32 = src.dtype
    hp = jax.lax.Precision.HIGHEST
    smask = jnp.ones((n,), bool) if src_mask is None else src_mask.astype(bool)
    n_valid = jnp.maximum(jnp.sum(smask), 1)
    normals = pca_normals(tgt, normals_k, tgt_mask)
    grad = color_gradients(tgt, gray_t, normals, tgt_mask, k=gradient_k)
    max_d2 = jnp.asarray(max_dist, f32) ** 2
    sg = jnp.sqrt(jnp.asarray(lambda_geometric, f32))
    sc = jnp.sqrt(jnp.asarray(1.0 - lambda_geometric, f32))

    def correspondences(R, t):
        moved = transform_points(src, R, t)
        sqd, idx = knn(moved, tgt, 1, tgt_mask)
        sqd, idx = sqd[:, 0], idx[:, 0]
        inlier = smask & jnp.isfinite(sqd) & (sqd <= max_d2)
        return idx, inlier, sqd

    def metrics(inlier, sqd):
        cnt = jnp.sum(inlier)
        fit = cnt / n_valid
        rmse = jnp.sqrt(
            jnp.sum(jnp.where(inlier, sqd, 0.0)) / jnp.maximum(cnt, 1)
        )
        return fit, rmse, cnt

    def cond(state):
        *_, it, done = state
        return (~done) & (it < max_iter)

    def body(state):
        R, t, fit_p, rmse_p, it, _ = state
        idx, inlier, _ = correspondences(R, t)
        moved = transform_points(src, R, t)
        q = jnp.take(tgt, idx, axis=0)
        nq = jnp.take(normals, idx, axis=0)
        dq = jnp.take(grad, idx, axis=0)
        cq = jnp.take(gray_t, idx)
        w = inlier.astype(f32)

        # Geometric rows: r_g = (p' - q)·n, J = [p' x n | n].
        r_g = jnp.einsum("ni,ni->n", moved - q, nq, precision=hp) * sg
        Jg = jnp.concatenate([jnp.cross(moved, nq), nq], axis=1) * sg

        # Photometric rows: project p' onto q's tangent plane, linearised
        # colour there vs the source colour; dC/dp' = d_q (in-plane).
        along = jnp.einsum("ni,ni->n", moved - q, nq, precision=hp)
        u = moved - along[:, None] * nq
        c_at_u = cq + jnp.einsum("ni,ni->n", dq, u - q, precision=hp)
        r_c = (c_at_u - gray_s) * sc
        m = dq - jnp.einsum("ni,ni->n", dq, nq, precision=hp)[:, None] * nq
        Jc = jnp.concatenate([jnp.cross(moved, m), m], axis=1) * sc

        J = jnp.concatenate([Jg, Jc], axis=0)
        r = jnp.concatenate([r_g, r_c])
        ww = jnp.concatenate([w, w])
        Jw = J * ww[:, None]
        A = jnp.einsum("ni,nj->ij", Jw, J, precision=hp) + 1e-6 * jnp.eye(6)
        b = -jnp.einsum("ni,n->i", Jw, r, precision=hp)
        x = jnp.linalg.solve(A, b)
        rx, tx = x[:3], x[3:]
        theta = jnp.linalg.norm(rx) + 1e-12
        kvec = rx / theta
        K = jnp.array(
            [
                [0.0, -kvec[2], kvec[1]],
                [kvec[2], 0.0, -kvec[0]],
                [-kvec[1], kvec[0], 0.0],
            ]
        )
        dR = (
            jnp.eye(3) + jnp.sin(theta) * K + (1.0 - jnp.cos(theta)) * (K @ K)
        ).astype(f32)
        R_new = dR @ R
        t_new = dR @ t + tx.astype(f32)
        ok = jnp.all(jnp.isfinite(R_new)) & jnp.all(jnp.isfinite(t_new))
        R = jnp.where(ok, R_new, R)
        t = jnp.where(ok, t_new, t)
        _, inlier2, sqd2 = correspondences(R, t)
        fit, rmse, _ = metrics(inlier2, sqd2)
        done = (jnp.abs(fit - fit_p) < rel_tol) & (
            jnp.abs(rmse - rmse_p) < rel_tol
        )
        return R, t, fit, rmse, it + 1, done

    idx0, inlier0, sqd0 = correspondences(R0, t0)
    fit0, rmse0, _ = metrics(inlier0, sqd0)
    R, t, _, _, _, _ = jax.lax.while_loop(
        cond, body, (R0, t0, fit0, rmse0, jnp.asarray(0), jnp.asarray(False))
    )
    idx, inlier, sqd = correspondences(R, t)
    fit, rmse, cnt = metrics(inlier, sqd)
    return ICPResult(R, t, fit, rmse, cnt.astype(jnp.int32), idx, inlier)


def colored_icp(
    src: jax.Array,
    tgt: jax.Array,
    src_colors: jax.Array,
    tgt_colors: jax.Array,
    *,
    voxel_scales: tuple[float, ...] = (0.04, 0.02, 0.01),
    max_iters: tuple[int, ...] = (50, 30, 14),
    lambda_geometric: float = 0.968,
) -> ICPResult:
    """Multiscale colored ICP (o3d_tools.py:74-128): coarse-to-fine over
    voxel scales, each refined with the joint geometric + photometric
    objective of Park et al. 2017 — the photometric residual compares the
    source intensity against the target's tangent-plane colour field
    (per-point colour gradients), exactly as o3d's
    ``registration_colored_icp`` does."""
    from fusion4landslide_tpu.ops.voxel import voxel_downsample

    R = jnp.eye(3, dtype=src.dtype)
    t = jnp.zeros((3,), src.dtype)
    gray_s = jnp.mean(src_colors.astype(jnp.float32), axis=-1)
    gray_t = jnp.mean(tgt_colors.astype(jnp.float32), axis=-1)
    if gray_s.max() > 1.5:  # 0..255 -> 0..1 (o3d colours are unit-scaled)
        gray_s = gray_s / 255.0
        gray_t = gray_t / 255.0
    result = None
    n = src.shape[0]
    m = tgt.shape[0]
    for scale, iters in zip(voxel_scales, max_iters):
        s_cent, s_p2v, _, s_nv = voxel_downsample(src, scale)
        t_cent, t_p2v, _, t_nv = voxel_downsample(tgt, scale)
        gs = jax.ops.segment_sum(gray_s, s_p2v, num_segments=n) / jnp.maximum(
            jax.ops.segment_sum(jnp.ones_like(gray_s), s_p2v, num_segments=n),
            1,
        )
        gt = jax.ops.segment_sum(gray_t, t_p2v, num_segments=m) / jnp.maximum(
            jax.ops.segment_sum(jnp.ones_like(gray_t), t_p2v, num_segments=m),
            1,
        )
        mask_s = jnp.arange(n) < s_nv
        mask_t = jnp.arange(m) < t_nv
        result = _colored_icp_scale(
            s_cent, t_cent, gs, gt, scale * 1.4, mask_s, mask_t, R, t,
            max_iter=int(iters), lambda_geometric=lambda_geometric,
        )
        R = result.R
        t = result.t
    return result


class RansacResult(NamedTuple):
    R: jax.Array
    t: jax.Array
    inliers: jax.Array  # (n,) bool
    n_inliers: jax.Array
    best_score: jax.Array


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def ransac_registration(
    src_corr: jax.Array,
    tgt_corr: jax.Array,
    key: jax.Array,
    *,
    max_correspondence_distance: jax.Array | float = 0.05,
    num_hypotheses: int = 512,
    mask: jax.Array | None = None,
) -> RansacResult:
    """Correspondence-based RANSAC rigid fit (o3d_tools.py:148-177) as a
    parallel hypothesis tournament: all minimal samples fitted and scored at
    once, winner refit on its inliers."""
    n = src_corr.shape[0]
    m = jnp.ones((n,), bool) if mask is None else mask.astype(bool)
    probs = m.astype(jnp.float32) / jnp.maximum(jnp.sum(m), 1)
    samples = jax.random.choice(
        key, n, shape=(num_hypotheses, 3), replace=True, p=probs
    )

    def fit(sample):
        R, t, _, ok = weighted_kabsch(
            jnp.take(src_corr, sample, axis=0),
            jnp.take(tgt_corr, sample, axis=0),
        )
        return R, t, ok

    Rs, ts, oks = jax.vmap(fit)(samples)
    moved = jnp.einsum("kij,nj->kni", Rs, src_corr) + ts[:, None, :]
    res = jnp.linalg.norm(moved - tgt_corr[None], axis=-1)  # (K, n)
    inl = (res <= max_correspondence_distance) & m[None, :]
    scores = jnp.sum(inl, axis=1) * oks
    best = jnp.argmax(scores)
    best_inl = inl[best]
    R, t, _, _ = weighted_kabsch(
        src_corr, tgt_corr, best_inl.astype(src_corr.dtype)
    )
    final_res = jnp.linalg.norm(transform_points(src_corr, R, t) - tgt_corr, axis=-1)
    final_inl = (final_res <= max_correspondence_distance) & m
    return RansacResult(
        R=R,
        t=t,
        inliers=final_inl,
        n_inliers=jnp.sum(final_inl),
        best_score=scores[best],
    )


@functools.partial(jax.jit, static_argnames=("max_iter", "normals_k"))
def icp_generalized(
    src: jax.Array,
    tgt: jax.Array,
    max_dist: jax.Array | float,
    src_mask: jax.Array | None = None,
    tgt_mask: jax.Array | None = None,
    *,
    max_iter: int = 30,
    rel_tol: float = 1e-6,
    normals_k: int = 16,
    epsilon: float = 1e-3,
    R_init: jax.Array | None = None,
    t_init: jax.Array | None = None,
) -> ICPResult:
    """Generalized ICP (plane-to-plane, Segal et al.) of ``src`` onto
    ``tgt`` — the reference's ``icp_type='generalized_icp'``
    (utils/o3d_tools.py:40-56, o3d ``registration_generalized_icp``).

    Per-point covariances use the standard surface model
    ``C = I - (1 - eps) n n^T`` (disk-shaped, thin along the PCA normal);
    each iteration minimises ``sum d^T (C_q + R C_p R^T)^-1 d`` by one
    Gauss-Newton step over (omega, t), batched entirely on device.
    """
    n = src.shape[0]
    f32 = src.dtype
    smask = jnp.ones((n,), bool) if src_mask is None else src_mask.astype(bool)
    n_valid = jnp.maximum(jnp.sum(smask), 1)
    hp = jax.lax.Precision.HIGHEST

    def point_cov(nrm):
        eye = jnp.eye(3, dtype=f32)
        return eye - (1.0 - epsilon) * jnp.einsum(
            "ni,nj->nij", nrm, nrm, precision=hp
        )

    cov_s = point_cov(pca_normals(src, normals_k, src_mask))
    cov_t = point_cov(pca_normals(tgt, normals_k, tgt_mask))
    max_d2 = jnp.asarray(max_dist, f32) ** 2

    def correspondences(R, t):
        moved = transform_points(src, R, t)
        sqd, idx = knn(moved, tgt, 1, tgt_mask)
        sqd, idx = sqd[:, 0], idx[:, 0]
        inlier = smask & jnp.isfinite(sqd) & (sqd <= max_d2)
        return idx, inlier, sqd

    def metrics(inlier, sqd):
        cnt = jnp.sum(inlier)
        fit = cnt / n_valid
        rmse = jnp.sqrt(
            jnp.sum(jnp.where(inlier, sqd, 0.0)) / jnp.maximum(cnt, 1)
        )
        return fit, rmse, cnt

    def skew(v):
        return jnp.stack(
            [
                jnp.stack([jnp.zeros_like(v[..., 0]), -v[..., 2], v[..., 1]], -1),
                jnp.stack([v[..., 2], jnp.zeros_like(v[..., 0]), -v[..., 0]], -1),
                jnp.stack([-v[..., 1], v[..., 0], jnp.zeros_like(v[..., 0])], -1),
            ],
            -2,
        )

    def cond(state):
        *_, it, done = state
        return (~done) & (it < max_iter)

    def body(state):
        R, t, fit_p, rmse_p, it, _ = state
        idx, inlier, _ = correspondences(R, t)
        moved = transform_points(src, R, t)
        q = jnp.take(tgt, idx, axis=0)
        # Combined covariance M = (C_q + R C_p R^T)^-1 per pair.
        RC = jnp.einsum("ij,njk,lk->nil", R, cov_s, R, precision=hp)
        M = jnp.linalg.inv(
            jnp.take(cov_t, idx, axis=0) + RC + 1e-6 * jnp.eye(3, dtype=f32)
        )
        w = inlier.astype(f32)[:, None, None]
        M = M * w
        r = moved - q  # (n, 3)
        # J = [ -skew(moved) | I ] over x = (omega, t).
        Jw = -skew(moved)  # (n, 3, 3) d r / d omega
        # Normal equations blocks.
        H_ww = jnp.einsum("nij,nik,nkl->jl", Jw, M, Jw, precision=hp)
        H_wt = jnp.einsum("nij,nik->jk", Jw, M, precision=hp)
        H_tt = jnp.einsum("nik->ik", M)
        g_w = jnp.einsum("nij,nik,nk->j", Jw, M, r, precision=hp)
        g_t = jnp.einsum("nik,nk->i", M, r, precision=hp)
        H = jnp.block([[H_ww, H_wt], [H_wt.T, H_tt]]) + 1e-6 * jnp.eye(6)
        g = jnp.concatenate([g_w, g_t])
        x = -jnp.linalg.solve(H, g)
        omega, dt = x[:3], x[3:]
        theta = jnp.linalg.norm(omega) + 1e-12
        k = omega / theta
        K = skew(k)
        dR = (
            jnp.eye(3, dtype=f32)
            + jnp.sin(theta) * K
            + (1.0 - jnp.cos(theta)) * (K @ K)
        )
        R_new = dR @ R
        t_new = dR @ t + dt.astype(f32)
        ok = jnp.all(jnp.isfinite(R_new)) & jnp.all(jnp.isfinite(t_new))
        R = jnp.where(ok, R_new, R)
        t = jnp.where(ok, t_new, t)
        _, inlier2, sqd2 = correspondences(R, t)
        fit, rmse, _ = metrics(inlier2, sqd2)
        done = (jnp.abs(fit - fit_p) < rel_tol) & (jnp.abs(rmse - rmse_p) < rel_tol)
        return R, t, fit, rmse, it + 1, done

    R0 = jnp.eye(3, dtype=f32) if R_init is None else R_init
    t0 = jnp.zeros((3,), f32) if t_init is None else t_init
    idx0, inlier0, sqd0 = correspondences(R0, t0)
    fit0, rmse0, _ = metrics(inlier0, sqd0)
    R, t, fit, rmse, _, _ = jax.lax.while_loop(
        cond, body, (R0, t0, fit0, rmse0, jnp.asarray(0), jnp.asarray(False))
    )
    idx, inlier, sqd = correspondences(R, t)
    fit, rmse, cnt = metrics(inlier, sqd)
    return ICPResult(
        R=R,
        t=t,
        fitness=fit,
        inlier_rmse=rmse,
        n_inliers=cnt.astype(jnp.int32),
        corr_idx=idx,
        corr_inlier=inlier,
    )
