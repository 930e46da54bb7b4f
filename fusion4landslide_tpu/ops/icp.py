"""Point-to-point ICP as a fixed-shape JAX loop.

Replaces Open3D ``registration_icp`` with
``TransformationEstimationPointToPoint`` (reference: utils/o3d_tools.py:12-71;
30 iterations, relative fitness/rmse tolerance 1e-6) — but jit-compiled,
batched over patches with ``jax.vmap``, and running its inner 1-NN on device.

Each iteration: transform source by the current estimate, 1-NN into the
target, keep pairs within ``max_dist``, rigid-fit source→matched-target with
:func:`weighted_kabsch` (fitting the *original* source composes identically to
o3d's incremental update — the rigid group is closed under composition).
Termination mirrors o3d's ICPConvergenceCriteria: stop when both the fitness
and inlier-RMSE change by less than ``rel_tol``, or after ``max_iter``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fusion4landslide_tpu.ops.kabsch import transform_points, weighted_kabsch
from fusion4landslide_tpu.ops.knn import knn

__all__ = ["ICPResult", "icp_point2point"]


class ICPResult(NamedTuple):
    R: jax.Array  # (3, 3)
    t: jax.Array  # (3,)
    fitness: jax.Array  # () inlier fraction of valid source points
    inlier_rmse: jax.Array  # () RMSE over inlier correspondences
    n_inliers: jax.Array  # () int32
    corr_idx: jax.Array  # (n,) target index per source point (last iteration)
    corr_inlier: jax.Array  # (n,) bool inlier mask (last iteration)


@functools.partial(jax.jit, static_argnames=("max_iter",))
def icp_point2point(
    src: jax.Array,
    tgt: jax.Array,
    max_dist: jax.Array | float,
    src_mask: jax.Array | None = None,
    tgt_mask: jax.Array | None = None,
    *,
    max_iter: int = 30,
    rel_tol: float = 1e-6,
    R_init: jax.Array | None = None,
    t_init: jax.Array | None = None,
) -> ICPResult:
    """Rigidly register ``src`` onto ``tgt``.

    Args:
        src: (n, 3) source points (padded rows allowed via ``src_mask``).
        tgt: (m, 3) target points.
        max_dist: correspondence distance gate (the reference's
            ``icp_threshold``: 0.1 m Brienz / 0.3 m Mattertal).
        src_mask / tgt_mask: validity masks for padded rows.
        max_iter: iteration cap (o3d default in reference: 30).
        rel_tol: convergence tolerance on fitness and RMSE deltas.
        R_init / t_init: optional initial transform.

    Returns:
        :class:`ICPResult`; ``R, t`` map source into the target frame.
    """
    n = src.shape[0]
    smask = (
        jnp.ones((n,), bool) if src_mask is None else src_mask.astype(bool)
    )
    n_valid = jnp.maximum(jnp.sum(smask), 1)
    R0 = jnp.eye(3, dtype=src.dtype) if R_init is None else R_init
    t0 = jnp.zeros((3,), src.dtype) if t_init is None else t_init

    max_d2 = jnp.asarray(max_dist, src.dtype) ** 2

    def correspondences(R, t):
        moved = transform_points(src, R, t)
        sqd, idx = knn(moved, tgt, 1, tgt_mask)
        sqd, idx = sqd[:, 0], idx[:, 0]
        inlier = smask & jnp.isfinite(sqd) & (sqd <= max_d2)
        return idx, inlier, sqd

    def metrics(inlier, sqd):
        cnt = jnp.sum(inlier)
        fitness = cnt / n_valid
        rmse = jnp.sqrt(
            jnp.sum(jnp.where(inlier, sqd, 0.0)) / jnp.maximum(cnt, 1)
        )
        return fitness, rmse, cnt

    def cond(state):
        return (~state[-1]) & (state[-2] < max_iter)

    def body(state):
        # One 1-NN search per iteration: the correspondence set carried in
        # the state was searched under the CURRENT (R, t) at the end of the
        # previous iteration, so it seeds this iteration's rigid fit
        # directly — the naive loop searches twice (fit + convergence
        # metrics) and re-searches the same transform on re-entry.
        R, t, fit_prev, rmse_prev, idx, inlier, it, _ = state
        matched = jnp.take(tgt, idx, axis=0)
        R_new, t_new, _, ok = weighted_kabsch(
            src, matched, weights=inlier.astype(src.dtype)
        )
        R = jnp.where(ok, R_new, R)
        t = jnp.where(ok, t_new, t)
        idx2, inlier2, sqd2 = correspondences(R, t)
        fit, rmse, _ = metrics(inlier2, sqd2)
        done = (jnp.abs(fit - fit_prev) < rel_tol) & (
            jnp.abs(rmse - rmse_prev) < rel_tol
        )
        done = done | ~ok  # degenerate fit: stop iterating
        return (R, t, fit, rmse, idx2, inlier2, it + 1, done)

    idx0, inlier0, sqd0 = correspondences(R0, t0)
    fit0, rmse0, _ = metrics(inlier0, sqd0)
    state = (
        R0, t0, fit0, rmse0, idx0, inlier0, jnp.int32(0), jnp.bool_(False)
    )
    R, t, fitness, inlier_rmse, idx, inlier, _, _ = jax.lax.while_loop(
        cond, body, state
    )
    return ICPResult(
        R=R,
        t=t,
        fitness=fitness,
        inlier_rmse=inlier_rmse,
        n_inliers=jnp.sum(inlier).astype(jnp.int32),
        corr_idx=idx,
        corr_inlier=inlier,
    )
