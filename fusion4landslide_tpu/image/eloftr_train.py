"""In-environment training for the EfficientLoFTR port.

The reference downloads the upstream trained checkpoint
(``eloftr_outdoor.ckpt``, /root/reference/README.md:85) and runs it as the
production matcher (/root/reference/src/coarse_to_fine_matching_base.py:1065).
This environment has no network egress, so — as with the RoMa family
(:mod:`.roma_train`) — a compact configuration of the same architecture is
trained from scratch on the synthetic homography curriculum, yielding real
(non-random) weights that the matcher registry auto-provisions from
``weights/eloftr_tiny.npz``.

The loss follows the published LoFTR/EfficientLoFTR recipe:

- **coarse**: cross-entropy on the dual-softmax confidence at the
  ground-truth coarse cell correspondence;
- **fine stage 1**: cross-entropy over the (k+2)^2 target-window positions
  of the first-stage correlation, teacher-forced at the ground-truth
  coarse match (supervised densely for every source-window pixel);
- **fine stage 2**: l2 between the 3x3 softmax-expectation refinement and
  the ground-truth sub-pixel residual (this trains the
  ``fine_matching_slice_dim`` feature slice that only stage 2 consumes).

CLI::

    python -m fusion4landslide_tpu.image.eloftr_train \
        --steps 2000 --size 96 --out weights/eloftr_tiny.npz
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fusion4landslide_tpu.image.eloftr import (
    EfficientLoFTRFlax,
    ELoFTRConfig,
    _unfold_windows,
    save_eloftr_weights,
)
from fusion4landslide_tpu.image.roma import grid_sample
from fusion4landslide_tpu.image.roma_train import TrainSettings, make_pair

__all__ = ["COMPACT_CONFIG", "train_eloftr"]

#: The compact preset (same shape as matching.py's random-weights fallback).
COMPACT_CONFIG = ELoFTRConfig(
    stage_num_blocks=(1, 1, 2, 2),
    out_features=(32, 32, 64, 128),
    hidden_size=128,
    num_attention_layers=2,
)


def _warp_px(warp_gt, u, v, n):
    """Sample the dense GT warp field at float pixel positions (u, v)
    -> GT pixel positions in image 1. ``warp_gt`` is (n, n, 2) normalised
    as in :func:`roma_train.make_pair` (p1 = (w + 1) * n / 2)."""
    cu = (u + 0.5) * 2.0 / n - 1.0
    cv = (v + 0.5) * 2.0 / n - 1.0
    w = grid_sample(warp_gt, jnp.stack([cu, cv], axis=-1))
    return (w + 1.0) * n / 2.0


def _loss_fn(params, model, img0, img1, warp_gt, valid):
    c = model.cfg
    n = img0.shape[0]
    coarse, fine = model.apply(params, img0, img1)
    _, hc, wc, d = coarse.shape
    S = hc * wc
    scale = n // hc  # 8 for the canonical stride chain
    k = c.fine_kernel_size

    # ---- Coarse dual-softmax CE at the GT cell correspondence.
    hp = jax.lax.Precision.HIGHEST
    f0 = coarse[0].reshape(S, d) / jnp.sqrt(jnp.asarray(d, jnp.float32))
    f1 = coarse[1].reshape(S, d) / jnp.sqrt(jnp.asarray(d, jnp.float32))
    sim = jnp.matmul(f0, f1.T, precision=hp) / c.coarse_matching_temperature
    log_conf = jax.nn.log_softmax(sim, axis=0) + jax.nn.log_softmax(
        sim, axis=1
    )
    ii = jnp.arange(S)
    # Claimed source coordinates (the port's kp * scale convention,
    # eloftr._eloftr_core) of each coarse cell.
    q0x = (ii % wc).astype(jnp.float32) * scale
    q0y = (ii // wc).astype(jnp.float32) * scale
    p1 = _warp_px(warp_gt, q0x, q0y, n)  # (S, 2) GT img1 pixels
    jx = jnp.round(p1[..., 0] / scale).astype(jnp.int32)
    jy = jnp.round(p1[..., 1] / scale).astype(jnp.int32)
    in_b = (jx >= 0) & (jx < wc) & (jy >= 0) & (jy < hc)
    src_ok = (
        grid_sample(
            valid[..., None].astype(jnp.float32),
            jnp.stack(
                [(q0x + 0.5) * 2 / n - 1, (q0y + 0.5) * 2 / n - 1], -1
            ),
        )[..., 0]
        > 0.5
    )
    vc = (in_b & src_ok).astype(jnp.float32)
    j_gt = jnp.clip(jy, 0, hc - 1) * wc + jnp.clip(jx, 0, wc - 1)
    ce_c = -jnp.take_along_axis(log_conf, j_gt[:, None], axis=1)[:, 0]
    ce_c = jnp.sum(ce_c * vc) / jnp.maximum(jnp.sum(vc), 1)

    # ---- Fine windows, teacher-forced at the GT coarse match.
    win0 = _unfold_windows(fine[0], k, k, 0)  # (S, k^2, C)
    win1 = _unfold_windows(fine[1], k + 2, k, 1)  # (S, (k+2)^2, C)
    win1 = jnp.take(win1, j_gt, axis=0)
    slice_dim = c.fine_matching_slice_dim
    c_first = win0.shape[-1] - slice_dim
    a0 = win0[..., :c_first] / jnp.sqrt(jnp.asarray(c_first, jnp.float32))
    a1 = win1[..., :c_first] / jnp.sqrt(jnp.asarray(c_first, jnp.float32))
    e1 = jnp.einsum("spc,sqc->spq", a0, a1, precision=hp)  # (S, k², (k+2)²)

    # Claimed coordinates of every source-window pixel (off = p - k/2 + .5).
    py, px = jnp.meshgrid(jnp.arange(k), jnp.arange(k), indexing="ij")
    offx = (px.reshape(-1) - k // 2 + 0.5).astype(jnp.float32)  # (k²,)
    offy = (py.reshape(-1) - k // 2 + 0.5).astype(jnp.float32)
    u0 = q0x[:, None] + offx[None, :]  # (S, k²)
    v0 = q0y[:, None] + offy[None, :]
    p1f = _warp_px(warp_gt, u0, v0, n)  # (S, k², 2)
    # Position within the teacher-forced (k+2)² target window: claimed
    # coordinate of uncropped position q is q1*scale... + q - (k/2 + .5).
    q1x = (j_gt % wc).astype(jnp.float32) * scale
    q1y = (j_gt // wc).astype(jnp.float32) * scale
    gx = p1f[..., 0] - q1x[:, None] + (k // 2 + 0.5)
    gy = p1f[..., 1] - q1y[:, None] + (k // 2 + 0.5)
    gxi = jnp.round(gx).astype(jnp.int32)
    gyi = jnp.round(gy).astype(jnp.int32)
    in_w = (gxi >= 0) & (gxi < k + 2) & (gyi >= 0) & (gyi < k + 2)
    vf = vc[:, None] * in_w.astype(jnp.float32)  # (S, k²)
    g_idx = jnp.clip(gyi, 0, k + 1) * (k + 2) + jnp.clip(gxi, 0, k + 1)
    ce_f = -jnp.take_along_axis(
        jax.nn.log_softmax(e1, axis=-1), g_idx[..., None], axis=-1
    )[..., 0]
    ce_f = jnp.sum(ce_f * vf) / jnp.maximum(jnp.sum(vf), 1)

    # ---- Stage 2: 3x3 expectation on the slice channels around the GT
    # cell vs the GT sub-pixel residual.
    b0 = win0[..., c_first:]
    b1 = win1[..., c_first:] / jnp.sqrt(jnp.asarray(slice_dim, jnp.float32))
    sc = jnp.einsum("spc,sqc->spq", b0, b1, precision=hp)
    dy, dx = jnp.meshgrid(jnp.arange(-1, 2), jnp.arange(-1, 2), indexing="ij")
    yy = jnp.clip(gyi[..., None, None] + dy, 0, k + 1)
    xx = jnp.clip(gxi[..., None, None] + dx, 0, k + 1)
    nidx = yy * (k + 2) + xx  # (S, k², 3, 3)
    local = jnp.take_along_axis(
        sc, nidx.reshape(S, k * k, 9), axis=-1
    )  # (S, k², 9)
    prob = jax.nn.softmax(
        local / c.fine_matching_regress_temperature, axis=-1
    ).reshape(S, k * k, 3, 3)
    gxg, gyg = jnp.meshgrid(
        jnp.linspace(-1.0, 1.0, 3), jnp.linspace(-1.0, 1.0, 3), indexing="xy"
    )
    ex = jnp.sum(prob * gxg[None, None], axis=(-2, -1))
    ey = jnp.sum(prob * gyg[None, None], axis=(-2, -1))
    rx = jnp.clip(gx - jnp.round(gx), -1.0, 1.0)
    ry = jnp.clip(gy - jnp.round(gy), -1.0, 1.0)
    l2 = (ex - rx) ** 2 + (ey - ry) ** 2
    l2 = jnp.sum(l2 * vf) / jnp.maximum(jnp.sum(vf), 1)

    return ce_c + 0.5 * ce_f + 0.25 * l2, (ce_c, ce_f, l2)


def train_eloftr(
    settings: TrainSettings | None = None,
    cfg: ELoFTRConfig | None = None,
    *,
    seed: int = 0,
    log_every: int = 100,
    logger=None,
    checkpoint_to: str | None = None,
    checkpoint_every: int = 500,
):
    """Train the compact EfficientLoFTR on synthetic homographies.

    Returns (params, cfg, history); history logs (ce_coarse, ce_fine, l2).
    """
    import optax

    settings = settings or TrainSettings(size=96, steps=2000, lr=1e-3)
    cfg = cfg or COMPACT_CONFIG
    if settings.size % 32:
        raise ValueError("image size must be a multiple of 32")
    model = EfficientLoFTRFlax(cfg)
    rng = np.random.default_rng(seed)
    img0, img1, warp_gt, valid = make_pair(rng, settings)
    params = model.init(jax.random.PRNGKey(seed), img0, img1)
    tx = optax.adam(
        optax.cosine_decay_schedule(settings.lr, settings.steps, alpha=0.05)
    )
    opt_state = tx.init(params)

    def batch_loss(params, img0, img1, warp_gt, valid):
        losses, auxs = jax.vmap(
            lambda a, b, c_, d: _loss_fn(params, model, a, b, c_, d)
        )(img0, img1, warp_gt, valid)
        return jnp.mean(losses), jax.tree.map(jnp.mean, auxs)

    @jax.jit
    def step(params, opt_state, img0, img1, warp_gt, valid):
        (loss, aux), grads = jax.value_and_grad(batch_loss, has_aux=True)(
            params, img0, img1, warp_gt, valid
        )
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    def sample_batch():
        pairs = [make_pair(rng, settings) for _ in range(settings.batch)]
        return tuple(
            jnp.asarray(np.stack([p[i] for p in pairs])) for i in range(4)
        )

    history = []
    for it in range(settings.steps):
        img0, img1, warp_gt, valid = sample_batch()
        params, opt_state, loss, aux = step(
            params, opt_state, img0, img1, warp_gt, valid
        )
        if it % log_every == 0 or it == settings.steps - 1:
            vals = tuple(float(a) for a in aux)
            history.append(vals)
            msg = (
                f"eloftr_train step {it}: loss={float(loss):.4f} "
                f"ce_c={vals[0]:.4f} ce_f={vals[1]:.4f} l2={vals[2]:.4f}"
            )
            if logger:
                logger.info(msg)
            else:
                print(msg, flush=True)
        if (
            checkpoint_to
            and it
            and (it % checkpoint_every == 0 or it == settings.steps - 1)
        ):
            save_eloftr_weights(checkpoint_to, params, cfg)
    return params, cfg, history


def main() -> None:
    import argparse
    import os

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--size", type=int, default=96)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--out", default="weights/eloftr_tiny.npz")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    settings = TrainSettings(
        size=args.size, steps=args.steps, lr=args.lr, batch=args.batch
    )
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    params, cfg, history = train_eloftr(
        settings, seed=args.seed, checkpoint_to=args.out
    )
    save_eloftr_weights(args.out, params, cfg)
    print(f"saved {args.out}; final {history[-1]}")


if __name__ == "__main__":
    main()
