"""In-environment training for the RoMa-family matcher.

The upstream RoMa checkpoints (DINOv2 ViT-L/14 + match decoder, ~1.5 GB)
cannot be fetched here (no network egress), so the compact configuration
is trained from scratch on a synthetic homography curriculum: procedural
textures warped by random similarity/affine transforms with known dense
ground-truth flow. The loss mirrors RoMa's: anchor cross-entropy at the
coarse stage (classification over the K x K coordinate grid), robust
end-point regression after each refiner, and certainty
binary-cross-entropy against the inlier indicator.

CLI::

    python -m fusion4landslide_tpu.image.roma_train \
        --steps 1500 --size 96 --out weights/roma_tiny.npz
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from fusion4landslide_tpu.image.roma import (
    RoMaConfig,
    RoMaMatcher,
    _coord_grid,
    grid_sample,
    save_roma_weights,
)

__all__ = ["make_pair", "train_roma", "TrainSettings"]


@dataclasses.dataclass
class TrainSettings:
    size: int = 96
    steps: int = 1500
    lr: float = 2e-3
    batch: int = 4
    max_shift: float = 0.25  # of image extent
    max_rot: float = 0.15  # radians
    inlier_px: float = 3.0  # certainty-BCE inlier radius


def _texture(rng, n):
    """Procedural multi-scale texture (random Fourier field)."""
    img = np.zeros((n, n), np.float32)
    for k in (2, 4, 8, 16, 32):
        a = rng.normal(size=(k, k)).astype(np.float32)
        img += np.array(
            jax.image.resize(jnp.asarray(a), (n, n), "bilinear")
        ) / np.sqrt(k)
    img -= img.min()
    img /= max(img.max(), 1e-6)
    return img


def make_pair(rng, settings: TrainSettings):
    """One training sample: (img0, img1, warp_gt (h, w, 2), valid)."""
    n = settings.size
    base = _texture(rng, 2 * n)
    ang = rng.uniform(-settings.max_rot, settings.max_rot)
    s = rng.uniform(0.9, 1.1)
    t = rng.uniform(-settings.max_shift, settings.max_shift, size=2) * n
    R = s * np.array(
        [[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]],
        np.float32,
    )
    # img0 = centre crop; img1 = crop of the transformed texture such that
    # pixel p0 in img0 corresponds to p1 = R p0 + t in img1's frame.
    c = n // 2
    img0 = base[c : c + n, c : c + n]
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    p0 = np.stack([xx, yy], -1).astype(np.float32)  # img1 pixel coords
    # Sample img1 at its own grid from the source texture: invert the map.
    Rinv = np.linalg.inv(R)
    src = (p0 - t) @ Rinv.T  # position in img0 frame
    coords = np.stack(
        [src[..., 0] / n * 2 - 1 + 1e-6, src[..., 1] / n * 2 - 1 + 1e-6], -1
    )
    img1 = np.asarray(
        grid_sample(jnp.asarray(img0)[..., None], jnp.asarray(coords))
    )[..., 0]
    # Ground-truth warp for img0 pixels: p1 = R p0 + t (normalised).
    p1 = p0 @ R.T + t
    warp_gt = np.stack(
        [p1[..., 0] / n * 2 - 1, p1[..., 1] / n * 2 - 1], -1
    ).astype(np.float32)
    valid = (
        (p1[..., 0] >= 0) & (p1[..., 0] < n)
        & (p1[..., 1] >= 0) & (p1[..., 1] < n)
    )
    return img0.astype(np.float32), img1.astype(np.float32), warp_gt, valid


def _loss_fn(params, model, img0, img1, warp_gt, valid, inlier_norm):
    (warp, cert), inter = model.apply(
        params, img0, img1, mutable=["intermediates"]
    )
    # Refined-warp robust EPE over valid pixels.
    err = jnp.sqrt(jnp.sum((warp - warp_gt) ** 2, axis=-1) + 1e-8)
    v = valid.astype(jnp.float32)
    epe = jnp.sum(err * v) / jnp.maximum(jnp.sum(v), 1)
    # Per-scale supervision of every refiner output (as upstream).
    scale_epe = 0.0
    for k_, w_ in inter["intermediates"].items():
        if not k_.startswith("warp_s"):
            continue
        ws = w_[0]
        hs, wsz, _ = ws.shape
        gt_s = jax.image.resize(warp_gt, (hs, wsz, 2), "bilinear")
        vs = jax.image.resize(v, (hs, wsz), "bilinear")
        es = jnp.sqrt(jnp.sum((ws - gt_s) ** 2, axis=-1) + 1e-8)
        scale_epe = scale_epe + jnp.sum(es * vs) / jnp.maximum(
            jnp.sum(vs), 1
        )
    # Coarse warp regression too (the anchor CE below localises only to an
    # anchor cell).
    cw = inter["intermediates"]["coarse_warp"][0]
    hc0, wc0, _ = cw.shape
    gt_c0 = jax.image.resize(warp_gt, (hc0, wc0, 2), "bilinear")
    vc0 = jax.image.resize(v, (hc0, wc0), "bilinear")
    ec0 = jnp.sqrt(jnp.sum((cw - gt_c0) ** 2, axis=-1) + 1e-8)
    scale_epe = scale_epe + jnp.sum(ec0 * vc0) / jnp.maximum(jnp.sum(vc0), 1)
    # Coarse anchor cross-entropy.
    logits = inter["intermediates"]["anchor_logits"][0]
    hc, wc, kk = logits.shape
    k = int(np.sqrt(kk))
    gt_c = jax.image.resize(warp_gt, (hc, wc, 2), "bilinear")
    gx = jnp.clip(((gt_c[..., 0] + 1) * 0.5 * k).astype(jnp.int32), 0, k - 1)
    gy = jnp.clip(((gt_c[..., 1] + 1) * 0.5 * k).astype(jnp.int32), 0, k - 1)
    label = gy * k + gx
    vc = jax.image.resize(v, (hc, wc), "bilinear")
    ce = -jax.nn.log_softmax(logits, axis=-1)
    ce = jnp.take_along_axis(ce, label[..., None], axis=-1)[..., 0]
    ce = jnp.sum(ce * vc) / jnp.maximum(jnp.sum(vc), 1)
    # Certainty BCE against the inlier indicator.
    inlier = (err < inlier_norm).astype(jnp.float32) * v
    bce = -(
        inlier * jnp.log(cert + 1e-6)
        + (1 - inlier) * jnp.log(1 - cert + 1e-6)
    )
    bce = jnp.mean(bce)
    return epe + 0.5 * scale_epe + 0.25 * ce + 0.1 * bce, (epe, ce, bce)


def train_roma(
    settings: TrainSettings | None = None,
    cfg: RoMaConfig | None = None,
    *,
    seed: int = 0,
    log_every: int = 200,
    logger=None,
    checkpoint_to: str | None = None,
    checkpoint_every: int = 500,
):
    """Train the compact RoMa matcher on synthetic homographies.

    Returns (params, cfg, history) where history is the list of logged
    mean end-point errors (normalised units).
    """
    import optax

    settings = settings or TrainSettings()
    cfg = cfg or RoMaConfig()
    model = RoMaMatcher(cfg)
    rng = np.random.default_rng(seed)
    img0, img1, warp_gt, valid = make_pair(rng, settings)
    params = model.init(jax.random.PRNGKey(seed), img0, img1)
    tx = optax.adam(
        optax.cosine_decay_schedule(
            settings.lr, settings.steps, alpha=0.05
        )
    )
    opt_state = tx.init(params)
    inlier_norm = settings.inlier_px * 2.0 / settings.size

    def batch_loss(params, img0, img1, warp_gt, valid):
        losses, auxs = jax.vmap(
            lambda a, b, c, d: _loss_fn(
                params, model, a, b, c, d, inlier_norm
            )
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
            jnp.asarray(np.stack([p[i] for p in pairs]))
            for i in range(4)
        )

    history = []
    for it in range(settings.steps):
        img0, img1, warp_gt, valid = sample_batch()
        params, opt_state, loss, aux = step(
            params, opt_state, img0, img1, warp_gt, valid
        )
        if it % log_every == 0 or it == settings.steps - 1:
            epe = float(aux[0])
            history.append(epe)
            msg = (
                f"roma_train step {it}: loss={float(loss):.4f} "
                f"epe={epe:.4f} (~{epe * settings.size / 2:.2f} px)"
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
            # Periodic save so a bounded/killed run keeps its progress.
            save_roma_weights(checkpoint_to, params, cfg)
    return params, cfg, history


def main() -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--size", type=int, default=96)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--out", default="weights/roma_tiny.npz")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    settings = TrainSettings(size=args.size, steps=args.steps, lr=args.lr)
    import os

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    params, cfg, history = train_roma(
        settings, seed=args.seed, checkpoint_to=args.out
    )
    save_roma_weights(args.out, params, cfg)
    print(f"saved {args.out}; final EPE {history[-1]:.4f}")


if __name__ == "__main__":
    main()
