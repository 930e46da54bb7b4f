"""Detector-free coarse-to-fine learned matcher (LoFTR-family) in Flax.

The reference consumes EfficientLoFTR / RoMa as vendored submodules (empty
in this checkout; imported at src/coarse_to_fine_matching_base.py:1065,1094
and invoked per crop pair). This module provides the framework's *learned*
dense matcher: a faithful implementation of the LoFTR architecture family
(Sun et al. 2021; the efficiency revisions of Wang et al. 2024) —

- CNN backbone producing 1/8 coarse and 1/2 fine feature maps,
- positional encoding + interleaved self/cross **linear attention**
  transformer over the coarse maps (linear attention keeps the N² token
  interaction out of memory: softmax kernel φ(q)·(φ(k)ᵀv); rides the MXU),
- dual-softmax mutual matching on the coarse similarity matrix,
- fine refinement: local windows around each coarse match correlated and
  refined to sub-pixel via the soft-argmax expectation.

Weights: upstream checkpoints are not redistributable here (the reference
downloads ``eloftr_outdoor.ckpt``, README.md:85); ``load_torch_loftr`` maps
a state_dict whose layout matches this architecture. Untrained, the matcher
still functions as a (weak) correlation matcher; the registry default for
production remains 'zncc' until converted weights are supplied.

TPU notes: all shapes static per (H, W); attention/correlation are batched
matmuls; no data-dependent control flow.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LoFTRMatcher", "loftr_match", "load_torch_loftr"]


class ConvBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    use_bias=False, name="conv")(x)
        x = nn.LayerNorm(name="norm")(x)
        return nn.relu(x)


class Backbone(nn.Module):
    """1/2 fine + 1/8 coarse feature pyramid."""

    dim_fine: int = 64
    dim_coarse: int = 256

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, 1) grayscale
        c1 = ConvBlock(self.dim_fine, stride=2, name="s1")(x)      # 1/2
        c1 = ConvBlock(self.dim_fine, name="s1b")(c1)
        c2 = ConvBlock(128, stride=2, name="s2")(c1)               # 1/4
        c2 = ConvBlock(128, name="s2b")(c2)
        c3 = ConvBlock(self.dim_coarse, stride=2, name="s3")(c2)   # 1/8
        c3 = ConvBlock(self.dim_coarse, name="s3b")(c3)
        return c1, c3


def _elu1(x):
    return nn.elu(x) + 1.0


class LinearAttention(nn.Module):
    """Linear (kernelised) attention: O(N d²) instead of O(N²)."""

    dim: int
    heads: int = 8

    @nn.compact
    def __call__(self, x, source):
        # x: (B, N, D) queries; source: (B, M, D) keys/values.
        d_head = self.dim // self.heads
        q = nn.DenseGeneral((self.heads, d_head), name="q")(x)
        k = nn.DenseGeneral((self.heads, d_head), name="k")(source)
        v = nn.DenseGeneral((self.heads, d_head), name="v")(source)
        q, k = _elu1(q), _elu1(k)
        kv = jnp.einsum("bmhd,bmhe->bhde", k, v)
        z = 1.0 / (
            jnp.einsum("bnhd,bhd->bnh", q, jnp.sum(k, axis=1)) + 1e-6
        )
        out = jnp.einsum("bnhd,bhde,bnh->bnhe", q, kv, z)
        out = out.reshape(*x.shape[:2], self.dim)
        return nn.Dense(self.dim, name="merge")(out)


class LoFTRBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, source):
        msg = LinearAttention(self.dim, name="attn")(
            nn.LayerNorm(name="norm1")(x), nn.LayerNorm(name="norm1s")(source)
        )
        x = x + msg
        h = nn.Dense(self.dim * 2, name="mlp0")(
            nn.LayerNorm(name="norm2")(x)
        )
        h = nn.Dense(self.dim, name="mlp1")(nn.gelu(h))
        return x + h


class CoarseTransformer(nn.Module):
    dim: int = 256
    layers: int = 4  # self/cross interleaved

    @nn.compact
    def __call__(self, f0, f1):
        for i in range(self.layers):
            f0 = LoFTRBlock(self.dim, name=f"self0_{i}")(f0, f0)
            f1 = LoFTRBlock(self.dim, name=f"self1_{i}")(f1, f1)
            f0n = LoFTRBlock(self.dim, name=f"cross0_{i}")(f0, f1)
            f1 = LoFTRBlock(self.dim, name=f"cross1_{i}")(f1, f0)
            f0 = f0n
        return f0, f1


def _pos_encoding(h, w, dim, dtype=jnp.float32):
    """Standard 2-d sinusoidal encoding (LoFTR positional encoding)."""
    ys = jnp.arange(h, dtype=dtype)[:, None]
    xs = jnp.arange(w, dtype=dtype)[None, :]
    d4 = dim // 4
    freqs = jnp.exp(
        -jnp.arange(d4, dtype=dtype) * (np.log(10000.0) / max(d4 - 1, 1))
    )
    enc = []
    for grid in (xs, ys):
        arg = grid[..., None] * freqs  # (h, w, d4)
        arg = jnp.broadcast_to(arg, (h, w, d4))
        enc += [jnp.sin(arg), jnp.cos(arg)]
    return jnp.concatenate(enc, axis=-1)  # (h, w, dim)


class LoFTRMatcher(nn.Module):
    """Full coarse-to-fine matcher."""

    dim_coarse: int = 256
    dim_fine: int = 64
    layers: int = 4
    fine_window: int = 5

    @nn.compact
    def __call__(self, img0, img1):
        # imgs: (H, W) grayscale in [0, 1]; returns dense coarse grids.
        x0 = img0[None, :, :, None]
        x1 = img1[None, :, :, None]
        backbone = Backbone(self.dim_fine, self.dim_coarse, name="backbone")
        f0_fine, f0_coarse = backbone(x0)
        f1_fine, f1_coarse = backbone(x1)
        _, hc, wc, _ = f0_coarse.shape
        pe = _pos_encoding(hc, wc, self.dim_coarse)[None]
        t0 = (f0_coarse + pe).reshape(1, hc * wc, self.dim_coarse)
        t1 = (f1_coarse + pe).reshape(1, hc * wc, self.dim_coarse)
        t0, t1 = CoarseTransformer(
            self.dim_coarse, self.layers, name="transformer"
        )(t0, t1)
        return t0[0], t1[0], f0_fine[0], f1_fine[0], (hc, wc)


@functools.partial(jax.jit, static_argnames=("model", "match_threshold"))
def _match_core(params, img0, img1, model: LoFTRMatcher, match_threshold: float):
    t0, t1, fine0, fine1, (hc, wc) = model.apply(params, img0, img1)
    d = t0.shape[-1]
    sim = jnp.einsum(
        "nd,md->nm", t0, t1, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(d, jnp.float32))
    # Dual softmax mutual confidence.
    p = jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=0)
    best_j = jnp.argmax(p, axis=1)
    conf = jnp.take_along_axis(p, best_j[:, None], axis=1)[:, 0]
    mutual = jnp.take(jnp.argmax(p, axis=0), best_j) == jnp.arange(p.shape[0])
    ok = mutual & (conf > match_threshold)

    # Fine refinement: correlate windows in the 1/2-res fine maps.
    scale = 4  # coarse (1/8) -> fine (1/2)
    win = 5
    half = win // 2
    ii = jnp.arange(hc * wc)
    y0 = (ii // wc) * scale
    x0c = (ii % wc) * scale
    y1 = (best_j // wc) * scale
    x1c = (best_j % wc) * scale

    def window(fmap, ys, xs):
        h, w, c = fmap.shape
        dy, dx = jnp.meshgrid(
            jnp.arange(-half, half + 1), jnp.arange(-half, half + 1),
            indexing="ij",
        )
        yy = jnp.clip(ys[:, None, None] + dy[None], 0, h - 1)
        xx = jnp.clip(xs[:, None, None] + dx[None], 0, w - 1)
        return fmap[yy, xx]  # (N, win, win, C)

    w0 = window(fine0, y0, x0c)[:, half, half][:, None, None, :]  # centre vec
    w1 = window(fine1, y1, x1c)  # (N, win, win, C)
    corr = jnp.einsum("nijc,nklc->nkl", w0, w1)  # (N, win, win)
    prob = jax.nn.softmax(corr.reshape(-1, win * win), axis=-1).reshape(
        -1, win, win
    )
    dy, dx = jnp.meshgrid(
        jnp.arange(-half, half + 1, dtype=jnp.float32),
        jnp.arange(-half, half + 1, dtype=jnp.float32),
        indexing="ij",
    )
    off_y = jnp.sum(prob * dy[None], axis=(1, 2))
    off_x = jnp.sum(prob * dx[None], axis=(1, 2))

    # Coarse grid centres in full-res pixels (1/8 cells) + fine offsets
    # (fine map is 1/2 res -> offsets scale by 2).
    u0 = (ii % wc) * 8.0 + 4.0
    v0 = (ii // wc) * 8.0 + 4.0
    u1 = (best_j % wc) * 8.0 + 4.0 + off_x * 2.0
    v1 = (best_j // wc) * 8.0 + 4.0 + off_y * 2.0
    return u0, v0, u1, v1, conf, ok


def loftr_match(
    params,
    img0: np.ndarray,
    img1: np.ndarray,
    *,
    model: LoFTRMatcher | None = None,
    match_threshold: float = 0.2,
) -> np.ndarray:
    """(M, 4) [u0 v0 u1 v1] matches (+ confidence column 5)."""
    model = model or LoFTRMatcher()
    g0 = np.asarray(img0, np.float32)
    g1 = np.asarray(img1, np.float32)
    if g0.ndim == 3:
        g0 = g0 @ np.asarray([0.299, 0.587, 0.114], np.float32)
        g1 = g1 @ np.asarray([0.299, 0.587, 0.114], np.float32)
    g0 = g0 / 255.0
    g1 = g1 / 255.0
    # Pad to /8 multiples.
    H = -(-g0.shape[0] // 8) * 8
    W = -(-g0.shape[1] // 8) * 8
    g0 = np.pad(g0, ((0, H - g0.shape[0]), (0, W - g0.shape[1])))
    g1 = np.pad(g1, ((0, H - g1.shape[0]), (0, W - g1.shape[1])))
    u0, v0, u1, v1, conf, ok = _match_core(
        params, jnp.asarray(g0), jnp.asarray(g1), model, match_threshold
    )
    ok = np.asarray(ok)
    out = np.stack(
        [np.asarray(u0), np.asarray(v0), np.asarray(u1), np.asarray(v1),
         np.asarray(conf)],
        axis=1,
    )[ok]
    return out[:, :4], out[:, 4]


def load_torch_loftr(path: str):
    """Load a torch LoFTR-family checkpoint, dispatching on layout:

    - upstream zju3dv/LoFTR ``indoor_ds.ckpt`` / ``outdoor_ds.ckpt`` →
      :func:`fusion4landslide_tpu.image.loftr_classic.convert_classic_loftr`
      (params for :class:`~.loftr_classic.ClassicLoFTR`),
    - ``transformers`` EfficientLoFTR (the published conversion of the
      upstream ``eloftr_outdoor.ckpt``) →
      :func:`fusion4landslide_tpu.image.eloftr.load_torch_eloftr`
      (params for :class:`~.eloftr.EfficientLoFTRFlax`).

    Returns (params, config); the config's type selects the model class.
    """
    from fusion4landslide_tpu.models.convert import load_torch_checkpoint

    sd = load_torch_checkpoint(path)
    stripped = {k.removeprefix("matcher."): v for k, v in sd.items()}
    if any(k.startswith("efficientloftr.backbone") for k in stripped):
        from fusion4landslide_tpu.image.eloftr import load_torch_eloftr

        return load_torch_eloftr(stripped)
    from fusion4landslide_tpu.image.loftr_classic import (
        convert_classic_loftr,
        is_classic_loftr_state_dict,
    )

    if is_classic_loftr_state_dict(stripped):
        return convert_classic_loftr(stripped)
    raise NotImplementedError(
        f"checkpoint at {path} loaded ({len(sd)} tensors) but its layout is "
        "not recognised — supported: upstream zju3dv/LoFTR "
        "(indoor/outdoor_ds.ckpt) and transformers EfficientLoFTR "
        "(convert the upstream eloftr_outdoor.ckpt with the transformers "
        "conversion script, or use AutoModel zju-community/efficientloftr)."
    )
